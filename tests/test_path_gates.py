"""Path-gate tests (VERDICT r4 task 7 / r3 weak #6): assert which
graph/labeling implementation each config class selects, so a gate
regression fails a NAMED test instead of silently changing numerics.

The gates under test are the single-source-of-truth predicates fit()
itself branches on (pipeline.banded_gate / graph_path /
fused_front_gate) — these tests pin the CONTRACT (config -> path); the
numerical equivalence of the paths is covered by the parity tests
(test_labeling.py, test_mrf_kernel.py, test_tpu_parity.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

import multih_tpu
from multih_tpu.models import labeling, pipeline


def cfg_of(**kw):
    kw.setdefault("max_points", 512)
    kw.setdefault("n_hypotheses", 256)
    return multih_tpu.MultiHConfig(**kw)


class TestBandedGate:
    def test_default_config_is_banded(self):
        cfg = cfg_of()
        assert pipeline.banded_gate(cfg, cfg.max_points)

    def test_spatial_sort_off_disables_band(self):
        cfg = cfg_of(spatial_sort=False)
        assert not pipeline.banded_gate(cfg, cfg.max_points)

    def test_agree_block_zero_disables_band(self):
        cfg = cfg_of(agree_block=0)
        assert not pipeline.banded_gate(cfg, cfg.max_points)

    def test_unaligned_n_disables_band(self):
        cfg = cfg_of(agree_block=128)
        assert not pipeline.banded_gate(cfg, 500)  # not % 128

    def test_too_few_blocks_disables_band(self):
        cfg = cfg_of(agree_block=128)
        assert not pipeline.banded_gate(cfg, 128)  # < 2 blocks


class TestGraphPath:
    def test_default_is_windowed(self):
        cfg = cfg_of()
        assert pipeline.graph_path(cfg, cfg.max_points) == "windowed"

    def test_no_window_falls_back_to_approx(self):
        cfg = cfg_of(knn_window=False)
        assert pipeline.graph_path(cfg, cfg.max_points) == \
            "row_blocked_approx"

    def test_no_window_no_approx_is_exact(self):
        cfg = cfg_of(knn_window=False, knn_approx=False)
        assert pipeline.graph_path(cfg, cfg.max_points) == "row_blocked"

    def test_unbanded_shape_falls_back(self):
        # the r3 knn_approx fallback (pipeline.py graph_of): an unaligned
        # N must leave the windowed path even with knn_window=True
        cfg = cfg_of()
        assert pipeline.graph_path(cfg, 500) == "row_blocked_approx"


def _windowed_adj(n=256, block=128):
    """A far-edge-free banded adjacency, the fused kernel's requirement."""
    cfg = cfg_of(max_points=n, agree_block=block)
    from multih_tpu.utils import data

    cs, _ = data.synthetic_scene(n - 16, 2, 0.1, 0.5, seed=5)
    x1, x2, valid, _ = multih_tpu.pad_points(
        cs.x1, cs.x2, cs.gt_labels, n
    )
    # Morton-sort so the window build is valid (fit() does this first)
    order = pipeline.morton_order(jnp.asarray(x1), jnp.asarray(valid))
    x1 = jnp.asarray(x1)[order]
    valid = jnp.asarray(valid)[order]
    nbr_idx, nbr_w = labeling.knn_graph_windowed(
        x1, valid, cfg.knn_k, block
    )
    return labeling.build_banded_adjacency(
        nbr_idx, nbr_w, block, far_capacity=0
    )


class TestFusedFrontGate:
    @pytest.fixture(scope="class")
    def adj(self):
        return _windowed_adj()

    @pytest.fixture()
    def on_tpu(self, monkeypatch):
        # the gate requires the TPU backend; emulate it so the REST of
        # the predicate is testable on CPU
        monkeypatch.setattr(
            pipeline, "_pallas_enabled", lambda cfg: cfg.use_pallas
        )

    def test_eligible(self, adj, on_tpu):
        cfg = cfg_of(mrf_fused_front=True)
        assert pipeline.fused_front_gate(cfg, adj, has_pt_mesh=False)

    def test_off_by_default(self, adj, on_tpu):
        cfg = cfg_of()  # mrf_fused_front defaults False (measured wash)
        assert not pipeline.fused_front_gate(cfg, adj, has_pt_mesh=False)

    def test_pt_mesh_disables(self, adj, on_tpu):
        cfg = cfg_of(mrf_fused_front=True)
        assert not pipeline.fused_front_gate(cfg, adj, has_pt_mesh=True)

    def test_fundamental_model_disables(self, adj, on_tpu):
        cfg = cfg_of(mrf_fused_front=True, model="fundamental",
                     residual="sampson", window_sampling=False)
        assert not pipeline.fused_front_gate(cfg, adj, has_pt_mesh=False)

    def test_sampson_residual_disables(self, adj, on_tpu):
        cfg = cfg_of(mrf_fused_front=True, residual="sampson")
        assert not pipeline.fused_front_gate(cfg, adj, has_pt_mesh=False)

    def test_far_edges_disable(self, on_tpu):
        cfg = cfg_of(mrf_fused_front=True)
        adj_far = _windowed_adj()._replace(
            far_w=jnp.ones((3,), jnp.float32),
            far_out=jnp.zeros((3,), jnp.int32),
            far_in=jnp.zeros((3,), jnp.int32),
        )
        assert not pipeline.fused_front_gate(
            cfg, adj_far, has_pt_mesh=False
        )

    def test_no_adjacency_disables(self, on_tpu):
        cfg = cfg_of(mrf_fused_front=True)
        assert not pipeline.fused_front_gate(cfg, None, has_pt_mesh=False)

    def test_cpu_backend_disables(self, adj):
        # without the monkeypatch: real backend (CPU in tests) -> False
        cfg = cfg_of(mrf_fused_front=True)
        assert not pipeline.fused_front_gate(cfg, adj, has_pt_mesh=False)


class TestGateKnobs:
    """The r5 config gates for the bisect/A-B surface: they must actually
    flip the pipeline branches they document."""

    def test_member_acceptance_flag_exists_and_defaults_on(self):
        assert cfg_of(model="fundamental", residual="sampson",
                      window_sampling=False).f_member_acceptance

    def test_union_merge_flag_exists_and_defaults_on(self):
        assert cfg_of(model="fundamental", residual="sampson",
                      window_sampling=False).f_union_merge

    def test_exclusive_refine_defaults_on_for_f(self):
        cfg = cfg_of(model="fundamental", residual="sampson",
                     window_sampling=False)
        assert cfg.f_exclusive_refine and cfg.f_exclusive_iterations > 0

    def test_resample_lo_defaults_on_for_f(self):
        cfg = cfg_of(model="fundamental", residual="sampson",
                     window_sampling=False)
        assert cfg.f_resample_lo and cfg.f_resample_iterations > 0
        assert cfg.f_resample_subsets >= 8
