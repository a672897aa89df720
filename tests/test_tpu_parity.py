"""On-device parity for every TPU-only code path (SURVEY.md §4 'hardware
strategy'; VERDICT r2 missing #4: the CPU test suite certifies the Pallas
kernels only via their jnp oracles — this file certifies them ON THE
DEVICE THE PIPELINE ACTUALLY USES).

Run on real TPU hardware with:

    MULTIH_TPU_TESTS=1 python -m pytest tests/test_tpu_parity.py -v -m tpu

(the conftest forces CPU unless MULTIH_TPU_TESTS=1). Results are
committed to docs/TPU_PARITY.md per round. Every test compares a
TPU-only execution path (Pallas kernel, fused MRF launch, on-device
graph build) against the jnp reference path executed on the same
device — and, for the graph and the full fit, against the CPU backend
that the golden/parity suite certifies.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.tpu

if jax.default_backend() != "tpu":  # pragma: no cover
    pytest.skip(
        "requires a real TPU (MULTIH_TPU_TESTS=1 + axon platform)",
        allow_module_level=True,
    )

from multih_tpu.models import labeling, pipeline  # noqa: E402
from multih_tpu.ops import geometry  # noqa: E402


def _morton_scene(rng, n, invalid=0):
    pts = jnp.asarray(rng.uniform(0, 100, (n, 2)).astype(np.float32))
    valid = jnp.ones((n,), jnp.float32)
    if invalid:
        valid = valid.at[-invalid:].set(0.0)
    perm = pipeline.morton_order(pts, valid)
    return pts[perm], valid[perm]


def _random_hs(rng, s):
    H = np.eye(3)[None] + rng.normal(0, 0.1, (s, 3, 3))
    H[:, 2, :2] = rng.normal(0, 3e-4, (s, 2))
    H /= np.linalg.norm(H, axis=(1, 2), keepdims=True)
    return jnp.asarray(H.astype(np.float32))


class TestResidualKernelOnDevice:
    @pytest.mark.parametrize("kind", ["symmetric", "transfer", "sampson"])
    def test_counts_match_jnp_within_boundary_ties(self, rng, kind):
        """All three residual kinds (VERDICT r2 item 8: 'transfer' and
        'sampson' now take the Pallas path too) vs the jnp reference,
        on device."""
        from multih_tpu.ops.kernels import residual_kernel

        s, n = 1024, 4096
        Hs = _random_hs(rng, s)
        x1 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        x2 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        valid = jnp.asarray((rng.uniform(size=n) > 0.2).astype(np.float32))
        thr = jnp.asarray(600.0 if kind == "sampson" else 2500.0,
                          jnp.float32)
        ref = jnp.sum(
            (geometry.residual_matrix(Hs, x1, x2, kind) < thr)
            * valid[None, :], axis=1,
        )
        got = residual_kernel.inlier_counts_padded(
            Hs, x1, x2, valid, thr, kind=kind
        )
        d = np.abs(np.asarray(got) - np.asarray(ref))
        assert d.max() <= 2.0, d.max()  # approx-reciprocal boundary ties
        assert d.mean() < 0.5, d.mean()
        got_exact = residual_kernel.inlier_counts_padded(
            Hs, x1, x2, valid, thr, approx_rcp=False, kind=kind
        )
        d2 = np.abs(np.asarray(got_exact) - np.asarray(ref))
        assert d2.max() <= 1.0, d2.max()


class TestDltKernelOnDevice:
    def test_matches_qr_reference(self, rng):
        from multih_tpu.ops.kernels import dlt_kernel

        s = 2048
        p1 = rng.uniform(0, 640, (s, 4, 2)).astype(np.float32)
        p2 = (p1 * 1.1 + rng.normal(0, 2.0, (s, 4, 2))).astype(np.float32)
        j1, j2 = jnp.asarray(p1), jnp.asarray(p2)
        got = dlt_kernel.homography_4pt_pallas(j1, j2)
        ref = geometry.homography_4pt_batch_qr(j1, j2)
        degen = np.asarray(
            geometry.quad_degenerate_batch(j1, 1e-4)
            | geometry.quad_degenerate_batch(j2, 1e-4)
        )
        err = np.abs(np.asarray(got) - np.asarray(ref)).max(axis=(1, 2))
        # both solvers on-device, fp32 rotation-order noise only
        assert err[~degen].max() < 5e-3, err[~degen].max()


class TestEigKernelOnDevice:
    def test_matches_jnp_jacobi(self, rng):
        from multih_tpu.ops.kernels import eig_kernel

        c = 2048
        A = rng.normal(size=(c, 9, 9)).astype(np.float32)
        ata = jnp.asarray(np.einsum("cij,cik->cjk", A, A))
        got = eig_kernel.smallest_eigvec_9x9_batch(ata)
        ref = eig_kernel.smallest_eigvec_9x9_batch_jnp(ata)
        # sign-canonicalize
        g = np.array(got)
        r = np.array(ref)
        g *= np.sign(np.sum(g * r, axis=1, keepdims=True))
        # compare as eigenvector quality: both must reach the same
        # Rayleigh quotient (entries can differ under near-degeneracy)
        rq = lambda v: np.einsum(
            "ci,cij,cj->c", v, np.asarray(ata), v
        )
        assert np.allclose(rq(g), rq(r), rtol=1e-3, atol=1e-3)
        close = np.abs(g - r).max(axis=1) < 1e-2
        assert close.mean() > 0.99, close.mean()


class TestFusedMrfKernelsOnDevice:
    def _problem(self, rng, n=2048, b=256, k=6, l=17):
        pts, valid = _morton_scene(rng, n, invalid=100)
        nbr_idx, nbr_w = labeling.knn_graph_windowed(pts, valid, k, b)
        adj = labeling.build_banded_adjacency(nbr_idx, nbr_w, b,
                                              far_capacity=0)
        dcost = jnp.asarray(
            rng.uniform(0.0, 2.0, (n, l)).astype(np.float32)
        )
        return nbr_idx, nbr_w, adj, dcost

    def test_mean_field_fused(self, rng):
        nbr_idx, nbr_w, adj, dcost = self._problem(rng)
        kw = dict(spatial_weight=0.1, iterations=6, temp_start=2.0,
                  temp_end=0.25, adj=adj)
        q_ref = labeling.mean_field(dcost, nbr_idx, nbr_w, **kw)
        q_ker = labeling.mean_field(dcost, nbr_idx, nbr_w, **kw,
                                    use_kernel=True)
        err = float(jnp.max(jnp.abs(q_ref - q_ker)))
        assert err < 1e-5, err
        assert bool(
            jnp.all(jnp.argmax(q_ref, 1) == jnp.argmax(q_ker, 1))
        )

    def test_icm_fused_bit_exact(self, rng):
        nbr_idx, nbr_w, adj, dcost = self._problem(rng)
        starts = jnp.stack([
            jnp.argmin(dcost, axis=1).astype(jnp.int32),
            jnp.asarray(rng.integers(0, 17, dcost.shape[0]), jnp.int32),
        ])
        ref = labeling._icm_batch(starts, dcost, 0.1, 2, adj)
        got = labeling._icm_batch(starts, dcost, 0.1, 2, adj,
                                  use_kernel=True)
        assert bool(jnp.all(ref == got))


class TestGraphCpuTpuIdentical:
    def test_windowed_knn_identical_across_backends(self, rng):
        """The windowed build replaced approx_max_k with exact top-k
        (k argmin passes), so the graph the TPU pipeline labels over is
        THE SAME graph the CPU test/golden suite certifies — VERDICT r2
        weak #6 resolved by construction; verified here."""
        n, k, b = 2048, 6, 256
        pts_np = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        valid_np = np.ones((n,), np.float32)
        pts, valid = jnp.asarray(pts_np), jnp.asarray(valid_np)
        perm = pipeline.morton_order(pts, valid)
        pts = pts[perm]
        i_tpu, w_tpu = labeling.knn_graph_windowed(pts, valid, k, b)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            pts_c = jnp.asarray(np.asarray(pts))
            valid_c = jnp.asarray(valid_np)
            i_cpu, w_cpu = labeling.knn_graph_windowed(pts_c, valid_c, k, b)
        idx_same = np.asarray(i_tpu) == np.asarray(i_cpu)
        assert idx_same.mean() > 0.999, idx_same.mean()
        np.testing.assert_array_equal(
            np.asarray(w_tpu)[idx_same], np.asarray(w_cpu)[idx_same]
        )


class TestFullFitCpuTpuAgreement:
    def test_labels_agree_across_backends(self, rng):
        """Full pipeline on TPU (Pallas kernels, fused MRF) vs the CPU
        backend (jnp reference paths) on a known synthetic scene: the
        plane decompositions must describe the same structure (>= 97%
        Hungarian-matched label agreement — the golden-parity bar)."""
        import multih_tpu
        from multih_tpu.utils import data, evaluation

        cfg = multih_tpu.MultiHConfig(max_points=512, n_hypotheses=2048)
        cs, _ = data.synthetic_scene(480, 3, 0.15, 0.5, seed=11)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg.max_points
        )
        key = jax.random.key(0)
        res_t = jax.jit(
            lambda a, b, v, k: pipeline.fit(a, b, v, k, cfg)
        )(x1, x2, valid, key)
        lab_t = np.asarray(res_t.labels)[: cs.n_points]
        cpu = jax.devices("cpu")[0]
        # the CPU reference path: jnp everywhere (use_pallas must be off
        # explicitly — _pallas_enabled keys on the default *backend*,
        # which stays 'tpu' under default_device(cpu))
        import dataclasses

        cfg_c = dataclasses.replace(cfg, use_pallas=False)
        with jax.default_device(cpu):
            res_c = jax.jit(
                lambda a, b, v, k: pipeline.fit(a, b, v, k, cfg_c)
            )(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(valid),
              jax.random.key(0))
            lab_c = np.asarray(res_c.labels)[: cs.n_points]
        err_t = evaluation.misclassification_error(
            lab_t, cs.gt_labels, cfg.max_labels
        )
        err_c = evaluation.misclassification_error(
            lab_c, cs.gt_labels, cfg.max_labels
        )
        agree = 100.0 - evaluation.misclassification_error(
            lab_t, lab_c, cfg.max_labels, gt_outlier=cfg.max_labels
        )
        print(f"\nTPU miscls {err_t:.2f}%  CPU miscls {err_c:.2f}%  "
              f"agreement {agree:.2f}%")
        assert err_t < 3.0, err_t
        assert agree >= 97.0, agree


class TestWindowGatherOnDevice:
    @pytest.mark.parametrize("mode", ["index", "rank"])
    def test_kernel_matches_reference(self, rng, mode):
        """The MXU one-hot window gather (compiled, not interpret) vs the
        jnp searchsorted/take reference, both selection modes."""
        from multih_tpu.ops.kernels import gather_kernel

        nb, block, c = 4, 128, 16
        rows = 3 * block
        win = rng.standard_normal((nb, rows, c)).astype(np.float32)
        avail = (rng.uniform(size=(nb, rows)) < 0.6).astype(np.float32)
        avail[0, :block] = 0.0
        avail[-1, 2 * block:] = 0.0
        win[:, :, 4] = avail
        win[:, :, 5] = np.cumsum(avail, axis=1)
        win = jnp.asarray(win)
        hi = rows if mode == "index" else int(avail.sum(1).max()) + 8
        sel = jnp.asarray(
            rng.integers(-2, hi, size=(nb, 1024)).astype(np.int32)
        )
        ref = gather_kernel.window_gather_reference(win, sel, mode)
        out = gather_kernel.window_gather(win, sel, mode)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=0
        )

    def test_windowed_fit_matches_reference_gather_path(self, rng):
        """End to end on device: windowed_quadruples with the Pallas
        gather (the production TPU path) vs the jnp reference gather,
        same draws — bit-identical (32, S) packings."""
        from multih_tpu.ops import sampling

        n, block, s = 1024, 256, 128
        pts = np.sort(rng.uniform(0, 640, (n,)).astype(np.float32))
        x1 = jnp.stack(
            [jnp.asarray(pts), jnp.asarray(rng.uniform(0, 480, n)
                                           .astype(np.float32))], axis=1
        )
        x2 = x1 + 2.0
        avail = jnp.asarray(
            (rng.uniform(size=n) < 0.7).astype(np.float32)
        )
        nbr_idx, _ = labeling.knn_graph_windowed(
            x1, jnp.ones((n,), jnp.float32), 8, block
        )
        args = (jax.random.key(3), x1, x2, avail, nbr_idx, s, block)
        ref = sampling.windowed_quadruples(*args, use_kernel=False)
        out = sampling.windowed_quadruples(*args, use_kernel=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=1e-6
        )


class TestFModelOnDevice:
    """Fundamental-model TPU paths (the multi-model extension): the f_*
    residual kinds of the Pallas count kernel and the 12-point
    normal-equations solver, both vs their jnp/float64 references ON
    DEVICE (same rigor as the homography rows in docs/TPU_PARITY.md)."""

    def _random_fs(self, rng, s):
        # plausible pixel-scale fundamental matrices: from random
        # two-view geometries (rank 2 by construction)
        K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
        Fs = []
        for _ in range(s):
            a = rng.normal(0, 0.1, 3)
            th = np.linalg.norm(a) + 1e-12
            k = a / th
            Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                           [-k[1], k[0], 0]])
            R = (np.eye(3) + np.sin(th) * Kx
                 + (1 - np.cos(th)) * Kx @ Kx)
            t = rng.normal(0, 1, 3)
            tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                           [-t[1], t[0], 0]])
            F = np.linalg.inv(K).T @ tx @ R @ np.linalg.inv(K)
            Fs.append(F / np.linalg.norm(F))
        return jnp.asarray(np.stack(Fs).astype(np.float32))

    @pytest.mark.parametrize(
        "kind", ["f_symmetric", "f_transfer", "f_sampson"]
    )
    def test_f_counts_match_jnp_within_boundary_ties(self, rng, kind):
        from multih_tpu.ops import fmodel
        from multih_tpu.ops.kernels import residual_kernel

        s, n = 1024, 4096
        Fs = self._random_fs(rng, s)
        x1 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        x2 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        valid = jnp.asarray((rng.uniform(size=n) > 0.2).astype(np.float32))
        thr = jnp.asarray(9.0, jnp.float32)
        ref = jnp.sum(
            (fmodel.residual_matrix_f(Fs, x1, x2, kind[2:]) < thr)
            * valid[None, :], axis=1,
        )
        got = residual_kernel.inlier_counts_padded(
            Fs, x1, x2, valid, thr, kind=kind
        )
        d = np.abs(np.asarray(got) - np.asarray(ref))
        assert d.max() <= 2.0, d.max()
        assert d.mean() < 0.5, d.mean()
        got_exact = residual_kernel.inlier_counts_padded(
            Fs, x1, x2, valid, thr, approx_rcp=False, kind=kind
        )
        d2 = np.abs(np.asarray(got_exact) - np.asarray(ref))
        assert d2.max() <= 1.0, d2.max()

    def test_npt_solver_matches_float64_oracle(self, rng):
        """fundamental_npt_batch (12-pt normal equations + 9x9 eig,
        cfg.f_sample_points=12) on device vs a float64 NumPy SVD solve
        of the same samples: residual geometry must agree (Sampson RMS
        on the sample points ~ 0 for both, entry-wise F after sign
        alignment within fp32 normal-equation tolerance)."""
        from multih_tpu.ops import fmodel

        s, m = 512, 12
        K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
        p1s, p2s = [], []
        for _ in range(s):
            X = rng.uniform([-2, -2, 4], [2, 2, 10], (m, 3))
            a = rng.normal(0, 0.1, 3)
            th = np.linalg.norm(a) + 1e-12
            k = a / th
            Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                           [-k[1], k[0], 0]])
            R = (np.eye(3) + np.sin(th) * Kx
                 + (1 - np.cos(th)) * Kx @ Kx)
            t = np.array([1.0, 0.2, 0.1]) + rng.normal(0, 0.1, 3)
            Y1 = X / X[:, 2:]
            Y2 = (R @ X.T).T + t
            Y2 = Y2 / Y2[:, 2:]
            p1s.append((K @ Y1.T).T[:, :2])
            p2s.append((K @ Y2.T).T[:, :2])
        p1 = jnp.asarray(np.stack(p1s).astype(np.float32))
        p2 = jnp.asarray(np.stack(p2s).astype(np.float32))
        got = np.asarray(fmodel.fundamental_npt_batch(p1, p2, 6, "eigh"))

        def np8pt(x1, x2):
            x1 = np.asarray(x1, np.float64)
            x2 = np.asarray(x2, np.float64)

            def norm(x):
                mean = x.mean(0)
                c = x - mean
                sc = np.sqrt(2) / max(np.sqrt((c**2).sum(1).mean()), 1e-12)
                T = np.array([[sc, 0, -sc * mean[0]],
                              [0, sc, -sc * mean[1]], [0, 0, 1]])
                return c * sc, T

            x1n, T1 = norm(x1)
            x2n, T2 = norm(x2)
            x, y = x1n[:, 0], x1n[:, 1]
            u, v = x2n[:, 0], x2n[:, 1]
            a = np.stack([u*x, u*y, u, v*x, v*y, v, x, y,
                          np.ones(len(x))], 1)
            _, _, vt = np.linalg.svd(a)
            Fn = vt[-1].reshape(3, 3)
            uu, ss, vv = np.linalg.svd(Fn)
            Fn = uu @ np.diag([ss[0], ss[1], 0]) @ vv
            F = T2.T @ Fn @ T1
            return F / np.linalg.norm(F)

        errs = []
        for i in range(s):
            ref = np8pt(p1s[i], p2s[i])
            g = got[i]
            sgn = np.sign(np.sum(g * ref)) or 1.0
            errs.append(np.abs(sgn * g - ref).max())
        errs = np.array(errs)
        # fp32 normal equations square the conditioning; Hartley
        # normalization keeps the bulk tight — median well under 1e-3,
        # and even tail samples stay geometrically equivalent
        assert np.median(errs) < 1e-3, np.median(errs)
        assert np.mean(errs < 1e-2) > 0.95, (errs.mean(), errs.max())


class TestFusedFrontOnDevice:
    """Round-5 entry (VERDICT r4 task 5): `mean_field_fused_front` — the
    residual + data-cost + mean-field chain as ONE Pallas launch — had
    only CPU interpret-mode tests. This compares it on-device against
    the exact unfused chain `_pearl_iteration` would otherwise run."""

    @pytest.mark.parametrize("kind", ["symmetric", "transfer"])
    def test_fused_front_matches_unfused_chain(self, kind):
        import multih_tpu
        from multih_tpu.utils import data

        cfg = multih_tpu.MultiHConfig(
            max_points=512, n_hypotheses=256, max_labels=8,
            residual=kind,
        )
        cs, _ = data.synthetic_scene(480, 3, 0.1, 0.5, seed=21)
        x1, x2, valid, _ = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg.max_points
        )
        x1, x2, valid = map(jnp.asarray, (x1, x2, valid))
        perm = pipeline.morton_order(x1, valid)
        x1, x2, valid = x1[perm], x2[perm], valid[perm]
        nbr_idx, nbr_w = labeling.knn_graph_windowed(
            x1, valid, cfg.knn_k, cfg.agree_block
        )
        adj = labeling.build_banded_adjacency(
            nbr_idx, nbr_w, cfg.agree_block, far_capacity=0
        )
        assert pipeline.fused_front_gate(
            multih_tpu.MultiHConfig(
                max_points=512, n_hypotheses=256, max_labels=8,
                residual=kind, mrf_fused_front=True,
            ), adj, has_pt_mesh=False,
        )
        rng = np.random.default_rng(3)
        k = cfg.max_labels
        Hs = _random_hs(rng, k)
        active = jnp.ones((k,), jnp.float32).at[-2:].set(0.0)
        thr = jnp.asarray(cfg.inlier_threshold**2, jnp.float32)
        q0 = jnp.full((k + 1, x1.shape[0]), 1.0 / (k + 1), jnp.float32)

        @jax.jit
        def fused(x1, x2, valid, Hs, q0):
            return labeling.pearl_relax_fused(
                x1, x2, valid, Hs, active, thr, cfg.outlier_cost,
                cfg.spatial_weight, cfg.meanfield_iterations,
                cfg.temperature_start, cfg.temperature, q0, adj,
                kind=kind,
            )

        @jax.jit
        def unfused(x1, x2, valid, Hs, q0):
            r = pipeline.model_residual_matrix(Hs, x1, x2, kind, cfg)
            dct = labeling.data_costs_t(
                r, valid, thr, cfg.outlier_cost, active
            )
            q = labeling.mean_field_t(
                dct, nbr_idx, nbr_w, cfg.spatial_weight,
                cfg.meanfield_iterations, cfg.temperature_start,
                cfg.temperature, q_init=q0, adj=adj, use_kernel=True,
            )
            return q, dct, r

        q_f, dct_f, r_f = jax.block_until_ready(
            fused(x1, x2, valid, Hs, q0))
        q_u, dct_u, r_u = jax.block_until_ready(
            unfused(x1, x2, valid, Hs, q0))
        # residuals: same math, fused computes in the kernel's load pass
        np.testing.assert_allclose(
            np.asarray(r_f), np.asarray(r_u), rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(dct_f), np.asarray(dct_u), rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(q_f), np.asarray(q_u), rtol=0, atol=1e-4
        )
        lab_same = (np.argmax(np.asarray(q_f), 0)
                    == np.argmax(np.asarray(q_u), 0))
        assert lab_same.mean() > 0.999, lab_same.mean()


class TestFundamentalFitCpuTpuAgreement:
    """Round-5 entry: the FULL fundamental fit — split-refine, exclusive-
    core and member-resample-LO phases included — on TPU (Pallas paths)
    vs the CPU backend (jnp reference paths)."""

    def test_motion_labels_agree_across_backends(self):
        import dataclasses

        import multih_tpu
        from multih_tpu.utils import data, evaluation

        cfg = multih_tpu.MultiHConfig(
            max_points=512, n_hypotheses=2048, model="fundamental",
            residual="sampson", inlier_threshold=3.0,
        )
        cs, _ = data.synthetic_motion_scene(480, 3, 0.15, 0.5, seed=8)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg.max_points
        )
        res_t = jax.jit(
            lambda a, b, v, k: pipeline.fit(a, b, v, k, cfg)
        )(x1, x2, valid, jax.random.key(0))
        lab_t = np.asarray(res_t.labels)[: cs.n_points]
        cfg_c = dataclasses.replace(cfg, use_pallas=False)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            res_c = jax.jit(
                lambda a, b, v, k: pipeline.fit(a, b, v, k, cfg_c)
            )(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(valid),
              jax.random.key(0))
            lab_c = np.asarray(res_c.labels)[: cs.n_points]
        err_t = evaluation.misclassification_error(
            lab_t, cs.gt_labels, cfg.max_labels
        )
        err_c = evaluation.misclassification_error(
            lab_c, cs.gt_labels, cfg.max_labels
        )
        agree = 100.0 - evaluation.misclassification_error(
            lab_t, lab_c, cfg.max_labels, gt_outlier=cfg.max_labels
        )
        print(f"\nF-model TPU miscls {err_t:.2f}%  CPU {err_c:.2f}%  "
              f"agreement {agree:.2f}%")
        # motion-suite bar, not the homography one (1-D constraints)
        assert err_t < 8.0, err_t
        assert agree >= 95.0, agree


class TestMixedFitCpuTpuAgreement:
    """Round-5 entry: the mixed plane+motion fit (models/mixed.py) on
    TPU vs the CPU backend."""

    def test_mixed_labels_agree_across_backends(self):
        import dataclasses

        import multih_tpu
        from multih_tpu.models import mixed
        from multih_tpu.utils import data, evaluation

        cfg_h = multih_tpu.MultiHConfig(
            max_points=640, n_hypotheses=2048, max_labels=8,
        )
        cfg_f = multih_tpu.MultiHConfig(
            max_points=640, n_hypotheses=2048, max_labels=8,
            model="fundamental", residual="sampson",
            inlier_threshold=3.0,
        )
        cs, _, _ = data.synthetic_mixed_scene(600, 2, 1, 0.1, 0.5,
                                              seed=4)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg_h.max_points
        )
        k_union = cfg_h.max_labels + cfg_f.max_labels
        res_t = mixed.make_fit_mixed(cfg_h, cfg_f)(
            x1, x2, valid, jax.random.key(0)
        )
        lab_t = np.asarray(res_t.labels)[: cs.n_points]
        cfg_hc = dataclasses.replace(cfg_h, use_pallas=False)
        cfg_fc = dataclasses.replace(cfg_f, use_pallas=False)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            res_c = mixed.make_fit_mixed(cfg_hc, cfg_fc)(
                jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(valid),
                jax.random.key(0)
            )
            lab_c = np.asarray(res_c.labels)[: cs.n_points]
        err_t = evaluation.misclassification_error(
            lab_t, cs.gt_labels, k_union
        )
        err_c = evaluation.misclassification_error(
            lab_c, cs.gt_labels, k_union
        )
        agree = 100.0 - evaluation.misclassification_error(
            lab_t, lab_c, k_union, gt_outlier=k_union
        )
        print(f"\nmixed TPU miscls {err_t:.2f}%  CPU {err_c:.2f}%  "
              f"agreement {agree:.2f}%")
        assert err_t < 8.0, err_t
        assert agree >= 95.0, agree

class TestMixedAdaptiveCpuTpuAgreement:
    """Round-5 entry (VERDICT r4 task 8): the per-class adaptive-tau
    mixed fit — two single-class probes, shared-noise calibration, final
    mixed fit (mixed.fit_mixed_adaptive) — on TPU vs the CPU backend.
    The calibrated taus are the sensitive part: they flow through
    sorted-median reductions whose inputs differ by backend-accumulation
    order, so both the taus and the final labels are compared."""

    def test_adaptive_taus_and_labels_agree(self):
        import dataclasses

        import multih_tpu
        from multih_tpu.models import mixed
        from multih_tpu.utils import data, evaluation

        cfg_h = multih_tpu.MultiHConfig(
            max_points=640, n_hypotheses=2048, max_labels=8,
        )
        cfg_f = multih_tpu.MultiHConfig(
            max_points=640, n_hypotheses=2048, max_labels=8,
            model="fundamental", residual="sampson",
            inlier_threshold=3.0,
        )
        # 1 px noise: the scene where calibration MATTERS (static tau=3
        # loses both planes, measured 5.67% -> calibrated 0.67%)
        cs, _, _ = data.synthetic_mixed_scene(600, 2, 1, 0.1, 1.0,
                                              seed=11)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg_h.max_points
        )
        k_union = cfg_h.max_labels + cfg_f.max_labels
        res_t, th_t, tf_t = mixed.make_fit_mixed_adaptive(cfg_h, cfg_f)(
            x1, x2, valid, jax.random.key(0)
        )
        lab_t = np.asarray(res_t.labels)[: cs.n_points]
        cfg_hc = dataclasses.replace(cfg_h, use_pallas=False)
        cfg_fc = dataclasses.replace(cfg_f, use_pallas=False)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            res_c, th_c, tf_c = mixed.make_fit_mixed_adaptive(
                cfg_hc, cfg_fc
            )(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(valid),
              jax.random.key(0))
            lab_c = np.asarray(res_c.labels)[: cs.n_points]
        err_t = evaluation.misclassification_error(
            lab_t, cs.gt_labels, k_union
        )
        err_c = evaluation.misclassification_error(
            lab_c, cs.gt_labels, k_union
        )
        agree = 100.0 - evaluation.misclassification_error(
            lab_t, lab_c, k_union, gt_outlier=k_union
        )
        print(f"\nmixed adaptive TPU tau=({float(th_t):.2f},"
              f"{float(tf_t):.2f}) miscls {err_t:.2f}%  CPU tau="
              f"({float(th_c):.2f},{float(tf_c):.2f}) miscls "
              f"{err_c:.2f}%  agreement {agree:.2f}%")
        assert abs(float(th_t) - float(th_c)) < 0.5, (th_t, th_c)
        assert abs(float(tf_t) - float(tf_c)) < 0.5, (tf_t, tf_c)
        assert 4.5 < float(th_t) < 7.5, float(th_t)
        assert err_t < 3.0, err_t
        assert agree >= 95.0, agree
