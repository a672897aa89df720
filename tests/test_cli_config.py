"""CLI contract (reference C1) and config validation tests."""

import json
import subprocess
import sys

import numpy as np
import pytest

import multih_tpu
from multih_tpu.utils import data


class TestConfig:
    def test_frozen_and_hashable(self):
        cfg = multih_tpu.MultiHConfig()
        hash(cfg)  # static jit argument requirement
        with pytest.raises(Exception):
            cfg.max_labels = 3  # frozen

    def test_candidate_clamp(self):
        cfg = multih_tpu.MultiHConfig(n_hypotheses=64, n_candidates=256,
                                      max_labels=16)
        assert cfg.n_candidates == 64

    def test_max_labels_validation(self):
        with pytest.raises(ValueError):
            multih_tpu.MultiHConfig(n_candidates=8, max_labels=16)


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "multih_tpu.cli", *args],
        capture_output=True, text=True, timeout=900,
    )


@pytest.mark.slow
class TestCLI:
    def test_fit_text_file_json(self, tmp_path):
        cs, _ = data.synthetic_scene(150, 2, 0.1, 0.3, seed=2)
        path = tmp_path / "pair.txt"
        data.save_correspondences_txt(str(path), cs)
        r = run_cli("fit", str(path), "--json", "--platform", "cpu",
                    "--hypotheses", "512")
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["n_planes_found"] == 2
        assert out["misclassification_pct"] < 5.0
        assert len(out["homographies"]) == 2

    def test_fit_mat_file(self, tmp_path):
        from scipy.io import savemat

        cs, _ = data.synthetic_scene(120, 2, 0.0, 0.0, seed=4)
        d = np.concatenate(
            [cs.x1.T, np.ones((1, 120)), cs.x2.T, np.ones((1, 120))], axis=0
        )
        savemat(str(tmp_path / "scene.mat"),
                {"data": d, "label": cs.gt_labels.astype(np.float64)})
        r = run_cli("fit", str(tmp_path / "scene.mat"), "--json",
                    "--platform", "cpu", "--hypotheses", "512")
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["n_planes_found"] == 2
        assert out["misclassification_pct"] == 0.0

    def test_save_labels_roundtrip(self, tmp_path):
        cs, _ = data.synthetic_scene(100, 1, 0.0, 0.0, seed=6)
        path = tmp_path / "pair.txt"
        data.save_correspondences_txt(str(path), cs)
        lab_path = tmp_path / "labels.txt"
        r = run_cli("fit", str(path), "--platform", "cpu",
                    "--hypotheses", "256", "--save-labels", str(lab_path))
        assert r.returncode == 0, r.stderr[-2000:]
        labels = np.loadtxt(str(lab_path))
        assert labels.shape == (100,)


class TestHostKeyedCompileCache:
    """Every persistent-compile-cache site must key the directory by the
    host CPU fingerprint: XLA:CPU AOT blobs embed the compile machine's
    feature set, and a /tmp cache carried across machines SIGSEGV'd the
    suite on load (multih_tpu/utils/cache.py)."""

    def test_fingerprint_stable_and_dir_keyed(self):
        from multih_tpu.utils.cache import (
            compile_cache_dir,
            host_fingerprint,
        )

        fp = host_fingerprint()
        assert len(fp) == 8 and fp == host_fingerprint()
        int(fp, 16)  # hex digest
        assert compile_cache_dir("/tmp/base") == f"/tmp/base-{fp}"

    def test_conftest_uses_keyed_dir(self):
        import jax

        from multih_tpu.utils.cache import host_fingerprint

        d = jax.config.jax_compilation_cache_dir
        assert d is not None and d.endswith(host_fingerprint()), d
