"""AOT export/load of fit programs (utils/aot.py — VERDICT r2 item 9).

The export path must (a) roundtrip through serialize/deserialize and
produce the same results as the jitted original, (b) fall back to plain
jit on a corrupt blob, and (c) key blobs by config so a different config
never loads a stale program.
"""

import numpy as np
import jax
import pytest

import multih_tpu
from multih_tpu.utils import aot, data


@pytest.fixture(scope="module")
def small_cfg():
    return multih_tpu.MultiHConfig(max_points=128, n_hypotheses=256)


@pytest.fixture(scope="module")
def scene_args(small_cfg):
    cs, _ = data.synthetic_scene(100, 2, 0.1, 0.5, seed=5)
    x1, x2, valid, gt = multih_tpu.pad_points(
        cs.x1, cs.x2, cs.gt_labels, small_cfg.max_points
    )
    return (x1, x2, valid, jax.random.key(0)), gt


def test_roundtrip_matches_jit(small_cfg, scene_args, tmp_path):
    args, _ = scene_args
    cache = str(tmp_path / "aot")
    path = aot.export_fit(small_cfg, "fit", cache)
    assert path.endswith(".bin")

    f_aot = aot.cached_fit(small_cfg, "fit", cache, save_on_miss=False)
    f_jit = multih_tpu.make_fit(small_cfg)
    res_a = f_aot(*args)
    res_j = f_jit(*args)
    np.testing.assert_array_equal(
        np.asarray(res_a.labels), np.asarray(res_j.labels)
    )
    np.testing.assert_allclose(
        np.asarray(res_a.homographies), np.asarray(res_j.homographies),
        rtol=0, atol=1e-6,
    )
    assert res_a._fields == res_j._fields  # pytree structure preserved


def test_corrupt_blob_falls_back_to_jit(small_cfg, scene_args, tmp_path):
    args, _ = scene_args
    cache = str(tmp_path / "aot")
    import os

    os.makedirs(cache, exist_ok=True)
    blob = os.path.join(cache, aot.cache_key(small_cfg, "fit") + ".bin")
    with open(blob, "wb") as fh:
        fh.write(b"not an exported module")
    f = aot.cached_fit(small_cfg, "fit", cache, save_on_miss=False)
    res = f(*args)  # must still work (plain jit fallback)
    assert np.asarray(res.labels).shape == (small_cfg.max_points,)


def test_key_differs_by_config_and_kind(small_cfg):
    import dataclasses

    other = dataclasses.replace(small_cfg, inlier_threshold=4.0)
    assert aot.cache_key(small_cfg, "fit") != aot.cache_key(other, "fit")
    assert aot.cache_key(small_cfg, "fit") != aot.cache_key(
        small_cfg, "fit_tau"
    )


def test_save_on_miss_writes_blob(small_cfg, tmp_path):
    cache = str(tmp_path / "aot")
    aot.cached_fit(small_cfg, "fit_tau", cache, save_on_miss=True)
    import os

    blob = os.path.join(
        cache, aot.cache_key(small_cfg, "fit_tau") + ".bin"
    )
    assert os.path.exists(blob)
