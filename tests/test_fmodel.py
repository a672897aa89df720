"""Unit oracles for the fundamental-matrix model ops (ops/fmodel.py) —
the multi-model extension's geometry layer, tested the same way the
homography layer is (SURVEY.md §4: every geometry kernel vs an
independent oracle on random inputs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multih_tpu.ops import epipolar, fmodel, geometry


def make_two_view(rng, n=64, noise=0.0, baseline=(1.0, 0.2, 0.1),
                  rot_deg=8.0):
    """Random 3D scene seen by two calibrated cameras; returns (x1, x2, F)
    with F computed in closed form from the camera geometry (float64)."""
    f_len, cx, cy = 800.0, 320.0, 240.0
    K = np.array([[f_len, 0, cx], [0, f_len, cy], [0, 0, 1.0]])
    X = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3))
    a = np.deg2rad(rot_deg) * rng.normal(size=3)
    # small-angle rotation via Rodrigues
    t_ang = np.linalg.norm(a) + 1e-12
    k = a / t_ang
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(t_ang) * Kx + (1 - np.cos(t_ang)) * Kx @ Kx
    t = np.asarray(baseline, np.float64)

    def project(P, Rc, tc):
        Y = (Rc @ P.T).T + tc
        return Y[:, :2] / Y[:, 2:3]

    x1 = (K @ np.concatenate(
        [project(X, np.eye(3), np.zeros(3)), np.ones((n, 1))], 1).T).T[:, :2]
    x2 = (K @ np.concatenate(
        [project(X, R, t), np.ones((n, 1))], 1).T).T[:, :2]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F = np.linalg.inv(K).T @ tx @ R @ np.linalg.inv(K)
    F = F / np.linalg.norm(F)
    if noise > 0:
        x1 = x1 + rng.normal(0, noise, x1.shape)
        x2 = x2 + rng.normal(0, noise, x2.shape)
    return x1.astype(np.float32), x2.astype(np.float32), F


def np_sampson(F, x1, x2):
    x1h = np.concatenate([x1, np.ones((len(x1), 1))], 1).astype(np.float64)
    x2h = np.concatenate([x2, np.ones((len(x2), 1))], 1).astype(np.float64)
    l = x1h @ np.asarray(F, np.float64).T
    m = x2h @ np.asarray(F, np.float64)
    e = np.sum(x2h * l, axis=1)
    return e**2 / (l[:, 0]**2 + l[:, 1]**2 + m[:, 0]**2 + m[:, 1]**2)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestResiduals:
    def test_sampson_matches_numpy(self, rng):
        x1, x2, F = make_two_view(rng, noise=1.0)
        got = np.asarray(fmodel.residual_matrix_f(
            jnp.asarray(F, jnp.float32)[None], jnp.asarray(x1),
            jnp.asarray(x2), "sampson",
        ))[0]
        ref = np_sampson(F, x1, x2)
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-4)

    def test_symmetric_is_sum_of_sides(self, rng):
        x1, x2, F = make_two_view(rng, noise=1.0)
        Fb = jnp.asarray(F, jnp.float32)[None]
        fwd = fmodel.residual_matrix_f(Fb, jnp.asarray(x1),
                                       jnp.asarray(x2), "transfer")
        # backward = forward of the transposed constraint with sides swapped
        bwd = fmodel.residual_matrix_f(
            jnp.asarray(F.T, jnp.float32)[None], jnp.asarray(x2),
            jnp.asarray(x1), "transfer",
        )
        sym = fmodel.residual_matrix_f(Fb, jnp.asarray(x1),
                                       jnp.asarray(x2), "symmetric")
        np.testing.assert_allclose(
            np.asarray(sym), np.asarray(fwd + bwd), rtol=1e-4, atol=1e-5
        )

    def test_noise_free_residuals_are_zero(self, rng):
        x1, x2, F = make_two_view(rng, noise=0.0)
        for kind in ("sampson", "symmetric", "transfer"):
            r = np.asarray(fmodel.residual_matrix_f(
                jnp.asarray(F, jnp.float32)[None], jnp.asarray(x1),
                jnp.asarray(x2), kind,
            ))
            assert r.max() < 1e-2, (kind, r.max())


class TestMinimalSolver:
    def test_recovers_true_f(self, rng):
        x1, x2, F = make_two_view(rng, n=8, noise=0.0)
        Fe = np.asarray(fmodel.fundamental_8pt_minimal(
            jnp.asarray(x1), jnp.asarray(x2)
        ))
        # compare up to sign
        d = min(np.linalg.norm(Fe - F / np.linalg.norm(F)),
                np.linalg.norm(Fe + F / np.linalg.norm(F)))
        assert d < 5e-3, d
        assert abs(np.linalg.det(Fe.astype(np.float64))) < 1e-6

    def test_pure_lateral_translation(self, rng):
        """F33 = 0 exactly (KITTI stereo geometry): the fixed Q0 rotation
        must keep the QR back substitution valid."""
        x1, x2, F = make_two_view(
            rng, n=8, noise=0.0, baseline=(1.0, 0.0, 0.0), rot_deg=0.0
        )
        assert abs(F[2, 2]) < 1e-12  # the degenerate case by construction
        Fe = np.asarray(fmodel.fundamental_8pt_minimal(
            jnp.asarray(x1), jnp.asarray(x2)
        ))
        r = np_sampson(Fe, *make_two_view(
            np.random.default_rng(1), n=64, noise=0.0,
            baseline=(1.0, 0.0, 0.0), rot_deg=0.0
        )[:2])
        assert np.median(r) < 1e-2, np.median(r)

    def test_batch_matches_single(self, rng):
        x1 = rng.uniform(0, 640, (16, 8, 2)).astype(np.float32)
        x2 = x1 + rng.uniform(-40, 40, (16, 8, 2)).astype(np.float32)
        Fb = np.asarray(fmodel.fundamental_8pt_batch_qr(
            jnp.asarray(x1), jnp.asarray(x2)
        ))
        for i in range(4):
            Fi = np.asarray(fmodel.fundamental_8pt_minimal(
                jnp.asarray(x1[i]), jnp.asarray(x2[i])
            ))
            np.testing.assert_allclose(Fb[i], Fi, rtol=1e-5, atol=1e-6)

    def test_matches_opencv(self, rng):
        cv2 = pytest.importorskip("cv2")
        x1, x2, _ = make_two_view(rng, n=8, noise=0.0)
        Fcv, _ = cv2.findFundamentalMat(x1, x2, cv2.FM_8POINT)
        if Fcv is None:
            pytest.skip("opencv found no F for this sample")
        Fcv = Fcv[:3] / np.linalg.norm(Fcv[:3])
        Fe = np.asarray(fmodel.fundamental_8pt_minimal(
            jnp.asarray(x1), jnp.asarray(x2)
        ))
        d = min(np.linalg.norm(Fe - Fcv), np.linalg.norm(Fe + Fcv))
        assert d < 1e-2, d


class TestRefit:
    def test_matches_direct_weighted_8pt(self, rng):
        x1, x2, _ = make_two_view(rng, n=128, noise=0.5)
        w = (rng.uniform(size=(4, 128)) > 0.3).astype(np.float32) \
            * rng.uniform(0.2, 1.0, (4, 128)).astype(np.float32)
        basis = fmodel.prepare_refit_f(jnp.asarray(x1), jnp.asarray(x2))
        got = np.asarray(fmodel.fundamental_refit_batch(
            jnp.asarray(w), basis
        ))
        for c in range(4):
            ref = np.asarray(epipolar.fundamental_8pt(
                jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w[c])
            ))
            ref = ref / np.linalg.norm(ref)
            d = min(np.linalg.norm(got[c] - ref),
                    np.linalg.norm(got[c] + ref))
            assert d < 2e-2, (c, d)
            assert abs(np.linalg.det(got[c].astype(np.float64))) < 1e-5

    def test_refit_recovers_true_f_under_outliers(self, rng):
        x1, x2, F = make_two_view(rng, n=256, noise=0.0)
        w = np.ones((1, 256), np.float32)
        # zero-weight 30% garbage points
        out = rng.permutation(256)[:80]
        x1o = x1.copy()
        x1o[out] = rng.uniform(0, 640, (80, 2)).astype(np.float32)
        w[0, out] = 0.0
        basis = fmodel.prepare_refit_f(jnp.asarray(x1o), jnp.asarray(x2))
        Fe = np.asarray(fmodel.fundamental_refit_batch(jnp.asarray(w),
                                                       basis))[0]
        Ft = F / np.linalg.norm(F)
        d = min(np.linalg.norm(Fe - Ft), np.linalg.norm(Fe + Ft))
        assert d < 5e-3, d


class TestNptSolver:
    def test_recovers_true_f_noise_free(self, rng):
        """fundamental_npt_minimal (overdetermined 12-point, normal
        equations + 9x9 eigensolve; cfg.f_sample_points=12) recovers the
        closed-form F on noise-free samples."""
        x1, x2, F_true = make_two_view(rng, n=12)
        F = np.asarray(fmodel.fundamental_npt_minimal(
            jnp.asarray(x1), jnp.asarray(x2)))
        s = np.sign(np.sum(F * F_true)) or 1.0
        assert np.max(np.abs(s * F - F_true)) < 2e-4, F

    def test_batch_matches_single(self, rng):
        x1a, x2a, _ = make_two_view(rng, n=12)
        x1b, x2b, _ = make_two_view(rng, n=12, rot_deg=3.0)
        p1 = jnp.stack([jnp.asarray(x1a), jnp.asarray(x1b)])
        p2 = jnp.stack([jnp.asarray(x2a), jnp.asarray(x2b)])
        Fb = fmodel.fundamental_npt_batch(p1, p2, 6, "eigh")
        Fa = fmodel.fundamental_npt_minimal(p1[0], p2[0], 6, "eigh")
        np.testing.assert_allclose(np.asarray(Fb[0]), np.asarray(Fa),
                                   atol=1e-6)

    def test_noisy_12pt_beats_minimal_8pt(self, rng):
        """The measured premise of f_sample_points=12 (config.py): at
        ~0.5 px noise the 12-point normal-equation solve is closer to
        the true F than the minimal 8-point solve, on average over
        samples (Sampson RMS on a clean held-out set)."""
        x1, x2, F_true = make_two_view(rng, n=200, noise=0.5)
        errs8, errs12 = [], []
        for t in range(24):
            sel = rng.choice(200, 12, replace=False)
            F12 = np.asarray(fmodel.fundamental_npt_minimal(
                jnp.asarray(x1[sel]), jnp.asarray(x2[sel])))
            F8 = np.asarray(fmodel.fundamental_8pt_minimal(
                jnp.asarray(x1[sel[:8]]), jnp.asarray(x2[sel[:8]])))
            # score on all 200 points against the true-F geometry
            errs12.append(np.sqrt(np_sampson(F12, x1, x2).mean()))
            errs8.append(np.sqrt(np_sampson(F8, x1, x2).mean()))
        assert np.median(errs12) < np.median(errs8), (
            np.median(errs12), np.median(errs8))
