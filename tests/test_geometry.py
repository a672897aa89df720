"""Geometry kernels vs independent oracles (SURVEY.md §4: DLT vs
cv2.findHomography / numpy SVD, residuals vs plain NumPy)."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multih_tpu.ops import geometry


def random_h(rng, scale=640.0):
    H = np.eye(3) + rng.normal(0, 0.1, (3, 3))
    H[2, :2] = rng.normal(0, 0.2 / scale, 2)
    H[0, 2] = rng.normal(0, 30)
    H[1, 2] = rng.normal(0, 30)
    return H / np.linalg.norm(H)


def transfer_pts(H, x):
    xh = np.concatenate([x, np.ones((x.shape[0], 1))], 1)
    y = xh @ H.T
    return y[:, :2] / y[:, 2:3]


def normalize_sign(H):
    H = H / np.linalg.norm(H)
    return H * np.sign(H[2, 2]) if H[2, 2] != 0 else H


class TestDLT:
    def test_minimal_4pt_exact(self, rng):
        """Noise-free 4-point solve reproduces the generating map to
        sub-pixel transfer accuracy over the whole image (the functional
        contract; raw fp32 matrix entries can differ at ~1e-3 due to
        normal-equation conditioning, which is irrelevant downstream)."""
        probe = rng.uniform(0, 640, (200, 2)).astype(np.float32)
        for i in range(20):
            H_true = random_h(rng)
            x1 = rng.uniform(50, 590, (4, 2)).astype(np.float32)
            x2 = transfer_pts(H_true, x1).astype(np.float32)
            H = np.asarray(
                geometry.homography_4pt_jit(jnp.asarray(x1), jnp.asarray(x2))
            )
            err = np.linalg.norm(
                transfer_pts(H, probe) - transfer_pts(H_true, probe), axis=1
            )
            assert np.max(err) < 0.25, (i, np.max(err))

    def test_minimal_matches_opencv(self, rng):
        """Same functional check against cv2.findHomography (double
        precision oracle) on noisy minimal samples."""
        probe = rng.uniform(0, 640, (200, 2)).astype(np.float32)
        for _ in range(10):
            x1 = rng.uniform(50, 590, (4, 2)).astype(np.float32)
            H_true = random_h(rng)
            x2 = (transfer_pts(H_true, x1) + rng.normal(0, 0.5, (4, 2))
                  ).astype(np.float32)
            H_cv = cv2.findHomography(x1, x2, 0)[0]
            H = np.asarray(
                geometry.homography_4pt_jit(jnp.asarray(x1), jnp.asarray(x2))
            )
            err = np.linalg.norm(
                transfer_pts(H, probe) - transfer_pts(H_cv, probe), axis=1
            )
            assert np.max(err) < 0.5, np.max(err)

    def test_weighted_refit_ignores_outliers(self, rng):
        """Weighted DLT with outlier weights=0 equals clean LSQ fit."""
        H_true = random_h(rng)
        x1_in = rng.uniform(0, 640, (60, 2))
        x2_in = transfer_pts(H_true, x1_in) + rng.normal(0, 0.3, (60, 2))
        x1_out = rng.uniform(0, 640, (40, 2))
        x2_out = rng.uniform(0, 640, (40, 2))
        x1 = np.concatenate([x1_in, x1_out]).astype(np.float32)
        x2 = np.concatenate([x2_in, x2_out]).astype(np.float32)
        w = np.concatenate([np.ones(60), np.zeros(40)]).astype(np.float32)
        H = np.asarray(
            geometry.homography_from_points_jit(
                jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w)
            )
        )
        err = np.linalg.norm(
            transfer_pts(H, x1_in.astype(np.float32)) - x2_in, axis=1
        )
        assert np.median(err) < 1.0

    def test_batched_solver(self, rng):
        """vmapped minimal solve: all S systems correct in one call."""
        S = 64
        H_true = np.stack([random_h(rng) for _ in range(S)])
        x1 = rng.uniform(0, 640, (S, 4, 2)).astype(np.float32)
        x2 = np.stack(
            [transfer_pts(H_true[s], x1[s]) for s in range(S)]
        ).astype(np.float32)
        Hs = np.asarray(
            geometry.homography_4pt_batch_jit(
                jnp.asarray(x1), jnp.asarray(x2)
            )
        )
        for s in range(S):
            assert np.allclose(
                normalize_sign(Hs[s]), normalize_sign(H_true[s]), atol=1e-3
            )

    def test_eigh_and_inverse_iteration_agree(self, rng):
        x1 = rng.uniform(0, 640, (4, 2)).astype(np.float32)
        H_true = random_h(rng)
        x2 = (transfer_pts(H_true, x1) + rng.normal(0, 1.0, (4, 2))
              ).astype(np.float32)
        Ha = np.asarray(geometry.homography_from_points_jit(
            jnp.asarray(x1), jnp.asarray(x2), None, "eigh"))
        Hb = np.asarray(geometry.homography_from_points_jit(
            jnp.asarray(x1), jnp.asarray(x2), None, "inverse_iteration"))
        assert np.allclose(normalize_sign(Ha), normalize_sign(Hb), atol=1e-3)


class TestResiduals:
    def _setup(self, rng, n=50):
        H = random_h(rng)
        x1 = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        x2 = (transfer_pts(H, x1) + rng.normal(0, 2.0, (n, 2))).astype(
            np.float32
        )
        return H.astype(np.float32), x1, x2

    def test_transfer_vs_numpy(self, rng):
        H, x1, x2 = self._setup(rng)
        r = np.asarray(geometry.transfer_error_sq(
            jnp.asarray(H), jnp.asarray(x1), jnp.asarray(x2)))
        ref = np.sum((transfer_pts(H, x1) - x2) ** 2, axis=1)
        np.testing.assert_allclose(r, ref, rtol=1e-3, atol=1e-4)

    def test_symmetric_vs_numpy(self, rng):
        H, x1, x2 = self._setup(rng)
        r = np.asarray(geometry.symmetric_transfer_error_sq(
            jnp.asarray(H), jnp.asarray(x1), jnp.asarray(x2)))
        Hinv = np.linalg.inv(H)
        ref = (np.sum((transfer_pts(H, x1) - x2) ** 2, 1)
               + np.sum((transfer_pts(Hinv, x2) - x1) ** 2, 1))
        np.testing.assert_allclose(r, ref, rtol=1e-2, atol=1e-3)

    def test_sampson_small_on_inliers_large_on_outliers(self, rng):
        H = random_h(rng).astype(np.float32)
        x1 = rng.uniform(0, 640, (100, 2)).astype(np.float32)
        x2 = transfer_pts(H, x1).astype(np.float32)
        x2[50:] = rng.uniform(0, 640, (50, 2))
        r = np.asarray(geometry.sampson_error_sq_h(
            jnp.asarray(H), jnp.asarray(x1), jnp.asarray(x2)))
        assert np.max(r[:50]) < 1e-2
        assert np.median(r[50:]) > 10.0

    def test_residual_matrix_batch(self, rng):
        S, N = 16, 40
        Hs = np.stack([random_h(rng) for _ in range(S)]).astype(np.float32)
        x1 = rng.uniform(0, 640, (N, 2)).astype(np.float32)
        x2 = rng.uniform(0, 640, (N, 2)).astype(np.float32)
        R = np.asarray(geometry.residual_matrix(
            jnp.asarray(Hs), jnp.asarray(x1), jnp.asarray(x2), "symmetric"))
        assert R.shape == (S, N)
        for s in [0, S // 2, S - 1]:
            row = np.asarray(geometry.symmetric_transfer_error_sq(
                jnp.asarray(Hs[s]), jnp.asarray(x1), jnp.asarray(x2)))
            np.testing.assert_allclose(R[s], row, rtol=1e-4)

    def test_residual_matrix_chunked_matches_dense(self, rng):
        S, N = 37, 25  # deliberately non-multiple of chunk
        Hs = np.stack([random_h(rng) for _ in range(S)]).astype(np.float32)
        x1 = rng.uniform(0, 640, (N, 2)).astype(np.float32)
        x2 = rng.uniform(0, 640, (N, 2)).astype(np.float32)
        dense = np.asarray(geometry.residual_matrix(
            jnp.asarray(Hs), jnp.asarray(x1), jnp.asarray(x2)))
        chunked = np.asarray(geometry.residual_matrix_chunked(
            jnp.asarray(Hs), jnp.asarray(x1), jnp.asarray(x2), chunk=8))
        np.testing.assert_allclose(dense, chunked, rtol=1e-5)


class TestHelpers:
    def test_adjugate_is_scaled_inverse(self, rng):
        m = rng.normal(0, 1, (5, 3, 3)).astype(np.float32)
        adj = np.asarray(geometry.adjugate_3x3(jnp.asarray(m)))
        for i in range(5):
            det = np.linalg.det(m[i])
            np.testing.assert_allclose(
                adj[i] @ m[i], det * np.eye(3), rtol=1e-3, atol=1e-3
            )

    def test_quad_degenerate(self):
        collinear = jnp.asarray(
            [[0.0, 0.0], [1.0, 1.0], [2.0, 2.0], [5.0, 1.0]]
        )
        good = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]])
        assert bool(geometry.quad_degenerate(collinear))
        assert not bool(geometry.quad_degenerate(good))

    def test_hartley_normalization(self, rng):
        pts = rng.uniform(100, 500, (80, 2)).astype(np.float32)
        pn, T = geometry.hartley_normalize(jnp.asarray(pts))
        pn = np.asarray(pn)
        assert np.allclose(pn.mean(0), 0, atol=1e-4)
        rms = np.sqrt((pn**2).sum(1).mean())
        assert abs(rms - np.sqrt(2)) < 1e-3
        # T actually performs the mapping
        ph = np.concatenate([pts, np.ones((80, 1))], 1)
        mapped = ph @ np.asarray(T).T
        np.testing.assert_allclose(mapped[:, :2], pn, atol=1e-3)


class TestMomentRefit:
    """The 30-moment batched refit (geometry.homography_refit_batch) must
    reproduce the vmapped homography_from_points reference: same weighted
    Hartley normalization, same A^T W A, up to fp32 summation order."""

    def test_matches_vmapped_reference(self, rng):
        import jax

        n, c = 1024, 12
        x1 = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        H_true = np.eye(3) + rng.normal(0, 0.05, (3, 3))
        H_true[2, :2] = rng.normal(0, 1e-4, 2)
        ph = np.concatenate([x1, np.ones((n, 1))], axis=1)
        proj = ph @ H_true.T
        x2 = (proj[:, :2] / proj[:, 2:3]
              + rng.normal(0, 0.5, (n, 2))).astype(np.float32)
        w = ((rng.uniform(size=(c, n)) > 0.6)
             * rng.uniform(0.1, 1.0, (c, n))).astype(np.float32)
        j1, j2, jw = map(jnp.asarray, (x1, x2, w))
        ref = np.asarray(jax.vmap(
            lambda wl: geometry.homography_from_points(
                j1, j2, wl, "jacobi", 8)
        )(jw))
        basis = geometry.prepare_refit(j1, j2)
        got = np.asarray(
            geometry.homography_refit_batch(jw, basis, "jacobi", 8)
        )
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_zero_and_tiny_weights_finite(self, rng):
        """Candidates with no (or <4) supporting points must stay finite —
        callers gate on support, but NaNs would poison jnp.where."""
        n = 256
        x1 = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        x2 = rng.uniform(0, 640, (n, 2)).astype(np.float32)
        w = np.zeros((3, n), np.float32)
        w[1, :2] = 1.0
        basis = geometry.prepare_refit(jnp.asarray(x1), jnp.asarray(x2))
        got = np.asarray(geometry.homography_refit_batch(
            jnp.asarray(w), basis, "jacobi", 8
        ))
        assert np.isfinite(got).all()
