"""Epipolar module vs oracles: two-view synthetic geometry, OpenCV
findFundamentalMat, numerical Jacobians for the one-point method."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from multih_tpu.ops import epipolar, geometry


def two_view_scene(rng, n=100, noise=0.0):
    """Random 3D points seen by two cameras; returns x1, x2, F_true."""
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], (n, 3))
    K = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1.0]])
    R = cv2.Rodrigues(rng.normal(0, 0.1, 3))[0]
    t = rng.normal(0, 1, 3)
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t[:, None]])

    def proj(P, X):
        y = (np.hstack([X, np.ones((n, 1))]) @ P.T)
        return y[:, :2] / y[:, 2:]

    x1 = proj(P1, pts) + rng.normal(0, noise, (n, 2))
    x2 = proj(P2, pts) + rng.normal(0, noise, (n, 2))
    # F from camera matrices: F = [e2]x P2 P1^+
    e2 = P2 @ np.array([0, 0, 0, 1.0])
    ex = np.array([[0, -e2[2], e2[1]], [e2[2], 0, -e2[0]],
                   [-e2[1], e2[0], 0]])
    F = ex @ P2 @ np.linalg.pinv(P1)
    return (x1.astype(np.float32), x2.astype(np.float32),
            F / np.linalg.norm(F))


class TestFundamental:
    def test_8pt_exact(self, rng):
        x1, x2, F_true = two_view_scene(rng, 60)
        F = np.asarray(epipolar.fundamental_8pt(
            jnp.asarray(x1), jnp.asarray(x2)))
        err = np.asarray(epipolar.sampson_error_f(
            jnp.asarray(F), jnp.asarray(x1), jnp.asarray(x2)))
        assert np.max(err) < 1e-2, np.max(err)

    def test_matches_opencv(self, rng):
        x1, x2, _ = two_view_scene(rng, 60, noise=0.3)
        F_cv = cv2.findFundamentalMat(x1, x2, cv2.FM_8POINT)[0]
        F = np.asarray(epipolar.fundamental_8pt(
            jnp.asarray(x1), jnp.asarray(x2)))
        e_cv = np.asarray(epipolar.sampson_error_f(
            jnp.asarray(F_cv.astype(np.float32)), jnp.asarray(x1),
            jnp.asarray(x2)))
        e_us = np.asarray(epipolar.sampson_error_f(
            jnp.asarray(F), jnp.asarray(x1), jnp.asarray(x2)))
        # comparable quality (both 8-point LSQ)
        assert np.median(e_us) < np.median(e_cv) * 2.0 + 1e-3

    def test_ransac_with_outliers(self, rng):
        x1, x2, _ = two_view_scene(rng, 150, noise=0.3)
        x2_bad = x2.copy()
        x2_bad[100:] = rng.uniform(0, 640, (50, 2))
        F = epipolar.estimate_fundamental(
            jax.random.key(0), jnp.asarray(x1), jnp.asarray(x2_bad),
            jnp.ones(150), n_samples=256, threshold=1.5,
        )
        err = np.asarray(epipolar.sampson_error_f(
            F, jnp.asarray(x1), jnp.asarray(x2)))
        assert np.median(err[:100]) < 1.0

    def test_epipole(self, rng):
        """epipole() expects normalized-coordinate F (see its docstring):
        pixel-scale F is near rank-1 and has no fp32-resolvable null
        direction."""
        _, _, F_pix = two_view_scene(rng, 30)
        s = 600.0
        S = np.diag([s, s, 1.0])
        F = S.T @ F_pix @ S
        F /= np.linalg.norm(F)
        e2 = np.asarray(epipolar.epipole(
            jnp.asarray(F.astype(np.float32)), "right"))
        assert np.linalg.norm(F.T @ e2) < 1e-5
        e1 = np.asarray(epipolar.epipole(
            jnp.asarray(F.astype(np.float32)), "left"))
        assert np.linalg.norm(F @ e1) < 1e-5


def numeric_jacobian(H, p, eps=0.25):
    def f(q):
        y = H @ np.array([q[0], q[1], 1.0])
        return y[:2] / y[2]

    J = np.zeros((2, 2))
    for j in range(2):
        d = np.zeros(2)
        d[j] = eps
        J[:, j] = (f(p + d) - f(p - d)) / (2 * eps)
    return J


class TestOnePointHomography:
    def test_recovers_true_h(self, rng):
        """Plane scene: H consistent with F = [e']x H; the one-point method
        must reproduce H from any single (point, affine) observation."""
        for trial in range(5):
            H = np.eye(3) + rng.normal(0, 0.08, (3, 3))
            H[2, :2] = rng.normal(0, 1e-4, 2)
            H /= np.linalg.norm(H)
            e2 = rng.normal(0, 1, 3)
            e2 /= np.linalg.norm(e2)
            ex = np.array([[0, -e2[2], e2[1]], [e2[2], 0, -e2[0]],
                           [-e2[1], e2[0], 0]])
            F = ex @ H
            F /= np.linalg.norm(F)

            p1 = rng.uniform(100, 500, 2)
            y = H @ np.array([p1[0], p1[1], 1.0])
            p2 = y[:2] / y[2]
            A = numeric_jacobian(H, p1)

            H_rec = np.asarray(epipolar.homography_one_point(
                jnp.asarray(F.astype(np.float32)),
                jnp.asarray(p1.astype(np.float32)),
                jnp.asarray(p2.astype(np.float32)),
                jnp.asarray(A.astype(np.float32)),
            ))
            Ht = H / np.linalg.norm(H) * np.sign(H[2, 2])
            assert np.allclose(H_rec, Ht, atol=5e-3), (trial, H_rec, Ht)

    def test_batched(self, rng):
        H = np.eye(3) + rng.normal(0, 0.05, (3, 3))
        H /= np.linalg.norm(H)
        e2 = np.array([1.0, 0.5, 0.3])
        ex = np.array([[0, -e2[2], e2[1]], [e2[2], 0, -e2[0]],
                       [-e2[1], e2[0], 0]])
        F = (ex @ H).astype(np.float32)
        F /= np.linalg.norm(F)
        n = 16
        p1 = rng.uniform(100, 500, (n, 2))
        p1h = np.hstack([p1, np.ones((n, 1))])
        y = p1h @ H.T
        p2 = y[:, :2] / y[:, 2:]
        A = np.stack([numeric_jacobian(H, p) for p in p1])
        Hs = np.asarray(epipolar.homography_one_point_batch(
            jnp.asarray(F), jnp.asarray(p1.astype(np.float32)),
            jnp.asarray(p2.astype(np.float32)),
            jnp.asarray(A.astype(np.float32)),
        ))
        Ht = H / np.linalg.norm(H) * np.sign(H[2, 2])
        for i in range(n):
            assert np.allclose(Hs[i], Ht, atol=5e-3), i
