"""Pallas kernels vs the jnp reference implementations (SURVEY.md §7 stage
7: 'keep the jnp paths as reference implementations and for CPU tests').
Runs in interpreter mode on CPU; the same kernels compile for TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multih_tpu.ops import fmodel, geometry
from multih_tpu.ops.kernels import dlt_kernel, residual_kernel


def random_hs(rng, s):
    H = np.eye(3)[None] + rng.normal(0, 0.1, (s, 3, 3))
    H[:, 2, :2] = rng.normal(0, 3e-4, (s, 2))
    H /= np.linalg.norm(H, axis=(1, 2), keepdims=True)
    return H.astype(np.float32)


class TestInlierCountKernel:
    def test_matches_jnp_reference(self, rng):
        s, n = 256, 2048
        Hs = jnp.asarray(random_hs(rng, s))
        x1 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        x2 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        valid = jnp.asarray(
            (rng.uniform(size=n) > 0.2).astype(np.float32)
        )
        thr = jnp.asarray(2500.0, jnp.float32)  # wide so counts are nonzero

        ref = jnp.sum(
            (geometry.residual_matrix(Hs, x1, x2, "symmetric") < thr)
            * valid[None, :],
            axis=1,
        )
        got = residual_kernel.inlier_counts_padded(
            Hs, x1, x2, valid, thr, interpret=True
        )
        # the kernel uses a fast reciprocal: points exactly on the
        # threshold boundary may flip; counts must agree within a couple
        # of boundary ties per hypothesis
        d = np.abs(np.asarray(got) - np.asarray(ref))
        assert d.max() <= 2.0, d.max()
        assert d.mean() < 0.5, d.mean()

    @pytest.mark.parametrize("kind", ["symmetric", "transfer", "sampson"])
    def test_mxu_numerators_match(self, rng, kind):
        """mxu=True computes the row numerators as (TH, 3) @ (3, TN) MXU
        contractions at HIGHEST precision; counts must stay within the
        same boundary-tie slack as the VPU form (every residual kind)."""
        s, n = 256, 2048
        Hs = jnp.asarray(random_hs(rng, s))
        x1 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        x2 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        valid = jnp.asarray(
            (rng.uniform(size=n) > 0.2).astype(np.float32)
        )
        thr = jnp.asarray(600.0 if kind == "sampson" else 2500.0,
                          jnp.float32)
        base = residual_kernel.inlier_counts_padded(
            Hs, x1, x2, valid, thr, interpret=True, kind=kind,
            approx_rcp=False,
        )
        got = residual_kernel.inlier_counts_padded(
            Hs, x1, x2, valid, thr, interpret=True, kind=kind,
            approx_rcp=False, mxu=True,
        )
        d = np.abs(np.asarray(got) - np.asarray(base))
        assert d.max() <= 2.0, d.max()
        assert d.mean() < 0.5, d.mean()

    @pytest.mark.parametrize("kind", ["symmetric", "transfer", "sampson"])
    def test_matches_jnp_reference_fundamental(self, rng, kind):
        """'f_*' kernel variants (multi-model extension) vs
        fmodel.residual_matrix_f(kind): the kernel's epipolar algebra on
        the same (TH, 9) hypothesis layout, exact division and the
        fast-reciprocal default both within boundary-tie slack."""
        s, n = 192, 1536
        # plausible pixel-coordinate fundamental matrices: generic rank-2
        # with the characteristic entry scaling (quadratic terms ~1e-6)
        F = rng.normal(0, 1.0, (s, 3, 3)).astype(np.float32)
        F[:, :2, :2] *= 1e-6
        F[:, 2, :2] *= 1e-3
        F[:, :2, 2] *= 1e-3
        F /= np.linalg.norm(F, axis=(1, 2), keepdims=True)
        Fs = jnp.asarray(F)
        x1 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        x2 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        valid = jnp.asarray(
            (rng.uniform(size=n) > 0.2).astype(np.float32)
        )
        thr = jnp.asarray(900.0, jnp.float32)
        ref = jnp.sum(
            (fmodel.residual_matrix_f(Fs, x1, x2, kind) < thr)
            * valid[None, :],
            axis=1,
        )
        for approx in (False, True):
            got = residual_kernel.inlier_counts_padded(
                Fs, x1, x2, valid, thr, hyp_tile=64, pt_tile=512,
                interpret=True, approx_rcp=approx, kind=f"f_{kind}",
            )
            d = np.abs(np.asarray(got) - np.asarray(ref))
            assert d.max() <= 2.0, (approx, d.max())
            assert d.mean() < 0.5, (approx, d.mean())

    @pytest.mark.parametrize("kind", ["transfer", "sampson"])
    def test_matches_jnp_reference_other_residuals(self, rng, kind):
        """'transfer' and 'sampson' kernel variants (VERDICT r2 item 8) vs
        geometry.residual_matrix(kind), exact division (approx_rcp off)
        and the fast-reciprocal default both within boundary-tie slack."""
        s, n = 192, 1536
        Hs = jnp.asarray(random_hs(rng, s))
        x1 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        x2 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        valid = jnp.asarray(
            (rng.uniform(size=n) > 0.2).astype(np.float32)
        )
        # sampson errors are ~4x smaller than symmetric on the same
        # geometry (first-order, one-sided): use a tighter threshold so
        # both kinds land at partial-inlier counts
        thr = jnp.asarray(400.0 if kind == "sampson" else 900.0,
                          jnp.float32)
        ref = jnp.sum(
            (geometry.residual_matrix(Hs, x1, x2, kind) < thr)
            * valid[None, :],
            axis=1,
        )
        for approx in (False, True):
            got = residual_kernel.inlier_counts_padded(
                Hs, x1, x2, valid, thr, hyp_tile=64, pt_tile=512,
                interpret=True, approx_rcp=approx, kind=kind,
            )
            d = np.abs(np.asarray(got) - np.asarray(ref))
            assert d.max() <= 2.0, (kind, approx, d.max())
            assert d.mean() < 0.5, (kind, approx, d.mean())
        # sanity: the three kinds measure different things — symmetric
        # must dominate forward-only transfer pointwise in counts
        got_sym = residual_kernel.inlier_counts_padded(
            Hs, x1, x2, valid, thr, hyp_tile=64, pt_tile=512,
            interpret=True, kind="symmetric",
        )
        if kind == "transfer":
            assert np.all(np.asarray(got_sym) <= np.asarray(ref) + 2)

    def test_padding_and_ragged_shapes(self, rng):
        s, n = 130, 1000  # not tile multiples
        Hs = jnp.asarray(random_hs(rng, s))
        x1 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        x2 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        valid = jnp.ones((n,), jnp.float32)
        thr = jnp.asarray(900.0, jnp.float32)
        ref = jnp.sum(
            (geometry.residual_matrix(Hs, x1, x2, "symmetric") < thr),
            axis=1,
        ).astype(jnp.float32)
        got = residual_kernel.inlier_counts_padded(
            Hs, x1, x2, valid, thr, hyp_tile=64, pt_tile=512,
            interpret=True,
        )
        assert got.shape == (s,)
        d = np.abs(np.asarray(got) - np.asarray(ref))
        assert d.max() <= 2.0, d.max()

    def test_valid_mask_respected(self, rng):
        s, n = 64, 512
        Hs = jnp.asarray(random_hs(rng, s))
        x1 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        x2 = x1  # identity-ish: huge counts under wide threshold
        valid = jnp.zeros((n,), jnp.float32)
        got = residual_kernel.inlier_counts_padded(
            Hs, x1, x2, valid, jnp.asarray(1e9, jnp.float32),
            hyp_tile=64, pt_tile=512, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), 0.0)

    def test_dlt_solve_parity(self, rng):
        """Pallas batched 4-pt DLT (SURVEY.md §7 stage 7b) vs the vmapped
        Givens-QR reference: same Hartley normalization, same rotation
        sequence — entries agree to fp32 rotation-order noise on every
        non-degenerate quad, including at a non-TILE-multiple batch."""
        s = dlt_kernel.TILE + 277  # exercises padding
        p1 = rng.uniform(0, 640, (s, 4, 2)).astype(np.float32)
        p2 = (p1 * 1.1 + rng.normal(0, 2.0, (s, 4, 2))).astype(np.float32)
        # a repeated-point degenerate quad: 2-D nullspace, both solvers
        # return an arbitrary (but finite) vector — excluded from parity,
        # exactly like the pipeline excludes it via quad_degenerate
        p1[5, 1] = p1[5, 0]
        p2[5, 1] = p2[5, 0]
        j1, j2 = jnp.asarray(p1), jnp.asarray(p2)
        ref = np.asarray(geometry.homography_4pt_batch_qr(j1, j2))
        got = np.asarray(
            dlt_kernel.homography_4pt_pallas(j1, j2, interpret=True)
        )
        assert got.shape == (s, 3, 3)
        assert np.isfinite(got).all()
        degen = np.asarray(
            geometry.quad_degenerate_batch(j1, 1e-4)
            | geometry.quad_degenerate_batch(j2, 1e-4)
        )
        err = np.abs(ref - got).max(axis=(1, 2))
        assert err[~degen].max() < 5e-4, err[~degen].max()

    def test_dlt_solve_maps_sample_points(self, rng):
        """Kernel homographies actually map their own minimal samples
        (residual < 1e-2 px on noise-free quads)."""
        s = 64
        p1 = rng.uniform(0, 640, (s, 4, 2)).astype(np.float32)
        H_true = np.asarray(random_hs(rng, s), np.float64)
        ph = np.concatenate([p1, np.ones((s, 4, 1), np.float32)], axis=2)
        proj = np.einsum("sab,spb->spa", H_true, ph)
        p2 = (proj[..., :2] / proj[..., 2:3]).astype(np.float32)
        got = np.asarray(dlt_kernel.homography_4pt_pallas(
            jnp.asarray(p1), jnp.asarray(p2), interpret=True
        ), np.float64)
        proj2 = np.einsum("sab,spb->spa", got, ph)
        back = proj2[..., :2] / proj2[..., 2:3]
        assert np.abs(back - p2).max() < 1e-2

    def test_eig_kernel_parity(self, rng):
        """Batch-on-lanes Jacobi eig (trig-free rotations) vs the
        arctan2-based per-candidate reference. The unrolled kernel is too
        large for interpret mode at full sweeps, so the identical shared
        computation (`jacobi_smallest_column`) is verified through XLA,
        plus a 1-sweep interpret smoke proving kernel==shared-math."""
        from multih_tpu.ops.kernels import eig_kernel

        c = 96
        atas = []
        for _ in range(c):
            x1 = rng.uniform(-1, 1, (12, 2)).astype(np.float32)
            H = np.eye(3) + rng.normal(0, 0.1, (3, 3))
            ph = np.concatenate([x1, np.ones((12, 1))], 1)
            pr = ph @ H.T
            x2 = (pr[:, :2] / pr[:, 2:3]
                  + rng.normal(0, 0.01, (12, 2))).astype(np.float32)
            atas.append(np.asarray(geometry.dlt_normal_matrix(
                jnp.asarray(x1), jnp.asarray(x2))))
        ja = jnp.asarray(np.stack(atas))
        ref = np.asarray(jax.vmap(
            lambda a: geometry.smallest_eigvec_9x9(a, 8, "jacobi")
        )(ja))
        got = np.asarray(eig_kernel.smallest_eigvec_9x9_batch_jnp(ja, 6))
        sign = np.sign(np.sum(ref * got, axis=1, keepdims=True))
        assert np.abs(ref - got * sign).max() < 5e-3
        # interpret smoke (one tile, one sweep): kernel == shared math
        gi = np.asarray(eig_kernel.smallest_eigvec_9x9_batch(
            ja[:4], sweeps=1, interpret=True))
        gj = np.asarray(eig_kernel.smallest_eigvec_9x9_batch_jnp(
            ja[:4], sweeps=1))
        sign = np.sign(np.sum(gi * gj, axis=1, keepdims=True))
        np.testing.assert_allclose(gi, gj * sign, atol=1e-5)

    def test_exact_reciprocal_bit_parity(self, rng):
        """approx_rcp=False restores full-precision division: counts match
        the jnp reference exactly (no boundary-tie tolerance)."""
        s, n = 128, 1024
        Hs = jnp.asarray(random_hs(rng, s))
        x1 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        x2 = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        valid = jnp.asarray((rng.uniform(size=n) > 0.2).astype(np.float32))
        thr = jnp.asarray(2500.0, jnp.float32)
        ref = jnp.sum(
            (geometry.residual_matrix(Hs, x1, x2, "symmetric") < thr)
            * valid[None, :],
            axis=1,
        )
        got = residual_kernel.inlier_counts_padded(
            Hs, x1, x2, valid, thr, interpret=True, approx_rcp=False
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
