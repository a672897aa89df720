"""Pallas kernels vs the jnp reference implementations (SURVEY.md §7 stage
7: 'keep the jnp paths as reference implementations and for CPU tests').
Runs in interpreter mode on CPU; the same kernels compile for TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multih_tpu.ops import geometry
from multih_tpu.ops.kernels import residual_kernel


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
