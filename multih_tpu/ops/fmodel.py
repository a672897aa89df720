"""Fundamental-matrix model ops for multi-model PEARL fitting.

The reference (danini/multi-h) fits multiple HOMOGRAPHIES; this module is
the above-parity extension that lets the same pipeline segment multiple
RIGID MOTIONS — the other half of the AdelaideRMF benchmark (motion
segmentation) — by swapping the geometric model class under the unchanged
PEARL machinery (SURVEY.md §2 C9-C12 are model-agnostic given a (K, N)
residual matrix). Selected by ``MultiHConfig(model="fundamental")``.

Everything mirrors the homography stack one-to-one, batch-first:

- minimal solver: 8-point algorithm as unrolled Givens-QR nullspace
  (``geometry.nullspace_8x9_qr`` — the epipolar constraint also yields an
  8x9 system, one row per point instead of two rows per point), with a
  fixed generic column rotation so the QR's "last component nonzero"
  assumption holds for EVERY motion — pure lateral translation (the
  KITTI stereo case) gives F33 = 0 exactly, which would break the plain
  back substitution;
- residuals: Sampson / symmetric epipolar / one-sided epipolar distance,
  mapped onto the config's residual vocabulary (sampson / symmetric /
  transfer) so ranking tricks like ``rank_residual="transfer"`` keep
  their meaning (forward-only = half the work);
- refit: the same moment-factored one-matmul weighted batch refit as
  ``geometry.homography_refit_batch``. Epipolar rows factor as
  kron(x2h, x1h), so A^T W A = sum_n w_n (x2h x2h^T) (x) (x1h x1h^T) is a
  linear function of THIRTY-SIX shared joint moments
  {x2^2, x2y2, y2^2, x2, y2, 1} x {x1^2, x1y1, y1^2, x1, y1, 1}: the
  whole batched refit is one (C, N) x (N, 36) MXU matmul plus a
  per-candidate 9x9 assembly, with the weighted Hartley normalization
  recovered exactly from the same moments (a (T2 (x) T1) congruence);
- rank-2 enforcement: closed-form Eckart-Young step — F2 = F - (F v) v^T
  with v the smallest eigenvector of F^T F (3x3 fixed-sweep Jacobi) —
  branch-free and vmappable, no general SVD anywhere.

Planar degeneracy (all 8 sample points on one scene plane makes F
ambiguous) is handled the same way all minimal-sample pathologies are
handled here: the hypothesis simply ranks poorly on the full motion and
loses to better-spread samples; the claim/LO machinery refits winners on
their full Tukey-weighted support, which is well spread by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from multih_tpu.ops import geometry

_EPS = 1e-12
_HI = jax.lax.Precision.HIGHEST

# Fixed generic rotation mixing the 9 nullspace coordinates before the QR
# back substitution: nullspace_8x9_qr assumes the null vector's LAST
# component is nonzero (true for Hartley-normalized homographies, false
# for common fundamental matrices — axis-aligned translation has F33 = 0).
# Solving (rows @ Q0) and rotating back guarantees the assumption holds
# unless the null vector is orthogonal to one fixed generic direction,
# which no structured camera motion produces. Deterministic (fixed seed),
# orthonormal to fp64 then cast.
_Q0 = np.linalg.qr(
    np.random.default_rng(20260818).normal(size=(9, 9))
)[0].astype(np.float32)


# ---------------------------------------------------------------------------
# residuals (reference C6, fundamental-matrix variants)
# ---------------------------------------------------------------------------

def _epipolar_terms(Fs: jax.Array, x1: jax.Array, x2: jax.Array):
    """l = F x1h (epiline in image 2), m = F^T x2h (epiline in image 1),
    e = x2h . l (the epipolar constraint value).
    Fs: (..., 3, 3); x1, x2: (N, 2) -> ((..., N, 3), (..., N, 3), (..., N))
    """
    x1h = geometry.to_homogeneous(x1)
    x2h = geometry.to_homogeneous(x2)
    l = jnp.einsum("...ab,nb->...na", Fs, x1h, precision=_HI)
    m = jnp.einsum("...ba,nb->...na", Fs, x2h, precision=_HI)
    e = jnp.einsum("na,...na->...n", x2h, l, precision=_HI)
    return l, m, e


def transfer_error_sq_f(Fs: jax.Array, x1: jax.Array, x2: jax.Array):
    """One-sided squared epipolar distance: d(x2, F x1h)^2. The 'forward
    only, half the FLOPs' ranking residual of the F model (the analog of
    the homography transfer error for rank_residual)."""
    l, _, e = _epipolar_terms(Fs, x1, x2)
    return e * e / jnp.maximum(l[..., 0] ** 2 + l[..., 1] ** 2, _EPS)


def symmetric_epipolar_error_sq_f(Fs, x1, x2):
    """Symmetric squared epipolar distance:
    d(x2, F x1h)^2 + d(x1, F^T x2h)^2."""
    l, m, e = _epipolar_terms(Fs, x1, x2)
    e2 = e * e
    return (
        e2 / jnp.maximum(l[..., 0] ** 2 + l[..., 1] ** 2, _EPS)
        + e2 / jnp.maximum(m[..., 0] ** 2 + m[..., 1] ** 2, _EPS)
    )


def sampson_error_sq_f(Fs, x1, x2):
    """First-order (Sampson) squared error of the epipolar constraint —
    same algebra as epipolar.sampson_error_f, kept here as the model-ops
    entry point."""
    l, m, e = _epipolar_terms(Fs, x1, x2)
    den = l[..., 0] ** 2 + l[..., 1] ** 2 + m[..., 0] ** 2 + m[..., 1] ** 2
    return e * e / jnp.maximum(den, _EPS)


_RESIDUALS_F = {
    "transfer": transfer_error_sq_f,
    "symmetric": symmetric_epipolar_error_sq_f,
    "sampson": sampson_error_sq_f,
}


def residual_matrix_f(
    Fs: jax.Array, x1: jax.Array, x2: jax.Array, kind: str = "sampson"
) -> jax.Array:
    """(S, 3, 3) fundamental matrices x (N, 2) correspondences -> (S, N)
    squared residuals (px^2-comparable, like the homography residuals)."""
    return _RESIDUALS_F[kind](Fs, x1, x2)


# ---------------------------------------------------------------------------
# minimal solver (reference C5 analog: 8-point algorithm)
# ---------------------------------------------------------------------------

def _rank2_project(F: jax.Array) -> jax.Array:
    """Closest rank-2 matrix (Frobenius): F - (F v) v^T with v the
    smallest eigenvector of F^T F. Branch-free 3x3 fixed-sweep Jacobi —
    the Eckart-Young step without a general SVD."""
    ftf = jnp.matmul(F.T, F, precision=_HI)
    d, v3 = geometry.jacobi_eigh_small(ftf, sweeps=5)
    v = v3[:, jnp.argmin(d)]
    return F - jnp.outer(jnp.matmul(F, v, precision=_HI), v)


def _canonical_f(F: jax.Array) -> jax.Array:
    """Frobenius-normalize with a branch-free canonical sign (sign of the
    largest-|.|) entry — F33 may legitimately be 0, unlike h33)."""
    F = F / jnp.maximum(jnp.linalg.norm(F), _EPS)
    f = F.reshape(9)
    lead = f[jnp.argmax(jnp.abs(f))]
    return F * jnp.where(lead < 0, -1.0, 1.0)


def fundamental_8pt_minimal(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Minimal 8-point fundamental matrix via Givens-QR nullspace.
    p1, p2: (8, 2) -> (3, 3), ||F|| = 1, rank 2.

    Same fp32 rationale as geometry.homography_4pt: QR on the 8x9 row
    system keeps the error at kappa(A)*eps (the normal-matrix route
    squares it), and Hartley normalization is mandatory for conditioning.
    """
    q0 = jnp.asarray(_Q0, p1.dtype)
    x1n, T1 = geometry.hartley_normalize(p1)
    x2n, T2 = geometry.hartley_normalize(p2)
    x, y = x1n[:, 0], x1n[:, 1]
    u, v = x2n[:, 0], x2n[:, 1]
    one = jnp.ones_like(x)
    rows = jnp.stack(
        [u * x, u * y, u, v * x, v * y, v, x, y, one], axis=-1
    )  # (8, 9)
    fv = jnp.matmul(
        q0, geometry.nullspace_8x9_qr(jnp.matmul(rows, q0, precision=_HI)),
        precision=_HI,
    )
    Fn = _rank2_project(fv.reshape(3, 3))
    F = jnp.matmul(jnp.matmul(T2.T, Fn, precision=_HI), T1, precision=_HI)
    return _canonical_f(F)


# vmapped minimal solver: (S, 8, 2) x (S, 8, 2) -> (S, 3, 3)
fundamental_8pt_batch_qr = jax.vmap(fundamental_8pt_minimal)


def fundamental_npt_minimal(
    p1: jax.Array, p2: jax.Array,
    eig_iterations: int = 6, eig_method: str = "eigh",
) -> jax.Array:
    """Overdetermined small-sample fundamental solve: (m, 2) x (m, 2)
    with m > 8 -> (3, 3), ||F|| = 1, rank 2. Normal equations (9x9
    A^T A) + smallest-eigenvector — the same branch-free machinery the
    batched refit uses, at sample size. Exists because minimal 8-point
    samples are noise-dominated on compact 3D structures (see
    MultiHConfig.f_sample_points); Hartley normalization keeps the
    squared conditioning of A^T A harmless at m ~ 12 in fp32 (parity
    vs float64 tested)."""
    x1n, T1 = geometry.hartley_normalize(p1)
    x2n, T2 = geometry.hartley_normalize(p2)
    x, y = x1n[:, 0], x1n[:, 1]
    u, v = x2n[:, 0], x2n[:, 1]
    one = jnp.ones_like(x)
    rows = jnp.stack(
        [u * x, u * y, u, v * x, v * y, v, x, y, one], axis=-1
    )  # (m, 9)
    ata = jnp.matmul(rows.T, rows, precision=_HI)
    fv = geometry.smallest_eigvec_9x9(ata, eig_iterations, eig_method)
    Fn = _rank2_project(fv.reshape(3, 3))
    F = jnp.matmul(jnp.matmul(T2.T, Fn, precision=_HI), T1, precision=_HI)
    return _canonical_f(F)


# vmapped: (S, m, 2) x (S, m, 2) -> (S, 3, 3), m > 8 static
fundamental_npt_batch = jax.vmap(
    fundamental_npt_minimal, in_axes=(0, 0, None, None)
)


# ---------------------------------------------------------------------------
# moment-based batched weighted refit (reference C12 analog at scale)
# ---------------------------------------------------------------------------

class FRefitBasis(NamedTuple):
    """Shared per-point refit features (build once per (x1, x2) pair)."""

    feats: jax.Array  # (N, 36) joint moment features in the global frame
    T1g: jax.Array    # (3, 3) global similarity on x1 (raw -> global)
    T2g: jax.Array    # (3, 3) global similarity on x2


def _sym6(p: jax.Array) -> jax.Array:
    """(N, 2) -> (N, 6) unique entries of ph ph^T for ph = [x, y, 1]:
    [x^2, xy, y^2, x, y, 1]."""
    x, y = p[:, 0], p[:, 1]
    return jnp.stack(
        [x * x, x * y, y * y, x, y, jnp.ones_like(x)], axis=1
    )


# sym-pair index of (i, j) entries of ph ph^T in the _sym6 ordering
_SYM_IDX = np.array([[0, 1, 3], [1, 2, 4], [3, 4, 5]])


def prepare_refit_f(x1: jax.Array, x2: jax.Array) -> FRefitBasis:
    """(N, 2) x (N, 2) -> joint moment features for
    `fundamental_refit_batch`. Global (unweighted) similarity
    pre-normalization keeps all accumulated moments O(1) in fp32, exactly
    like geometry.prepare_refit."""
    def global_norm(p):
        mean = jnp.mean(p, axis=0)
        cen = p - mean
        rms = jnp.sqrt(jnp.maximum(jnp.mean(jnp.sum(cen**2, -1)), _EPS))
        s = jnp.sqrt(jnp.asarray(2.0, p.dtype)) / rms
        return cen * s, geometry._similarity(s, mean[0], mean[1], p.dtype)

    x1g, T1g = global_norm(x1)
    x2g, T2g = global_norm(x2)
    s1 = _sym6(x1g)  # (N, 6)
    s2 = _sym6(x2g)
    feats = (s2[:, :, None] * s1[:, None, :]).reshape(-1, 36)
    return FRefitBasis(feats, T1g, T2g)


def _moments_to_ata_f(mom: jax.Array):
    """One candidate's epipolar normal matrix from its (6, 6) joint moment
    table: the normalized (9, 9) A^T W A plus the weighted Hartley
    similarity parameters needed to denormalize the solution.

    ata[3i+k, 3j+l] = sum_n w (x2h_i x2h_j)(x1h_k x1h_l)
                    = mom[sym(i,j), sym(k,l)],
    then the per-candidate weighted Hartley normalization is applied as
    the congruence (T2 (x) T1) ata (T2 (x) T1)^T — normalized rows are
    kron(T2 x2h, T1 x1h) = (T2 (x) T1) kron(x2h, x1h)."""
    dtype = mom.dtype
    wsum = jnp.maximum(mom[5, 5], _EPS)
    c1x, c1y = mom[5, 3] / wsum, mom[5, 4] / wsum
    rms1 = jnp.sqrt(jnp.maximum(
        (mom[5, 0] + mom[5, 2]) / wsum - (c1x * c1x + c1y * c1y), _EPS
    ))
    s1 = jnp.sqrt(jnp.asarray(2.0, dtype)) / rms1
    c2x, c2y = mom[3, 5] / wsum, mom[4, 5] / wsum
    rms2 = jnp.sqrt(jnp.maximum(
        (mom[0, 5] + mom[2, 5]) / wsum - (c2x * c2x + c2y * c2y), _EPS
    ))
    s2 = jnp.sqrt(jnp.asarray(2.0, dtype)) / rms2

    idx = jnp.asarray(_SYM_IDX)
    # ata4[i, j, k, l] = mom[sym2(i, j), sym1(k, l)]
    ata4 = mom[idx[:, :, None, None], idx[None, None, :, :]]
    ata = ata4.transpose(0, 2, 1, 3).reshape(9, 9)  # [3i+k, 3j+l]
    T1 = geometry._similarity(s1, c1x, c1y, dtype)
    T2 = geometry._similarity(s2, c2x, c2y, dtype)
    K = jnp.kron(T2, T1)
    ata_n = jnp.matmul(jnp.matmul(K, ata, precision=_HI), K.T,
                       precision=_HI)
    return ata_n, (s1, c1x, c1y, s2, c2x, c2y)


def _f_from_nullvec(f, params, T1g, T2g):
    """Enforce rank 2 on one candidate's unit nullspace vector IN THE
    NORMALIZED FRAME (the textbook step, and what the minimal solvers
    above do), then denormalize through the per-candidate weighted
    Hartley similarities and the global pre-normalization.

    The frame matters enormously, not cosmetically: a raw
    pixel-coordinate F is scale-skewed (entries spanning ~6 orders), so
    the Frobenius-nearest rank-2 matrix in the raw frame — even
    max-abs-balanced, as this function did through round 4 — can be a
    GEOMETRICALLY different epipolar geometry. Measured on fm2_b motion
    1 (170 GT inliers, clean weights): raw-frame projection 6.85 px
    median Sampson vs 0.326 px normalized-frame (float64 design-SVD
    oracle: 0.326 px). That one bug capped every F refit the pipeline
    made — PEARL's acceptance test then silently kept the un-refit
    LO hypotheses instead, which is why the suite still worked at all
    (docs/PERF.md r5 'The raw-frame rank-2 bug')."""
    s1, c1x, c1y, s2, c2x, c2y = params
    dtype = f.dtype
    T1 = jnp.matmul(geometry._similarity(s1, c1x, c1y, dtype), T1g,
                    precision=_HI)
    T2 = jnp.matmul(geometry._similarity(s2, c2x, c2y, dtype), T2g,
                    precision=_HI)
    Fn = _rank2_project(f.reshape(3, 3))
    F = jnp.matmul(jnp.matmul(T2.T, Fn, precision=_HI), T1,
                   precision=_HI)
    return _canonical_f(F)


def fundamental_refit_batch(
    weights: jax.Array,
    basis: FRefitBasis,
    eig_method: str = "eigh",
    eig_iterations: int = 6,
    eig_pallas: bool = False,
) -> jax.Array:
    """Weighted 8-point refit of C candidates in one matmul:
    (C, N) weights -> (C, 3, 3) rank-2 fundamental matrices. Equals
    vmapped epipolar.fundamental_8pt(x1, x2, w) up to fp32 summation
    order and the rank-2 projection frame (parity-tested)."""
    mom = jnp.matmul(weights, basis.feats, precision=_HI)  # (C, 36)
    atas, params = jax.vmap(
        lambda mm: _moments_to_ata_f(mm.reshape(6, 6))
    )(mom)
    if eig_pallas:
        from multih_tpu.ops.kernels import eig_kernel

        fs = eig_kernel.smallest_eigvec_9x9_batch(atas)  # (C, 9)
    else:
        fs = jax.vmap(
            lambda a: geometry.smallest_eigvec_9x9(
                a, eig_iterations, eig_method
            )
        )(atas)
    return jax.vmap(
        lambda f, pr: _f_from_nullvec(f, pr, basis.T1g, basis.T2g)
    )(fs, params)
