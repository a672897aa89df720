"""Homography geometry kernels: normalization, DLT solves, residuals.

TPU-native replacement for the reference's per-point C++/OpenCV geometry
(SURVEY.md §2 rows C4–C6, C12; reference mount empty this session, see
SURVEY.md §0 — parity is against BASELINE.json:5 and the Multi-H BMVC 2016
paper). Where the reference calls ``cv::findHomography`` / ``cv::solve`` one
sample at a time, everything here is written point-free and batch-first so a
single ``vmap`` turns it into one XLA program over thousands of systems:

- DLT nullspace is solved from the 9x9 normal matrix A^T A (never the 8x9 or
  2Nx9 row matrix), so the per-system work is a fixed-shape reduction plus a
  tiny eigenproblem — MXU/VPU friendly, no dynamic shapes.
- The smallest eigenvector comes from shifted inverse iteration with an
  unrolled 9x9 Cholesky solve (branch-free, fixed trip count) by default;
  ``jnp.linalg.eigh`` is the reference fallback.
- Residuals are evaluated as hypotheses x correspondences tensor contractions
  (einsum) rather than loops — the "single residual matmul" of
  BASELINE.json:5.

All math is float32; Hartley normalization is mandatory for conditioning.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-12
# TPU matmuls default to bf16 operand precision; geometry dies at bf16
# (normal matrices, similarity transforms). Every contraction in this
# package pins full fp32.
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# homogeneous helpers
# ---------------------------------------------------------------------------

def to_homogeneous(x: jax.Array) -> jax.Array:
    """(..., 2) -> (..., 3) with unit w."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def from_homogeneous(xh: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 2), guarding w ~ 0 (points at infinity map far away
    instead of to NaN so downstream thresholds treat them as outliers)."""
    w = xh[..., 2:]
    w_safe = jnp.where(jnp.abs(w) < _EPS, jnp.where(w < 0, -_EPS, _EPS), w)
    return xh[..., :2] / w_safe


def adjugate_3x3(m: jax.Array) -> jax.Array:
    """Closed-form adjugate of a 3x3 (batched). adj(H) ∝ H^-1 — scale-free
    inverse, exactly what homography back-transfer needs (no division)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    adj = jnp.stack(
        [
            e * i - f * h, c * h - b * i, b * f - c * e,
            f * g - d * i, a * i - c * g, c * d - a * f,
            d * h - e * g, b * g - a * h, a * e - b * d,
        ],
        axis=-1,
    )
    return adj.reshape(*m.shape[:-2], 3, 3)


# ---------------------------------------------------------------------------
# Hartley normalization (reference: inside cv::findHomography; C5/C12)
# ---------------------------------------------------------------------------

def hartley_normalize(pts: jax.Array, weights: jax.Array | None = None):
    """Similarity transform T s.t. weighted centroid -> 0, RMS radius -> √2.

    Args:
      pts: (N, 2) points.
      weights: optional (N,) nonnegative weights (inlier/valid mask).

    Returns:
      (pts_n, T): normalized points (N, 2) and the 3x3 transform with
      pts_n_h = T @ pts_h.
    """
    n = pts.shape[0]
    if weights is None:
        weights = jnp.ones((n,), pts.dtype)
    wsum = jnp.maximum(jnp.sum(weights), _EPS)
    mean = jnp.sum(pts * weights[:, None], axis=0) / wsum
    centered = pts - mean
    rms = jnp.sqrt(
        jnp.maximum(jnp.sum(jnp.sum(centered**2, -1) * weights) / wsum, _EPS)
    )
    s = jnp.sqrt(jnp.asarray(2.0, pts.dtype)) / rms
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], pts.dtype
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return centered * s, T


# ---------------------------------------------------------------------------
# DLT rows and normal matrix
# ---------------------------------------------------------------------------

def dlt_rows(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Two DLT constraint rows per correspondence.

    For H x1 ~ x2 with x2 = (u, v):
      row_x = [ 0 0 0  -x -y -1   v·x  v·y  v ]
      row_y = [ x y 1   0  0  0  -u·x -u·y -u ]

    Args:
      x1, x2: (N, 2).
    Returns:
      (N, 2, 9) rows.
    """
    x, y = x1[..., 0], x1[..., 1]
    u, v = x2[..., 0], x2[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    row_x = jnp.stack(
        [zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1
    )
    row_y = jnp.stack(
        [x, y, one, zero, zero, zero, -u * x, -u * y, -u], axis=-1
    )
    return jnp.stack([row_x, row_y], axis=-2)


def dlt_normal_matrix(
    x1: jax.Array, x2: jax.Array, weights: jax.Array | None = None
) -> jax.Array:
    """A^T A (9x9) of the weighted DLT system — the only data-size-dependent
    reduction in the solve; everything after is fixed 9x9 work."""
    rows = dlt_rows(x1, x2)  # (N, 2, 9)
    if weights is not None:
        # sqrt-free A^T W A: weight one factor only.
        return jnp.einsum(
            "nki,nkj->ij", rows * weights[..., None, None], rows,
            precision=_HI,
        )
    return jnp.einsum("nki,nkj->ij", rows, rows, precision=_HI)


# ---------------------------------------------------------------------------
# smallest eigenvector of a 9x9 SPD matrix
# ---------------------------------------------------------------------------

def _cholesky_solve_9(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) x = b for fixed size 9 via unrolled substitution."""
    n = 9
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        acc = b[i]
        for j in range(i):
            acc = acc - L[i, j] * y[j]
        y[i] = acc / L[i, i]
    # backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for j in range(i + 1, n):
            acc = acc - L[j, i] * x[j]
        x[i] = acc / L[i, i]
    return jnp.stack(x)


def jacobi_eigh_small(a: jax.Array, sweeps: int = 6):
    """Cyclic Jacobi eigendecomposition of a small symmetric matrix.

    Fully unrolled (fixed n, fixed sweep count), branch-free: every rotation
    is computed with arctan2 and applied unconditionally, so under vmap the
    whole batch runs in lockstep on the VPU — the TPU-native stand-in for
    LAPACK that the build plan calls for (SURVEY.md §7 "hard parts":
    "A^T A (9x9) + cyclic Jacobi eigensolver (fixed sweeps, branch-free)").
    Unlike fp32 Cholesky-based inverse iteration it keeps full relative
    accuracy when the two smallest eigenvalues are clustered (near-degenerate
    minimal samples).

    Returns (eigenvalues_diag (n,), V (n, n)) with a ≈ V diag V^T; columns of
    V are eigenvectors (unsorted — use argmin/argmax of the diagonal).
    """
    n = a.shape[-1]
    v = jnp.eye(n, dtype=a.dtype)

    def rotate(state, pq):
        a, v = state
        p, q = pq
        app, aqq, apq = a[p, p], a[q, q], a[p, q]
        # rotation angle zeroing a[p,q]; arctan2 is total => branch-free
        theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
        c, s = jnp.cos(theta), jnp.sin(theta)
        # G^T A G on rows/cols p, q
        row_p = c * a[p, :] - s * a[q, :]
        row_q = s * a[p, :] + c * a[q, :]
        a = a.at[p, :].set(row_p).at[q, :].set(row_q)
        col_p = c * a[:, p] - s * a[:, q]
        col_q = s * a[:, p] + c * a[:, q]
        a = a.at[:, p].set(col_p).at[:, q].set(col_q)
        # V G
        vp = c * v[:, p] - s * v[:, q]
        vq = s * v[:, p] + c * v[:, q]
        v = v.at[:, p].set(vp).at[:, q].set(vq)
        return (a, v)

    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                a, v = rotate((a, v), (p, q))
    return jnp.diagonal(a), v


def smallest_eigvec_9x9(
    ata: jax.Array, iterations: int = 8, method: str = "jacobi"
) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of a 9x9 SPD matrix.

    Methods:
      - "jacobi" (default): fixed-sweep cyclic Jacobi (robust in fp32, the
        Pallas-kernel algorithm).
      - "inverse_iteration": shifted inverse iteration via unrolled 9x9
        Cholesky — fastest when the spectrum is well separated (large
        refits), inaccurate for near-degenerate minimal samples.
      - "eigh": jnp.linalg.eigh (LAPACK-style; oracle/fallback).
    """
    if method == "eigh":
        _, v = jnp.linalg.eigh(ata)
        return v[..., 0]

    if method == "jacobi":
        sweeps = max(1, min(iterations, 10))
        d, v = jacobi_eigh_small(ata, sweeps=sweeps)
        return v[:, jnp.argmin(d)]

    dtype = ata.dtype
    # shift: fraction of the mean diagonal large enough for fp32 Cholesky
    # to stay well conditioned; keeps A+shift SPD for exact nullspaces.
    shift = jnp.trace(ata) / 9.0 * jnp.asarray(1e-4, dtype) + jnp.asarray(
        1e-12, dtype
    )
    a = ata + shift * jnp.eye(9, dtype=dtype)
    L = jnp.linalg.cholesky(a)
    # deterministic start vector with overlap with any nullspace direction
    x = jnp.ones((9,), dtype) / 3.0

    def body(x, _):
        x = _cholesky_solve_9(L, x)
        x = x / jnp.maximum(jnp.linalg.norm(x), _EPS)
        return x, None

    x, _ = jax.lax.scan(body, x, None, length=iterations)
    return x


def nullspace_8x9_qr(rows: jax.Array) -> jax.Array:
    """Unit nullspace vector of an 8x9 system via unrolled Givens QR.

    Working on A directly (not A^T A) keeps the fp32 error at kappa(A)*eps
    instead of kappa(A)^2*eps — minimal-sample homographies are extrapolated
    across the whole image, so this factor decides sub-pixel vs multi-pixel
    hypothesis accuracy. 28 fixed Givens rotations + unrolled back
    substitution: branch-free, vmappable, and the blueprint for the Pallas
    DLT kernel (SURVEY.md §7 stage 7b).

    Assumes the nullspace vector has a nonzero last component (h33 != 0
    after Hartley normalization — true for any homography that keeps the
    sample centroid finite; violations produce a large-residual hypothesis
    that verification discards, they cannot crash).
    """
    r = rows
    for c in range(8):
        for k in range(c + 1, 8):
            a, b = r[c, c], r[k, c]
            d = jnp.sqrt(a * a + b * b)
            d_safe = jnp.maximum(d, _EPS)
            cs = jnp.where(d > _EPS, a / d_safe, 1.0)
            sn = jnp.where(d > _EPS, b / d_safe, 0.0)
            rc = cs * r[c, :] + sn * r[k, :]
            rk = -sn * r[c, :] + cs * r[k, :]
            r = r.at[c, :].set(rc).at[k, :].set(rk)
    # back substitution of R x = 0 with x[8] = 1
    x = [None] * 9
    x[8] = jnp.ones((), rows.dtype)
    for i in reversed(range(8)):
        acc = jnp.zeros((), rows.dtype)
        for j in range(i + 1, 9):
            acc = acc + r[i, j] * x[j]
        denom = r[i, i]
        denom = jnp.where(
            jnp.abs(denom) < _EPS,
            jnp.where(denom < 0, -_EPS, _EPS),
            denom,
        )
        x[i] = -acc / denom
    v = jnp.stack(x)
    return v / jnp.maximum(jnp.linalg.norm(v), _EPS)


# ---------------------------------------------------------------------------
# homography solves (reference C5 minimal / C12 non-minimal refit)
# ---------------------------------------------------------------------------

def homography_from_points(
    x1: jax.Array,
    x2: jax.Array,
    weights: jax.Array | None = None,
    eig_method: str = "inverse_iteration",
    eig_iterations: int = 8,
) -> jax.Array:
    """Weighted normalized DLT: H with x2 ~ H x1, ||H||_F = 1.

    With 4 points and unit weights this is the minimal solve the reference
    does per sample via cv::findHomography (C5); with inlier-mask weights it
    is the per-plane LO refit (C12). One code path serves both so the Pallas
    kernel only has to specialize the A^T A reduction.
    """
    x1n, T1 = hartley_normalize(x1, weights)
    x2n, T2 = hartley_normalize(x2, weights)
    ata = dlt_normal_matrix(x1n, x2n, weights)
    h = smallest_eigvec_9x9(ata, eig_iterations, eig_method)
    return _denormalize_h(h.reshape(3, 3), T1, T2)


def _denormalize_h(Hn: jax.Array, T1: jax.Array, T2: jax.Array) -> jax.Array:
    """x2 = T2^-1 Hn T1 x1; T2 is a similarity — closed-form inverse. Output
    is Frobenius-normalized with canonical (h33 >= 0) sign."""
    s = T2[0, 0]
    T2_inv = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], Hn.dtype
    )
    T2_inv = T2_inv.at[0, 0].set(1.0 / s).at[1, 1].set(1.0 / s)
    T2_inv = T2_inv.at[0, 2].set(-T2[0, 2] / s).at[1, 2].set(-T2[1, 2] / s)
    H = jnp.matmul(jnp.matmul(T2_inv, Hn, precision=_HI), T1,
                   precision=_HI)
    H = H / jnp.maximum(jnp.linalg.norm(H), _EPS)
    return H * jnp.where(H[2, 2] < 0, -1.0, 1.0)


def homography_4pt(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Minimal 4-point homography via Givens-QR nullspace (the accurate fp32
    path — see nullspace_8x9_qr). x1, x2: (4, 2)."""
    x1n, T1 = hartley_normalize(x1)
    x2n, T2 = hartley_normalize(x2)
    rows = dlt_rows(x1n, x2n).reshape(8, 9)
    h = nullspace_8x9_qr(rows)
    return _denormalize_h(h.reshape(3, 3), T1, T2)


# vmapped minimal solvers: (S, 4, 2) x (S, 4, 2) -> (S, 3, 3)
homography_4pt_batch_qr = jax.vmap(homography_4pt)
homography_4pt_batch = jax.vmap(
    homography_from_points, in_axes=(0, 0, None, None, None)
)


# ---------------------------------------------------------------------------
# moment-based batched weighted refit (C12 at scale)
# ---------------------------------------------------------------------------
#
# The vmapped `homography_from_points` materializes a (C, N, 2, 9) DLT row
# tensor per refit round (~190 MB at the stress shape) just to reduce it to
# C 9x9 normal matrices. But the rows factor as Kronecker products —
# row_x = kron([0,-1,v], [x,y,1]), row_y = kron([1,0,-u], [x,y,1]) — so
#   A^T W A = sum_n w_n [ (a a^T) (x) (p p^T) + (b b^T) (x) (p p^T) ],
# and every candidate's normal matrix is a linear combination of THIRTY
# shared per-point moments  {1,u,v,u^2,v^2} x {1,x,y,x^2,xy,y^2}. The whole
# batched refit is then ONE (C, N) x (N, 30) MXU matmul plus a per-candidate
# 9x9 assembly; the weighted Hartley normalization is recovered exactly from
# the same moments and applied as a Kronecker similarity sandwich. fp32
# conditioning is preserved by a global (unweighted) similarity pre-
# normalization, so all accumulated moments are O(1).


class RefitBasis(NamedTuple):
    """Shared per-point refit features (build once per (x1, x2) pair)."""

    feats: jax.Array  # (N, 30) moment features in the global frame
    T1g: jax.Array    # (3, 3) global similarity on x1 (raw -> global)
    T2g: jax.Array    # (3, 3) global similarity on x2


def _similarity(s, cx, cy, dtype):
    T = jnp.eye(3, dtype=dtype)
    return T.at[0, 0].set(s).at[1, 1].set(s) \
            .at[0, 2].set(-s * cx).at[1, 2].set(-s * cy)


def prepare_refit(x1: jax.Array, x2: jax.Array) -> RefitBasis:
    """(N, 2) x (N, 2) -> moment features for `homography_refit_batch`."""
    def global_norm(p):
        mean = jnp.mean(p, axis=0)
        cen = p - mean
        rms = jnp.sqrt(jnp.maximum(jnp.mean(jnp.sum(cen**2, -1)), _EPS))
        s = jnp.sqrt(jnp.asarray(2.0, p.dtype)) / rms
        return cen * s, _similarity(s, mean[0], mean[1], p.dtype)

    x1g, T1g = global_norm(x1)
    x2g, T2g = global_norm(x2)
    x, y = x1g[:, 0], x1g[:, 1]
    u, v = x2g[:, 0], x2g[:, 1]
    one = jnp.ones_like(x)
    m = jnp.stack([one, u, v, u * u, v * v], axis=1)          # (N, 5)
    p = jnp.stack([one, x, y, x * x, x * y, y * y], axis=1)   # (N, 6)
    feats = (m[:, :, None] * p[:, None, :]).reshape(-1, 30)
    return RefitBasis(feats, T1g, T2g)


def _moments_to_ata(mom):
    """One candidate's normalized-DLT normal matrix from its (5, 6)
    moment table: (9, 9) ata plus the Hartley similarity parameters
    (s1, c1x, c1y, s2, c2x, c2y) needed to denormalize the solution."""
    dtype = mom.dtype
    wsum = jnp.maximum(mom[0, 0], _EPS)
    # weighted Hartley parameters of both sides, from the moments
    c1x, c1y = mom[0, 1] / wsum, mom[0, 2] / wsum
    rms1 = jnp.sqrt(jnp.maximum(
        (mom[0, 3] + mom[0, 5]) / wsum - (c1x * c1x + c1y * c1y), _EPS
    ))
    s1 = jnp.sqrt(jnp.asarray(2.0, dtype)) / rms1
    c2x, c2y = mom[1, 0] / wsum, mom[2, 0] / wsum
    rms2 = jnp.sqrt(jnp.maximum(
        (mom[3, 0] + mom[4, 0]) / wsum - (c2x * c2x + c2y * c2y), _EPS
    ))
    s2 = jnp.sqrt(jnp.asarray(2.0, dtype)) / rms2

    def P(mi):  # second-moment matrix of [x, y, 1] under m-basis row mi
        return jnp.stack([
            jnp.stack([mom[mi, 3], mom[mi, 4], mom[mi, 1]]),
            jnp.stack([mom[mi, 4], mom[mi, 5], mom[mi, 2]]),
            jnp.stack([mom[mi, 1], mom[mi, 2], mom[mi, 0]]),
        ])

    P0, Pu, Pv, Pu2, Pv2 = P(0), P(1), P(2), P(3), P(4)
    Z = jnp.zeros((3, 3), dtype)
    # Sa = sum w (aa^T (x) pp^T), a = [0,-1,v];  Sb with b = [1,0,-u]
    Sa = jnp.concatenate([
        jnp.concatenate([Z, Z, Z], axis=1),
        jnp.concatenate([Z, P0, -Pv], axis=1),
        jnp.concatenate([Z, -Pv, Pv2], axis=1),
    ], axis=0)
    Sb = jnp.concatenate([
        jnp.concatenate([P0, Z, -Pu], axis=1),
        jnp.concatenate([Z, Z, Z], axis=1),
        jnp.concatenate([-Pu, Z, Pu2], axis=1),
    ], axis=0)
    # normalized rows are kron(Ga a, T1c p) / kron(Gb b, T1c p)
    T1c = _similarity(s1, c1x, c1y, dtype)
    Ga = jnp.eye(3, dtype=dtype).at[2, 1].set(s2 * c2y).at[2, 2].set(s2)
    Gb = jnp.eye(3, dtype=dtype).at[2, 0].set(s2 * c2x).at[2, 2].set(s2)
    Ka = jnp.kron(Ga, T1c)
    Kb = jnp.kron(Gb, T1c)
    ata = (
        jnp.matmul(jnp.matmul(Ka, Sa, precision=_HI), Ka.T, precision=_HI)
        + jnp.matmul(jnp.matmul(Kb, Sb, precision=_HI), Kb.T,
                     precision=_HI)
    )
    return ata, (s1, c1x, c1y, s2, c2x, c2y)


def _h_from_nullvec(h, params, T1g, T2g):
    """Denormalize one candidate's unit nullspace vector back through the
    per-candidate Hartley similarities and the global pre-normalization."""
    s1, c1x, c1y, s2, c2x, c2y = params
    dtype = h.dtype
    Hg = _denormalize_h(h.reshape(3, 3), _similarity(s1, c1x, c1y, dtype),
                        _similarity(s2, c2x, c2y, dtype))
    # compose out of the global frame: H = T2g^-1 Hg T1g
    sg = T2g[0, 0]
    T2g_inv = jnp.eye(3, dtype=dtype)
    T2g_inv = T2g_inv.at[0, 0].set(1.0 / sg).at[1, 1].set(1.0 / sg)
    T2g_inv = T2g_inv.at[0, 2].set(-T2g[0, 2] / sg) \
                     .at[1, 2].set(-T2g[1, 2] / sg)
    H = jnp.matmul(jnp.matmul(T2g_inv, Hg, precision=_HI), T1g,
                   precision=_HI)
    H = H / jnp.maximum(jnp.linalg.norm(H), _EPS)
    return H * jnp.where(H[2, 2] < 0, -1.0, 1.0)


def homography_refit_batch(
    weights: jax.Array,
    basis: RefitBasis,
    eig_method: str = "jacobi",
    eig_iterations: int = 8,
    eig_pallas: bool = False,
) -> jax.Array:
    """Weighted DLT refit of C candidates in one matmul: (C, N) weights ->
    (C, 3, 3). Equals vmapped `homography_from_points(x1, x2, w)` up to
    fp32 summation order (parity-tested).

    With eig_pallas the 9x9 eigensolve runs through the batch-on-lanes
    Pallas Jacobi kernel (ops/kernels/eig_kernel.py) instead of the
    vmapped per-candidate solver — same rotations, ~20x fewer
    instructions at C >= 256 (docs/PERF.md)."""
    mom = jnp.matmul(weights, basis.feats, precision=_HI)  # (C, 30)
    atas, params = jax.vmap(
        lambda mm: _moments_to_ata(mm.reshape(5, 6))
    )(mom)
    if eig_pallas:
        from multih_tpu.ops.kernels import eig_kernel

        hs = eig_kernel.smallest_eigvec_9x9_batch(atas)  # (C, 9)
    else:
        hs = jax.vmap(
            lambda a: smallest_eigvec_9x9(a, eig_iterations, eig_method)
        )(atas)
    return jax.vmap(
        lambda h, pr: _h_from_nullvec(h, pr, basis.T1g, basis.T2g)
    )(hs, params)


def quad_degenerate(x1: jax.Array, eps: float = 1e-6) -> jax.Array:
    """True if any 3 of the 4 sample points are (near-)collinear.

    The reference rejects such minimal samples before calling the solver;
    here it becomes a mask multiplied into the hypothesis score. x1: (4, 2).
    """
    def tri_area2(a, b, c):
        return jnp.abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        )

    p = [x1[i] for i in range(4)]
    areas = jnp.stack(
        [
            tri_area2(p[0], p[1], p[2]),
            tri_area2(p[0], p[1], p[3]),
            tri_area2(p[0], p[2], p[3]),
            tri_area2(p[1], p[2], p[3]),
        ]
    )
    return jnp.any(areas < eps)


quad_degenerate_batch = jax.vmap(quad_degenerate, in_axes=(0, None))


def quad_degenerate_t(px: jax.Array, py: jax.Array,
                      eps: float = 1e-6) -> jax.Array:
    """`quad_degenerate_batch` in coordinate-major layout: px, py are
    (4, S) — quad q's x/y coords as dense lane-major rows (no padded
    minor dims; the (S, 4, 2) layout pads 2 -> 128 lanes and wastes 64x
    the bytes of every elementwise op). Returns (S,) bool."""
    def tri_area2(a, b, c):
        return jnp.abs(
            (px[b] - px[a]) * (py[c] - py[a])
            - (py[b] - py[a]) * (px[c] - px[a])
        )

    d = tri_area2(0, 1, 2) < eps
    d |= tri_area2(0, 1, 3) < eps
    d |= tri_area2(0, 2, 3) < eps
    d |= tri_area2(1, 2, 3) < eps
    return d


# ---------------------------------------------------------------------------
# residuals (reference C6) — hypotheses x correspondences contractions
# ---------------------------------------------------------------------------

def _forward_transfer_sq(H, x1h, x2):
    """||pi(H x1) - x2||^2. H: (..., 3, 3), x1h: (N, 3), x2: (N, 2) ->
    (..., N)."""
    y = jnp.einsum("...ab,nb->...na", H, x1h, precision=_HI)
    return jnp.sum((from_homogeneous(y) - x2) ** 2, axis=-1)


def transfer_error_sq(H: jax.Array, x1: jax.Array, x2: jax.Array):
    return _forward_transfer_sq(H, to_homogeneous(x1), x2)


def symmetric_transfer_error_sq(H: jax.Array, x1: jax.Array, x2: jax.Array):
    """Forward + backward transfer. Backward uses the adjugate (scale-free
    inverse) so no per-hypothesis matrix inversion/division is needed."""
    fwd = _forward_transfer_sq(H, to_homogeneous(x1), x2)
    bwd = _forward_transfer_sq(adjugate_3x3(H), to_homogeneous(x2), x1)
    return fwd + bwd


def sampson_error_sq_h(H: jax.Array, x1: jax.Array, x2: jax.Array):
    """First-order (Sampson) approximation of the reprojection error for a
    homography. Uses the two independent rows of x2 x (H x1) = 0 and their
    Jacobian w.r.t. (x1, x2). H: (..., 3, 3) -> (..., N)."""
    x1h = to_homogeneous(x1)  # (N, 3)
    Hx = jnp.einsum("...ab,nb->...na", H, x1h, precision=_HI)  # (..., N, 3)
    u, v = x2[..., 0], x2[..., 1]
    # algebraic error: e1 = v * Hx_2 - Hx_1 (y-row), e2 = Hx_0 - u * Hx_2
    e1 = v * Hx[..., 2] - Hx[..., 1]
    e2 = Hx[..., 0] - u * Hx[..., 2]
    h = H.reshape(*H.shape[:-2], 9)

    def hq(i):  # (..., 1): broadcasts against the N point axis
        return h[..., i][..., None]

    # d e1 / d x1 = (v*h6 - h3, v*h7 - h4) ; d e1 / d x2 = (0, Hx_2)
    d1x = v * hq(6) - hq(3)
    d1y = v * hq(7) - hq(4)
    d1u = jnp.zeros_like(e1)
    d1v = Hx[..., 2]
    # d e2 / d x1 = (h0 - u*h6, h1 - u*h7) ; d e2 / d x2 = (-Hx_2, 0)
    d2x = hq(0) - u * hq(6)
    d2y = hq(1) - u * hq(7)
    d2u = -Hx[..., 2]
    d2v = jnp.zeros_like(e2)
    # J J^T (2x2 per point)
    a = d1x**2 + d1y**2 + d1u**2 + d1v**2
    b = d1x * d2x + d1y * d2y + d1u * d2u + d1v * d2v
    c = d2x**2 + d2y**2 + d2u**2 + d2v**2
    det = jnp.maximum(a * c - b * b, _EPS)
    # e^T (J J^T)^-1 e
    return (c * e1 * e1 - 2.0 * b * e1 * e2 + a * e2 * e2) / det


_RESIDUALS = {
    "transfer": transfer_error_sq,
    "symmetric": symmetric_transfer_error_sq,
    "sampson": sampson_error_sq_h,
}


def residual_matrix(
    Hs: jax.Array, x1: jax.Array, x2: jax.Array, kind: str = "symmetric"
) -> jax.Array:
    """(S, 3, 3) hypotheses x (N, 2) correspondences -> (S, N) squared
    residuals. The reference computes this entry-by-entry in nested loops
    (hot loop #1, SURVEY.md §3.1); here it is one fused contraction."""
    return _RESIDUALS[kind](Hs, x1, x2)


def residual_matrix_chunked(
    Hs: jax.Array,
    x1: jax.Array,
    x2: jax.Array,
    kind: str = "symmetric",
    chunk: int = 512,
):
    """Same as residual_matrix but scanning hypothesis chunks so the full
    (S, N) never exceeds chunk x N live memory — the jnp analog of the tiled
    Pallas kernel (SURVEY.md §5 long-context entry / P2)."""
    s = Hs.shape[0]
    if s % chunk != 0:
        pad = (-s) % chunk
        Hs = jnp.concatenate(
            [Hs, jnp.broadcast_to(jnp.eye(3, dtype=Hs.dtype), (pad, 3, 3))]
        )
    hs = Hs.reshape(-1, chunk, 3, 3)
    out = jax.lax.map(lambda h: residual_matrix(h, x1, x2, kind), hs)
    return out.reshape(-1, x1.shape[0])[:s]


# ---------------------------------------------------------------------------
# jitted aliases for interactive / test use. Inside pipeline.fit the raw
# functions are used so everything fuses into the one XLA program.
# ---------------------------------------------------------------------------

homography_from_points_jit = jax.jit(
    homography_from_points, static_argnames=("eig_method", "eig_iterations")
)
homography_4pt_jit = jax.jit(homography_4pt)
homography_4pt_batch_jit = jax.jit(homography_4pt_batch_qr)
residual_matrix_jit = jax.jit(residual_matrix, static_argnames=("kind",))
