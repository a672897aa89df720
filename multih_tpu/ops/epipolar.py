"""Epipolar geometry: batched fundamental-matrix estimation and the
affine+F one-point homography (the Multi-H paper's primary hypothesis
source).

Reference parity (SURVEY.md §2 C4, C5): the reference estimates F with
``cv::findFundamentalMat`` and derives one homography per correspondence
from its local affine frame and F (Multi-H paper §3.1, the 'HAF' method).
Here both are batch-first JAX:

- normalized 8-point solve from the 9x9 normal matrix (same eigensolver
  machinery as the DLT), rank-2 enforced via a 3x3 SVD;
- RANSAC-style F estimation as one vmapped sweep (threefry sampling,
  Sampson verification) — no sequential loop;
- the one-point method as a 6x3 least-squares in the plane parameter v of
  H = [e']_x F - e' v^T (any homography compatible with F has this form),
  with 2 equations from the point correspondence and 4 from the local
  affine frame — fully vmapped, one launch for all correspondences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multih_tpu.ops import geometry, sampling

_EPS = 1e-12
_HI = jax.lax.Precision.HIGHEST  # fp32 matmuls (TPU defaults to bf16)


# ---------------------------------------------------------------------------
# fundamental matrix (C4)
# ---------------------------------------------------------------------------

def _f_rows(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Epipolar constraint rows: x2h^T F x1h = 0 -> (N, 9), F row-major."""
    x, y = x1[..., 0], x1[..., 1]
    u, v = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(x)
    return jnp.stack(
        [u * x, u * y, u, v * x, v * y, v, x, y, one], axis=-1
    )


def fundamental_8pt(
    x1: jax.Array,
    x2: jax.Array,
    weights: jax.Array | None = None,
    eig_method: str = "eigh",
) -> jax.Array:
    """Weighted normalized 8-point fundamental matrix, ||F|| = 1, rank 2."""
    x1n, T1 = geometry.hartley_normalize(x1, weights)
    x2n, T2 = geometry.hartley_normalize(x2, weights)
    rows = _f_rows(x1n, x2n)  # (N, 9)
    if weights is not None:
        ata = jnp.einsum("ni,nj->ij", rows * weights[:, None], rows,
                         precision=_HI)
    else:
        ata = jnp.einsum("ni,nj->ij", rows, rows, precision=_HI)
    f = geometry.smallest_eigvec_9x9(ata, method=eig_method)
    Fn = f.reshape(3, 3)
    # rank-2 enforcement: zero the smallest singular value
    u, s, vt = jnp.linalg.svd(Fn)
    Fn = jnp.matmul(u * s.at[2].set(0.0)[None, :], vt, precision=_HI)
    F = jnp.matmul(jnp.matmul(T2.T, Fn, precision=_HI), T1,
                   precision=_HI)
    F = F / jnp.maximum(jnp.linalg.norm(F), _EPS)
    return F * jnp.where(F[2, 2] < 0, -1.0, 1.0)


def sampson_error_f(F: jax.Array, x1: jax.Array, x2: jax.Array):
    """First-order geometric error of the epipolar constraint.
    F: (..., 3, 3); x1, x2: (N, 2) -> (..., N)."""
    x1h = geometry.to_homogeneous(x1)  # (N, 3)
    x2h = geometry.to_homogeneous(x2)
    Fx1 = jnp.einsum("...ab,nb->...na", F, x1h, precision=_HI)
    Ftx2 = jnp.einsum("...ba,nb->...na", F, x2h, precision=_HI)
    num = jnp.einsum("na,...na->...n", x2h, Fx1, precision=_HI) ** 2
    den = (
        Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2
        + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    )
    return num / jnp.maximum(den, _EPS)


def estimate_fundamental(
    key: jax.Array,
    x1: jax.Array,
    x2: jax.Array,
    valid: jax.Array,
    n_samples: int = 512,
    threshold: float = 1.0,
    lo_rounds: int = 2,
) -> jax.Array:
    """RANSAC-style F estimation in one vmapped sweep + LO polish.

    Minimal samples use 8 points (two stacked 4-tuples from the collision-
    free sampler). Verification is the Sampson error; the best sample is
    refit on its Tukey-weighted inliers lo_rounds times.
    """
    thr = jnp.asarray(threshold**2, x1.dtype)
    k1, k2 = jax.random.split(key)
    idx = jnp.concatenate(
        [
            sampling.sample_indices(k1, n_samples, valid > 0),
            sampling.sample_indices(k2, n_samples, valid > 0),
        ],
        axis=1,
    )  # (S, 8) — halves are internally distinct; cross-half duplicates
    # merely reduce one sample's effective rank and get outscored.

    def solve_one(i8):
        return fundamental_8pt(x1[i8], x2[i8])

    Fs = jax.vmap(solve_one)(idx)  # (S, 3, 3)
    err = sampson_error_f(Fs, x1, x2)  # (S, N)
    counts = jnp.sum((err < thr) * valid[None, :], axis=1)
    F = Fs[jnp.argmax(counts)]

    def lo(F, _):
        e = sampson_error_f(F, x1, x2)
        w = jnp.maximum(0.0, 1.0 - e / thr) ** 2 * (e < thr) * valid
        Fn = fundamental_8pt(x1, x2, w)
        better = jnp.sum(
            (sampson_error_f(Fn, x1, x2) < thr) * valid
        ) >= jnp.sum((e < thr) * valid)
        return jnp.where(better, Fn, F), None

    F, _ = jax.lax.scan(lo, F, None, length=lo_rounds)
    return F


def epipole(F: jax.Array, which: str = "right") -> jax.Array:
    """Null vectors of F: right epipole e' (F^T e' = 0) or left e (F e = 0),
    via the 3x3 symmetric eigenproblem (smallest eigenvector).

    NOTE: expects F in *normalized* image coordinates (order-1 entries). A
    pixel-coordinate F is nearly rank-1 (sigma2/sigma1 ~ 1e-4) and fp32
    cannot separate its null direction; scale with S = diag(s, s, 1),
    F' = S^T F S first (homography_one_point does this internally)."""
    m = jnp.matmul(F, F.T, precision=_HI) if which == "right" \
        else jnp.matmul(F.T, F, precision=_HI)
    _, v = jnp.linalg.eigh(m)
    e = v[:, 0]
    return e / jnp.maximum(jnp.linalg.norm(e), _EPS)


# ---------------------------------------------------------------------------
# affine + F one-point homography (C5, Multi-H paper §3.1)
# ---------------------------------------------------------------------------

def homography_one_point(
    F: jax.Array, p1: jax.Array, p2: jax.Array, A: jax.Array
) -> jax.Array:
    """Homography from one correspondence + its local affine frame + F.

    Any homography consistent with F can be written H = [e']_x F - e' v^T
    (Hartley & Zisserman, result 13.3); the 3-vector v is the plane
    parameter. Constraints:
      - point: pi(H p1h) = p2 (2 equations),
      - affine: d pi(H x)/dx at p1 = A (4 equations),
    all linear in v once the projective depth is eliminated -> 6x3 least
    squares, solved in closed form via 3x3 normal equations.

    Args: F (3,3); p1, p2 (2,); A (2,2) local affine (dp2/dp1).
    Returns: H (3,3), ||H|| = 1.
    """
    # Coordinate normalization: pixel-scale inputs make the 6x3 system's
    # columns differ by ~3 orders of magnitude; in fp32 the solve loses all
    # accuracy (same kappa^2 issue as the DLT — SURVEY.md §7 'fp32
    # conditioning ... normalization mandatory'). Scale both images by a
    # common similarity S = diag(s, s, 1): F' = S^T F S, A' = A, and
    # denormalize H = S H' S^-1 at the end.
    s = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(p1)), jnp.max(jnp.abs(p2))), 1.0
    )
    S = jnp.diag(jnp.stack([s, s, jnp.ones((), F.dtype)]))
    S_inv = jnp.diag(jnp.stack([1.0 / s, 1.0 / s, jnp.ones((), F.dtype)]))
    F = jnp.matmul(jnp.matmul(S.T, F, precision=_HI), S, precision=_HI)
    F = F / jnp.maximum(jnp.linalg.norm(F), _EPS)
    p1 = p1 / s
    p2 = p2 / s

    e2 = epipole(F, "right")
    H0 = jnp.matmul(_cross_mat(e2), F, precision=_HI)  # pencil base
    p1h = geometry.to_homogeneous(p1[None, :])[0]  # (3,)

    # y(v) = H p1h = y0 - e2 * (v . p1h);   q = y12 / y3 must equal p2
    # rows of H: h_i(v) = H0_i - e2_i * v
    y0 = jnp.matmul(H0, p1h, precision=_HI)

    # Point constraints: y1 - u*y3 = 0 and y2 - v*y3 = 0 (u, v = p2)
    #   (y0_1 - e2_1 (v.p1h)) - p2_x (y0_3 - e2_3 (v.p1h)) = 0
    # -> coefficient on (v.p1h): (p2_x e2_3 - e2_1); constant: y0_1 - p2_x y0_3
    # Each is 1 equation linear in v through s := v . p1h and the affine
    # rows below are linear in v directly — assemble everything in v.
    u, w = p2[0], p2[1]
    # equation rows in v (3,) and rhs scalars
    rows = []
    rhs = []
    # point rows: (e2_1 - u e2_3) * (v.p1h) = y0_1 - u y0_3  -> row = c * p1h
    c1 = e2[0] - u * e2[2]
    rows.append(c1 * p1h)
    rhs.append(y0[0] - u * y0[2])
    c2 = e2[1] - w * e2[2]
    rows.append(c2 * p1h)
    rhs.append(y0[1] - w * y0[2])

    # Affine constraints. q(x) = (h1.xh / h3.xh, h2.xh / h3.xh);
    # dq_i/dx_j at p1: (h_i[j] - q_i h3[j]) / (h3.p1h) with q = p2 (known).
    # With h_i = H0_i - e2_i v and y3 = y0_3 - e2_3 (v.p1h):
    #   A_ij * y3 = h_i[j] - p2_i h3[j]
    # -> A_ij*(y0_3 - e2_3 (v.p1h)) - (H0_ij - e2_i v_j) + p2_i (H0_3j - e2_3 v_j) = 0
    # -> linear in v: coeff = A_ij * (-e2_3) * p1h  + e2_i * e_j - p2_i e2_3 * e_j
    q = jnp.stack([u, w])
    for i in range(2):
        for j in range(3):
            if j == 2:
                continue  # affine frame constrains spatial derivatives only
            basis = jnp.zeros((3,)).at[j].set(1.0)
            row = (
                -A[i, j] * e2[2] * p1h
                + (e2[i] - q[i] * e2[2]) * basis
            )
            r = (
                -A[i, j] * y0[2]
                + H0[i, j]
                - q[i] * H0[2, j]
            )
            rows.append(row)
            rhs.append(r)

    M = jnp.stack(rows)           # (6, 3)
    b = jnp.stack(rhs)            # (6,)
    v = jnp.linalg.lstsq(M, b)[0]  # SVD-based; not a dot op
    H = H0 - jnp.outer(e2, v)
    H = jnp.matmul(jnp.matmul(S, H, precision=_HI), S_inv,
                   precision=_HI)  # back to pixel coordinates
    H = H / jnp.maximum(jnp.linalg.norm(H), _EPS)
    return H * jnp.where(H[2, 2] < 0, -1.0, 1.0)


def _cross_mat(e: jax.Array) -> jax.Array:
    z = jnp.zeros((), e.dtype)
    return jnp.stack(
        [
            jnp.stack([z, -e[2], e[1]]),
            jnp.stack([e[2], z, -e[0]]),
            jnp.stack([-e[1], e[0], z]),
        ]
    )


# vmapped over correspondences: F shared; p1, p2 (N, 2); A (N, 2, 2)
homography_one_point_batch = jax.vmap(
    homography_one_point, in_axes=(None, 0, 0, 0)
)
