"""Pallas TPU kernel: batched minimal 4-point DLT homography solves.

SURVEY.md §7 stage 7b. The vmapped jnp Givens-QR path
(`geometry.homography_4pt_batch_qr`) is layout-bound on TPU: every one of
the 28 rotations rewrites an (S, 8, 9) array whose last dimension pads
9 -> 128 lanes, so the solve moves ~14x the useful bytes and measured
~112 ms for 102400 solves (~70% of the stress fit's hypothesize stage,
see docs/PERF.md). This kernel transposes the problem: the BATCH rides
the (sublane, lane) axes as (8, 128) f32 tiles and each of the 72 matrix
entries is its own tile-shaped register, so the whole solve — Hartley
normalization, 8x9 row build, 28 Givens rotations, back substitution,
denormalization — runs unrolled in VMEM with zero layout waste. HBM
traffic is 16 floats in + 9 out per hypothesis (the roofline).

The math mirrors `geometry.homography_4pt` exactly (same EPS guards,
same normalization, same canonical sign); parity is tested entry-wise on
random and degenerate quads, and end-to-end through the pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12
# batch tile: 8 sublanes x 128 lanes of hypotheses per grid step
_SB = 8
_LANES = 128
TILE = _SB * _LANES


def _dlt_kernel(pts_ref, out_ref):
    """pts_ref: (16, 8, 128) block — rows 0..7 = x1 coords (xa ya xb yb xc
    yc xd yd), rows 8..15 = x2 coords; out_ref: (9, 8, 128) — H row-major.
    Each of the 8*128 lanes is one independent minimal solve."""
    p = [pts_ref[i, :, :] for i in range(16)]
    x1 = [(p[0], p[1]), (p[2], p[3]), (p[4], p[5]), (p[6], p[7])]
    x2 = [(p[8], p[9]), (p[10], p[11]), (p[12], p[13]), (p[14], p[15])]

    def hartley(q):
        # geometry.hartley_normalize with N=4, unit weights
        cx = (q[0][0] + q[1][0] + q[2][0] + q[3][0]) * 0.25
        cy = (q[0][1] + q[1][1] + q[2][1] + q[3][1]) * 0.25
        cen = [(qx - cx, qy - cy) for qx, qy in q]
        ms = (sum(qx * qx + qy * qy for qx, qy in cen)) * 0.25
        rms = jnp.sqrt(jnp.maximum(ms, _EPS))
        s = jnp.sqrt(jnp.float32(2.0)) / rms
        return [(qx * s, qy * s) for qx, qy in cen], s, cx, cy

    n1, s1, c1x, c1y = hartley(x1)
    n2, s2, c2x, c2y = hartley(x2)

    zero = jnp.zeros_like(p[0])
    one = jnp.ones_like(p[0])

    # 8x9 DLT rows (geometry.dlt_rows), r[i][j] are (8, 128) registers
    r = []
    for (x, y), (u, v) in zip(n1, n2):
        r.append([zero, zero, zero, -x, -y, -one, v * x, v * y, v])
        r.append([x, y, one, zero, zero, zero, -u * x, -u * y, -u])

    # 28 Givens rotations (geometry.nullspace_8x9_qr). Columns j < c are
    # structurally zero on both rows by then and stay zero — skipped.
    for c in range(8):
        for k in range(c + 1, 8):
            a, b = r[c][c], r[k][c]
            d = jnp.sqrt(a * a + b * b)
            d_safe = jnp.maximum(d, _EPS)
            live = d > _EPS
            cs = jnp.where(live, a / d_safe, 1.0)
            sn = jnp.where(live, b / d_safe, 0.0)
            for j in range(c, 9):
                rc = cs * r[c][j] + sn * r[k][j]
                rk = -sn * r[c][j] + cs * r[k][j]
                r[c][j] = rc
                r[k][j] = rk

    # back substitution of R x = 0 with x[8] = 1
    x = [zero] * 9
    x[8] = one
    for i in reversed(range(8)):
        acc = zero
        for j in range(i + 1, 9):
            acc = acc + r[i][j] * x[j]
        denom = r[i][i]
        denom = jnp.where(
            jnp.abs(denom) < _EPS,
            jnp.where(denom < 0, -_EPS, _EPS),
            denom,
        )
        x[i] = -acc / denom
    vn = jnp.sqrt(sum(xi * xi for xi in x))
    inv = 1.0 / jnp.maximum(vn, _EPS)
    h = [xi * inv for xi in x]  # Hn row-major

    # denormalize (geometry._denormalize_h): H = T2^-1 (Hn T1), where T1,
    # T2 are the Hartley similarities. A = Hn T1 by columns:
    a_col0 = [s1 * h[0], s1 * h[3], s1 * h[6]]
    a_col1 = [s1 * h[1], s1 * h[4], s1 * h[7]]
    a_col2 = [
        -s1 * c1x * h[0] - s1 * c1y * h[1] + h[2],
        -s1 * c1x * h[3] - s1 * c1y * h[4] + h[5],
        -s1 * c1x * h[6] - s1 * c1y * h[7] + h[8],
    ]
    A = [
        [a_col0[0], a_col1[0], a_col2[0]],
        [a_col0[1], a_col1[1], a_col2[1]],
        [a_col0[2], a_col1[2], a_col2[2]],
    ]
    # T2_inv rows: [1/s2, 0, c2x], [0, 1/s2, c2y], [0, 0, 1]
    inv_s2 = 1.0 / s2
    B = [
        [A[0][j] * inv_s2 + c2x * A[2][j] for j in range(3)],
        [A[1][j] * inv_s2 + c2y * A[2][j] for j in range(3)],
        A[2],
    ]
    fro = jnp.sqrt(sum(B[i][j] * B[i][j] for i in range(3)
                       for j in range(3)))
    scale = 1.0 / jnp.maximum(fro, _EPS)
    sign = jnp.where(B[2][2] < 0, -scale, scale)
    for i in range(3):
        for j in range(3):
            out_ref[3 * i + j, :, :] = B[i][j] * sign


@functools.partial(jax.jit, static_argnames=("interpret",))
def _solve_packed(packed: jax.Array, interpret: bool = False) -> jax.Array:
    """(16, S) packed coords -> (9, S) row-major homographies; S a
    multiple of TILE."""
    s = packed.shape[1]
    assert s % TILE == 0, (s, TILE)
    nb = s // _LANES
    p3 = packed.reshape(16, nb, _LANES)
    out = pl.pallas_call(
        _dlt_kernel,
        grid=(s // TILE,),
        in_specs=[
            pl.BlockSpec(
                (16, _SB, _LANES), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (9, _SB, _LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((9, nb, _LANES), jnp.float32),
        interpret=interpret,
    )(p3)
    return out.reshape(9, s)


def homography_4pt_pallas_packed(
    packed: jax.Array, interpret: bool = False
) -> jax.Array:
    """Batched minimal solve from coordinate-major packed coords:
    (16, S) rows [x1: xa ya xb yb xc yc xd yd; then x2 likewise] ->
    (S, 3, 3). The packed layout is the kernel's native input — callers
    that gather sample coordinates coordinate-major (pipeline
    _solve_minimal) skip the (S, 4, 2) round trip entirely (its 2-wide
    minor dim pads to 128 lanes). Pads S to a TILE multiple internally.
    """
    s = packed.shape[1]
    pad = (-s) % TILE
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros((16, pad), packed.dtype)], axis=1
        )
    h = _solve_packed(packed.astype(jnp.float32), interpret=interpret)
    return h.T.reshape(-1, 3, 3)[:s]


def homography_4pt_pallas(
    p1: jax.Array, p2: jax.Array, interpret: bool = False
) -> jax.Array:
    """Batched minimal solve: (S, 4, 2) x (S, 4, 2) -> (S, 3, 3).

    Drop-in replacement for `geometry.homography_4pt_batch_qr` on TPU
    (interpret=True runs the same kernel on CPU for tests). Pads S to a
    TILE multiple internally.
    """
    s = p1.shape[0]
    pad = (-s) % TILE
    if pad:
        p1 = jnp.concatenate([p1, jnp.zeros((pad, 4, 2), p1.dtype)])
        p2 = jnp.concatenate([p2, jnp.zeros((pad, 4, 2), p2.dtype)])
    # (S', 4, 2) -> (S', 8) -> (16, S') lane-major packing
    packed = jnp.concatenate(
        [p1.reshape(-1, 8).T, p2.reshape(-1, 8).T], axis=0
    ).astype(jnp.float32)
    h = _solve_packed(packed, interpret=interpret)  # (9, S')
    return h.T.reshape(-1, 3, 3)[:s]
