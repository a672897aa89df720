"""Pallas TPU kernel: tiled hypotheses x correspondences verification.

The build's analog of sequence parallelism (SURVEY.md §5 'long-context',
§2 P2): a 2-D grid over (hypothesis tile, point tile) computes residuals
(symmetric/forward transfer or Sampson, matching geometry.residual_matrix)
and reduces them to per-hypothesis inlier counts entirely on-chip — the
full (S, N) residual matrix never exists in HBM, so the 100k x 10k stress
config (BASELINE.json:10) costs S*9 + 5*N floats of traffic instead of
S*N.

Layouts are chosen for the VPU's (sublane, lane) tiling:
- hypotheses ride the sublane axis as (TH, 9) blocks of the (S, 9) array
  (row-major h entries; each entry read as a (TH, 1) column broadcasts
  against points),
- points ride the lane axis packed as an (8, N) array whose rows are
  [x1, y1, x2, y2, valid, 0, 0, 0] — an exact f32 tile height,
- the output is (S, 1) accumulated across point tiles (grid's minor axis),
  so each hypothesis tile's count stays resident while points stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12


def _count_kernel(h_ref, pts_ref, thr_ref, out_ref, *, approx_rcp: bool,
                  kind: str, mxu: bool):
    j = pl.program_id(1)

    x = pts_ref[0:1, :]
    y = pts_ref[1:2, :]
    u = pts_ref[2:3, :]
    v = pts_ref[3:4, :]
    valid = pts_ref[4:5, :]

    h = [h_ref[:, k:k + 1] for k in range(9)]  # (TH, 1) each

    def safe_rcp(w):
        # sign-preserving clamped reciprocal. With approx_rcp, full-precision
        # division (the VPU bottleneck of this kernel, +6% end to end) is
        # replaced by the hardware fast reciprocal; its ~2^-14 relative
        # error can move hypotheses whose error sits exactly at the
        # threshold, so per-hypothesis counts may differ from the jnp
        # reference path by a couple of boundary ties (tests allow +-2).
        # approx_rcp=False restores bit-comparable division for parity
        # debugging (cfg.pallas_approx_rcp).
        s = jnp.where(w < 0, -1.0, 1.0)
        w_safe = s * jnp.maximum(jnp.abs(w), _EPS)
        return pl.reciprocal(w_safe, approx=approx_rcp)

    def rows3(hmat, p3):
        # (TH, 3) @ (3, TN) row numerators on the MXU. HIGHEST: the
        # default bf16 pass rounds 640-px coordinates to ~2 px, far
        # coarser than the 3-px threshold; bf16x3 restores fp32-grade
        # products, and at K=3 the extra passes are ~free — the whole
        # point is moving ~2/3 of the per-pair FLOPs off the VPU.
        return jax.lax.dot_general(
            hmat, p3, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    if mxu:
        ones = jnp.ones_like(x)
        p1 = jnp.concatenate([x, y, ones], axis=0)   # (3, TN)

    if kind in ("transfer", "symmetric"):
        # forward transfer ||pi(H x1) - x2||^2
        if mxu:
            n0 = rows3(h_ref[:, 0:3], p1)
            n1 = rows3(h_ref[:, 3:6], p1)
            n2 = rows3(h_ref[:, 6:9], p1)
            rf = safe_rcp(n2)
            uf = n0 * rf - u
            vf = n1 * rf - v
        else:
            rf = safe_rcp(h[6] * x + h[7] * y + h[8])
            uf = (h[0] * x + h[1] * y + h[2]) * rf - u
            vf = (h[3] * x + h[4] * y + h[5]) * rf - v
        err = uf * uf + vf * vf
    if kind == "symmetric":
        # backward via adjugate (scale-free inverse), entries are (TH, 1)
        a0 = h[4] * h[8] - h[5] * h[7]
        a1 = h[2] * h[7] - h[1] * h[8]
        a2 = h[1] * h[5] - h[2] * h[4]
        a3 = h[5] * h[6] - h[3] * h[8]
        a4 = h[0] * h[8] - h[2] * h[6]
        a5 = h[2] * h[3] - h[0] * h[5]
        a6 = h[3] * h[7] - h[4] * h[6]
        a7 = h[1] * h[6] - h[0] * h[7]
        a8 = h[0] * h[4] - h[1] * h[3]
        if mxu:
            ones = jnp.ones_like(u)
            p2 = jnp.concatenate([u, v, ones], axis=0)  # (3, TN)
            adj = jnp.concatenate(
                [a0, a1, a2, a3, a4, a5, a6, a7, a8], axis=1
            )                                            # (TH, 9)
            b0 = rows3(adj[:, 0:3], p2)
            b1 = rows3(adj[:, 3:6], p2)
            b2 = rows3(adj[:, 6:9], p2)
            rb = safe_rcp(b2)
            ub = b0 * rb - x
            vb = b1 * rb - y
        else:
            rb = safe_rcp(a6 * u + a7 * v + a8)
            ub = (a0 * u + a1 * v + a2) * rb - x
            vb = (a3 * u + a4 * v + a5) * rb - y
        err = err + ub * ub + vb * vb
    if kind == "sampson":
        # first-order reprojection error, same algebra as
        # geometry.sampson_error_sq_h (the jnp reference): two residual
        # rows of x2 x (H x1) = 0 and their Jacobian w.r.t. (x1, x2).
        if mxu:
            hx0 = rows3(h_ref[:, 0:3], p1)
            hx1 = rows3(h_ref[:, 3:6], p1)
            hx2 = rows3(h_ref[:, 6:9], p1)
        else:
            hx0 = h[0] * x + h[1] * y + h[2]
            hx1 = h[3] * x + h[4] * y + h[5]
            hx2 = h[6] * x + h[7] * y + h[8]
        e1 = v * hx2 - hx1
        e2 = hx0 - u * hx2
        d1x = v * h[6] - h[3]
        d1y = v * h[7] - h[4]
        d2x = h[0] - u * h[6]
        d2y = h[1] - u * h[7]
        # J J^T entries; d1 = (d1x, d1y, 0, hx2), d2 = (d2x, d2y, -hx2, 0)
        # so the cross terms of the zero/hx2 components vanish
        a = d1x * d1x + d1y * d1y + hx2 * hx2
        b = d1x * d2x + d1y * d2y
        c = d2x * d2x + d2y * d2y + hx2 * hx2
        det = jnp.maximum(a * c - b * b, _EPS)
        err = (c * e1 * e1 - 2.0 * b * e1 * e2 + a * e2 * e2) * \
            pl.reciprocal(det, approx=approx_rcp)
    if kind.startswith("f_"):
        # fundamental-matrix residuals (multi-model extension): the
        # hypothesis tile holds F row-major — same (TH, 9) layout as H.
        # Epiline in image 2: l = F x1h; in image 1: m = F^T x2h;
        # constraint value e = x2h . l. Same algebra as
        # fmodel.residual_matrix_f (the jnp reference).
        l0 = h[0] * x + h[1] * y + h[2]
        l1 = h[3] * x + h[4] * y + h[5]
        l2 = h[6] * x + h[7] * y + h[8]
        e = u * l0 + v * l1 + l2
        e2 = e * e
        dl = jnp.maximum(l0 * l0 + l1 * l1, _EPS)
        if kind == "f_transfer":
            err = e2 * pl.reciprocal(dl, approx=approx_rcp)
        else:
            m0 = h[0] * u + h[3] * v + h[6]
            m1 = h[1] * u + h[4] * v + h[7]
            dm = jnp.maximum(m0 * m0 + m1 * m1, _EPS)
            if kind == "f_symmetric":
                err = e2 * (pl.reciprocal(dl, approx=approx_rcp)
                            + pl.reciprocal(dm, approx=approx_rcp))
            else:
                assert kind == "f_sampson", kind
                err = e2 * pl.reciprocal(dl + dm, approx=approx_rcp)

    inlier = jnp.where(
        (err < thr_ref[0, 0]) & (valid > 0), 1.0, 0.0
    )
    cnt = jnp.sum(inlier, axis=1, keepdims=True)  # (TH, 1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = cnt

    @pl.when(j > 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + cnt


def pack_points(x1, x2, valid):
    """(N,2)x2 + (N,) -> (8, N) lane-major packed array."""
    n = x1.shape[0]
    zeros = jnp.zeros((3, n), x1.dtype)
    return jnp.concatenate(
        [x1.T, x2.T, valid[None, :], zeros], axis=0
    )


@functools.partial(
    jax.jit, static_argnames=("hyp_tile", "pt_tile", "interpret",
                              "approx_rcp", "kind", "mxu")
)
def inlier_counts(
    Hs: jax.Array,
    packed_pts: jax.Array,
    threshold_sq: jax.Array,
    hyp_tile: int = 128,
    pt_tile: int = 1024,
    interpret: bool = False,
    approx_rcp: bool = True,
    kind: str = "symmetric",
    mxu: bool = False,
) -> jax.Array:
    """Per-hypothesis inlier counts (residual < threshold).

    Args:
      Hs: (S, 3, 3) float32, S a multiple of hyp_tile (pad with identity).
      packed_pts: (8, N) from pack_points, N a multiple of pt_tile (the
        valid row handles padding).
      threshold_sq: scalar.
      kind: 'symmetric' (forward+backward transfer), 'transfer'
        (forward only — half the FLOPs), or 'sampson' (first-order
        reprojection) — same residual algebra as
        geometry.residual_matrix(kind) (VERDICT r2 item 8).
      mxu: compute the per-pair row numerators (H rows and adjugate
        rows dotted with [x, y, 1] / [u, v, 1]) as (TH, 3) @ (3, TN)
        MXU contractions at Precision.HIGHEST instead of VPU
        broadcast chains. MEASURED LOSS — kept off as a documented
        negative result: the contraction depth is intrinsically K=3,
        so the 128x128 systolic array runs at 3/128 utilization and
        HIGHEST (bf16x6 passes, needed because plain bf16 rounds
        640-px coordinates to ~2 px against a 3-px threshold)
        multiplies the passes. On-device at the stress sweep shape:
        symmetric 59.7 -> 19.4 Gpair/s, transfer 100.3 -> 35.7
        (docs/PERF.md). Counts agree with the VPU form to <=1
        boundary tie on device (tests + TPU parity run).

    Returns: (S,) float32 counts.
    """
    assert kind in ("symmetric", "transfer", "sampson",
                    "f_symmetric", "f_transfer", "f_sampson"), kind
    assert not (mxu and kind.startswith("f_")), \
        "mxu numerators are a homography-path experiment (measured loss)"
    s = Hs.shape[0]
    n = packed_pts.shape[1]
    assert s % hyp_tile == 0, (s, hyp_tile)
    assert n % pt_tile == 0, (n, pt_tile)
    h_flat = Hs.reshape(s, 9)
    thr = jnp.asarray(threshold_sq, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_count_kernel, approx_rcp=approx_rcp, kind=kind,
                          mxu=mxu),
        grid=(s // hyp_tile, n // pt_tile),
        in_specs=[
            pl.BlockSpec(
                (hyp_tile, 9), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, pt_tile), lambda i, j: (0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (hyp_tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s, 1), jnp.float32),
        interpret=interpret,
    )(h_flat, packed_pts, thr)
    return out[:, 0]


def inlier_counts_padded(Hs, x1, x2, valid, threshold_sq,
                         hyp_tile: int = 128, pt_tile: int = 1024,
                         interpret: bool = False, approx_rcp: bool = True,
                         kind: str = "symmetric", mxu: bool = False):
    """Convenience wrapper: pads S and N to tile multiples, packs points,
    returns (S,) counts for the original hypotheses."""
    s = Hs.shape[0]
    n = x1.shape[0]
    s_pad = (-s) % hyp_tile
    n_pad = (-n) % pt_tile
    if s_pad:
        Hs = jnp.concatenate(
            [Hs, jnp.broadcast_to(jnp.eye(3, dtype=Hs.dtype),
                                  (s_pad, 3, 3))]
        )
    if n_pad:
        x1 = jnp.concatenate([x1, jnp.zeros((n_pad, 2), x1.dtype)])
        x2 = jnp.concatenate([x2, jnp.zeros((n_pad, 2), x2.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((n_pad,), valid.dtype)])
    packed = pack_points(x1, x2, valid)
    counts = inlier_counts(
        Hs, packed, threshold_sq, hyp_tile=hyp_tile, pt_tile=pt_tile,
        interpret=interpret, approx_rcp=approx_rcp, kind=kind, mxu=mxu,
    )
    return counts[:s]
