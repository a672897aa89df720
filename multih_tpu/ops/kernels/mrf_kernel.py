"""Fused Pallas MRF kernels: the whole PEARL labeling relaxation in one
launch per call (SURVEY.md §7 stage 7, docs/PERF.md "Remaining headroom").

The jnp path spends the PEARL loop across ~450 small fusions (~0.05-0.08
ms of launch+HBM round trip each, 17.2 ms per stress fit measured by
trace): every mean-field sweep and ICM half-sweep re-reads q / the labels
from HBM, runs one band matmul, and writes back. These kernels keep the
state RESIDENT IN VMEM across all sweeps — only the banded adjacency
streams from HBM, once per sweep — so a 6-sweep mean-field call or a
4-half-sweep batched ICM call is ONE kernel launch bounded by band
bandwidth (~16 MB/sweep at stress shape, bf16).

Structure (both kernels):
  grid = (n_sweeps + 1, nb)   # sweep-major, Morton block minor
  sweep 0        : load the initial state into VMEM scratch, zero halos
  sweeps 1..S    : for each block b, agree = q[window(b)] @ band[b]^T on
                   the MXU, then the pointwise update; double-buffered
                   scratch (read sweep parity s%2, write the other) keeps
                   the update synchronous — bit-for-bit the same math as
                   labeling.mean_field / labeling._icm_batch (tested).

The state scratch is (rows, N + 2*block) with a zero/-1 halo block on
each side, so block b's 3-block window is a static-size dynamic slice
[b*B, b*B + 3B) with no wraparound branches — exactly mirroring the
jnp path's jnp.roll windows, whose wrap rows only ever hit zero band
entries.

REQUIRES a far-edge-free banded adjacency (labeling.knn_graph_windowed
builds one by construction). Far edges would need gather/scatter inside
the sweep; the windowed graph removes them from the problem instead.

The reference equivalent of everything here is gco-v3.0 alpha-expansion
(SURVEY.md §2 C9-C11); the relaxation it accelerates is the TPU
replacement specified in BASELINE.json:5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mf_kernel(inv_temps_ref, q0_ref, base_ref, band_ref, out_ref,
               qa, qb, *, nb, block, n_labels, sw):
    s = pl.program_id(0)
    b = pl.program_id(1)
    bb = 3 * block
    l = n_labels

    @pl.when(s == 0)
    def _load():
        blk = q0_ref[...]
        qa[:, pl.ds((b + 1) * block, block)] = blk
        out_ref[...] = blk

        @pl.when(b == 0)
        def _():  # halos: zero contribution, written once
            z = jnp.zeros((l, block), jnp.float32)
            qa[:, 0:block] = z
            qb[:, 0:block] = z
            qa[:, pl.ds((nb + 1) * block, block)] = z
            qb[:, pl.ds((nb + 1) * block, block)] = z

    def sweep(src, dst):
        win = src[:, pl.ds(b * block, bb)]              # (L, 3B)
        band = band_ref[0].astype(jnp.float32)          # (B, 3B)
        agree = jax.lax.dot_general(
            win, band, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # match the jnp einsum
        )                                               # (L, B)
        # pairwise expected cost folded as base - sw*agree, where
        # base = dcost^T + sw*deg (built by the caller)
        z = -(base_ref[...] - sw * agree) * inv_temps_ref[0, s]
        z = z - jnp.max(z, axis=0, keepdims=True)
        e = jnp.exp(z)
        qn = e / jnp.sum(e, axis=0, keepdims=True)
        dst[:, pl.ds((b + 1) * block, block)] = qn
        out_ref[...] = qn

    @pl.when((s > 0) & (s % 2 == 1))
    def _odd():
        sweep(qa, qb)

    @pl.when((s > 0) & (s % 2 == 0))
    def _even():
        sweep(qb, qa)


@functools.partial(
    jax.jit, static_argnames=("spatial_weight", "interpret")
)
def mean_field_fused(q0_t: jax.Array, base_t: jax.Array, band: jax.Array,
                     inv_temps: jax.Array, spatial_weight: float,
                     interpret: bool = False) -> jax.Array:
    """All annealed mean-field sweeps in one launch.

    q0_t:   (L, N) float32 — initial marginals, label-major.
    base_t: (L, N) float32 — dcost^T + spatial_weight * deg^T.
    band:   (nb, B, 3B) banded adjacency (bf16 or f32).
    inv_temps: (S,) float32 — 1/temperature per sweep.
    Returns (L, N) float32 marginals after S sweeps — same math as
    labeling.mean_field's scan body (parity-tested).
    """
    l, n = q0_t.shape
    nb, block, bb = band.shape
    assert bb == 3 * block and nb * block == n, (band.shape, n)
    n_sweeps = inv_temps.shape[0]
    # index s in the kernel runs 1..S; slot 0 is the (unused) load pass
    inv_pad = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), inv_temps.astype(jnp.float32)]
    ).reshape(1, n_sweeps + 1)

    return pl.pallas_call(
        functools.partial(
            _mf_kernel, nb=nb, block=block, n_labels=l,
            sw=float(spatial_weight),
        ),
        grid=(n_sweeps + 1, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((l, block), lambda s, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, block), lambda s, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, bb), lambda s, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l, block), lambda s, b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((l, n + 2 * block), jnp.float32),
            pltpu.VMEM((l, n + 2 * block), jnp.float32),
        ],
        interpret=interpret,
    )(inv_pad, q0_t, base_t, band)


def _safe_w(w):
    """geometry.from_homogeneous's w-guard (points at infinity map far
    away, not to NaN) — same constant, same sign convention."""
    return jnp.where(jnp.abs(w) < 1e-12,
                     jnp.where(w < 0, -1e-12, 1e-12), w)


def _mf_front_kernel(inv_temps_ref, thr_ref, q0_ref, pts_ref, hm_ref,
                     band_ref, out_ref, dct_ref, r_ref, qa, qb, base_s,
                     r_s, *, nb, block, n_labels, sw, oc, kind):
    s = pl.program_id(0)
    b = pl.program_id(1)
    bb = 3 * block
    l = n_labels
    k = l - 1

    @pl.when(s == 0)
    def _load():
        blk = q0_ref[...]
        qa[:, pl.ds((b + 1) * block, block)] = blk
        out_ref[...] = blk

        @pl.when(b == 0)
        def _():  # halos: zero contribution, written once
            z = jnp.zeros((l, block), jnp.float32)
            qa[:, 0:block] = z
            qb[:, 0:block] = z
            qa[:, pl.ds((nb + 1) * block, block)] = z
            qb[:, pl.ds((nb + 1) * block, block)] = z

        # fused residual + data-cost front (docs/PERF.md "Remaining
        # headroom"): the per-iteration (K, N) residual matrix and the
        # truncated-quadratic costs are computed HERE, in the load pass,
        # instead of as a separate XLA fusion chain — one HBM pass over
        # the points replaces residual-matrix + data-cost + base-build
        # dispatches, and the sweeps read base from VMEM scratch instead
        # of streaming (L, N) from HBM every sweep.
        p = pts_ref[...]                         # (8, B)
        h = hm_ref[...].astype(jnp.float32)      # (L, 19)
        x, y = p[0:1], p[1:2]
        u, v = p[2:3], p[3:4]

        def hc(j):
            return h[:, j:j + 1]                 # (L, 1)

        # forward transfer ||pi(H x1) - x2||^2 (geometry.transfer_error_sq)
        w1 = _safe_w(hc(6) * x + hc(7) * y + hc(8))
        px = (hc(0) * x + hc(1) * y + hc(2)) / w1
        py = (hc(3) * x + hc(4) * y + hc(5)) / w1
        r_l = (px - u) ** 2 + (py - v) ** 2      # (L, B)
        if kind == "symmetric":
            # backward via the adjugate rows (cols 9..17), scale-free
            w2 = _safe_w(hc(15) * u + hc(16) * v + hc(17))
            bx = (hc(9) * u + hc(10) * v + hc(11)) / w2
            by = (hc(12) * u + hc(13) * v + hc(14)) / w2
            r_l = r_l + (bx - x) ** 2 + (by - y) ** 2

        # labeling.data_costs_t, same op order: truncated quadratic,
        # inactive-label penalty, outlier row, valid mask
        thr = thr_ref[0, 0]
        act = h[:, 18:19]
        plane = jnp.minimum(r_l / thr, 8.0) * oc + (1.0 - act) * 1e6
        row = jax.lax.broadcasted_iota(jnp.int32, (l, block), 0)
        dct = jnp.where(row < k, plane, oc) * p[4:5]
        base = dct + p[5:6]                      # + sw * deg (row 5)
        base_s[:, pl.ds(b * block, block)] = base
        r_s[:, pl.ds(b * block, block)] = r_l[0:k]
        dct_ref[...] = dct
        r_ref[...] = r_l[0:k]

    def sweep(src, dst):
        win = src[:, pl.ds(b * block, bb)]              # (L, 3B)
        band = band_ref[0].astype(jnp.float32)          # (B, 3B)
        agree = jax.lax.dot_general(
            win, band, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # match the jnp einsum
        )                                               # (L, B)
        base = base_s[:, pl.ds(b * block, block)]
        z = -(base - sw * agree) * inv_temps_ref[0, s]
        z = z - jnp.max(z, axis=0, keepdims=True)
        e = jnp.exp(z)
        qn = e / jnp.sum(e, axis=0, keepdims=True)
        dst[:, pl.ds((b + 1) * block, block)] = qn
        out_ref[...] = qn
        # the dct / r output buffers flush to HBM after EVERY grid step
        # (their block index changes with b), so keep them valid from the
        # scratch copies on sweep steps too
        dct_ref[...] = base - pts_ref[5:6, :]
        r_ref[...] = r_s[:, pl.ds(b * block, block)]

    @pl.when((s > 0) & (s % 2 == 1))
    def _odd():
        sweep(qa, qb)

    @pl.when((s > 0) & (s % 2 == 0))
    def _even():
        sweep(qb, qa)


@functools.partial(
    jax.jit,
    static_argnames=("spatial_weight", "outlier_cost", "kind", "interpret"),
)
def mean_field_fused_front(
    q0_t: jax.Array, pts: jax.Array, hm: jax.Array, band: jax.Array,
    inv_temps: jax.Array, thr: jax.Array, spatial_weight: float,
    outlier_cost: float, kind: str = "symmetric", interpret: bool = False,
):
    """`mean_field_fused` with the residual + data-cost chain fused into
    the load pass (homography transfer / symmetric kinds).

    q0_t: (L, N) float32 — initial marginals, label-major.
    pts:  (8, N) float32 — rows [x1x, x1y, x2x, x2y, valid, sw*deg, 0, 0].
    hm:   (L, 19) float32 — per-label [H row-major (9), adj(H) row-major
          (9), active (1)]; row L-1 (the outlier row) all zeros.
    band: (nb, B, 3B) banded adjacency. thr: squared inlier threshold
    (traced scalar). Returns (q, dct, r): the post-sweep marginals plus
    the (L, N) data costs and (K, N) squared residuals the front
    computed — the rest of the PEARL iteration consumes them without
    recomputation. Same math as geometry.residual_matrix ->
    labeling.data_costs_t -> mean_field_t (parity-tested; the residual
    is VPU multiply-add instead of the MXU einsum, so r agrees to float32
    rounding rather than bit-exactly).
    """
    l, n = q0_t.shape
    k = l - 1
    nb, block, bb = band.shape
    assert bb == 3 * block and nb * block == n, (band.shape, n)
    assert hm.shape == (l, 19), hm.shape
    n_sweeps = inv_temps.shape[0]
    inv_pad = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), inv_temps.astype(jnp.float32)]
    ).reshape(1, n_sweeps + 1)
    thr2 = jnp.asarray(thr, jnp.float32).reshape(1, 1)

    return pl.pallas_call(
        functools.partial(
            _mf_front_kernel, nb=nb, block=block, n_labels=l,
            sw=float(spatial_weight), oc=float(outlier_cost), kind=kind,
        ),
        grid=(n_sweeps + 1, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((l, block), lambda s, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda s, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, 19), lambda s, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, bb), lambda s, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((l, block), lambda s, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, block), lambda s, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block), lambda s, b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((l, n), jnp.float32),
            jax.ShapeDtypeStruct((l, n), jnp.float32),
            jax.ShapeDtypeStruct((k, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((l, n + 2 * block), jnp.float32),
            pltpu.VMEM((l, n + 2 * block), jnp.float32),
            pltpu.VMEM((l, n), jnp.float32),
            pltpu.VMEM((k, n), jnp.float32),
        ],
        interpret=interpret,
    )(inv_pad, thr2, q0_t, pts, hm, band)


def _icm_kernel(lab0_ref, base_ref, band_ref, out_ref, la, lb,
                *, nb, block, n_labels, n_starts, sw):
    s = pl.program_id(0)
    b = pl.program_id(1)
    bb = 3 * block
    l, ns = n_labels, n_starts

    @pl.when(s == 0)
    def _load():
        blk = lab0_ref[...]
        la[:, pl.ds((b + 1) * block, block)] = blk
        out_ref[...] = blk

        @pl.when(b == 0)
        def _():  # halo label -1 never matches any one-hot row
            m = jnp.full((ns, block), -1, jnp.int32)
            la[:, 0:block] = m
            lb[:, 0:block] = m
            la[:, pl.ds((nb + 1) * block, block)] = m
            lb[:, pl.ds((nb + 1) * block, block)] = m

    def half(src, dst):
        par = (s - 1) % 2
        lab_win = src[:, pl.ds(b * block, bb)]            # (S, 3B)
        ids_w = jax.lax.broadcasted_iota(jnp.int32, (ns, l, bb), 1)
        oh = (lab_win[:, None, :] == ids_w).astype(jnp.float32)
        band = band_ref[0].astype(jnp.float32)            # (B, 3B)
        agree = jax.lax.dot_general(
            oh.reshape(ns * l, bb), band, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # match the jnp einsum
        ).reshape(ns, l, block)
        cost = base_ref[...][None] - sw * agree           # (S, L, B)

        # label argmin, unrolled compare-select (first-minimum ties,
        # identical to labeling._icm_batch)
        new_c = cost[:, 0]
        new = jnp.zeros((ns, block), jnp.int32)
        for lab in range(1, l):
            take = cost[:, lab] < new_c
            new_c = jnp.where(take, cost[:, lab], new_c)
            new = jnp.where(take, jnp.full_like(new, lab), new)

        cur = src[:, pl.ds((b + 1) * block, block)]       # (S, B)
        ids_b = jax.lax.broadcasted_iota(jnp.int32, (ns, l, block), 1)
        cur_oh = (cur[:, None, :] == ids_b).astype(jnp.float32)
        cur_c = jnp.sum(cur_oh * cost, axis=1)            # (S, B)

        col_par = (
            jax.lax.broadcasted_iota(jnp.int32, (ns, block), 1)
            + b * block
        ) % 2
        move = (new_c < cur_c - 1e-6) & (col_par == par)
        upd = jnp.where(move, new, cur)
        dst[:, pl.ds((b + 1) * block, block)] = upd
        out_ref[...] = upd

    @pl.when((s > 0) & (s % 2 == 1))
    def _odd():
        half(la, lb)

    @pl.when((s > 0) & (s % 2 == 0))
    def _even():
        half(lb, la)


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "spatial_weight", "interpret"),
)
def icm_fused(labels0: jax.Array, base_t: jax.Array, band: jax.Array,
              iterations: int, spatial_weight: float,
              interpret: bool = False) -> jax.Array:
    """All red-black ICM half-sweeps of all S restarts in one launch.

    labels0: (S, N) int32 start labelings.
    base_t:  (L, N) float32 — dcost^T + spatial_weight * deg^T.
    band:    (nb, B, 3B) banded adjacency.
    Returns (S, N) int32 — same math as the fori_loop core of
    labeling._icm_batch (the constant-labeling escape stays with the
    caller; parity-tested). 2*iterations half-sweeps, parity 0 first.
    """
    ns, n = labels0.shape
    l = base_t.shape[0]
    nb, block, bb = band.shape
    assert bb == 3 * block and nb * block == n, (band.shape, n)

    return pl.pallas_call(
        functools.partial(
            _icm_kernel, nb=nb, block=block, n_labels=l, n_starts=ns,
            sw=float(spatial_weight),
        ),
        grid=(2 * iterations + 1, nb),
        in_specs=[
            pl.BlockSpec((ns, block), lambda s, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, block), lambda s, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, bb), lambda s, b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ns, block), lambda s, b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, n), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((ns, n + 2 * block), jnp.int32),
            pltpu.VMEM((ns, n + 2 * block), jnp.int32),
        ],
        interpret=interpret,
    )(labels0.astype(jnp.int32), base_t, band)
