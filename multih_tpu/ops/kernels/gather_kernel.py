"""Pallas TPU kernel: window-local gather as a one-hot MXU contraction.

The stress fit's largest single cost after the round-3 kernels is the
minimal-sample coordinate gather: one XLA row gather of 4S = 409 600
indices from a packed (N, 8) array, which is per-index-latency bound at
~4.4 ms (docs/PERF.md "Remaining headroom"). TPU has no per-lane gather,
but it has an MXU: when every index is known to lie inside a 3-block
Morton window (window-stratified sampling, `sampling.windowed_quadruples`),
the gather over N collapses to, per window, a one-hot (3B, T) matrix
contracted against the window's (3B, C) source rows —

    out[v] = win[v]^T @ onehot(sel[v])        # (C, T)

~5 GFLOP total at stress shape instead of 409 600 serialized index
lookups. The one-hot never touches HBM: it is built in VMEM from an
iota/compare per grid step and consumed immediately by the dot.

Two selection modes (static `mode` param):
  - "index": sel[v, t] is a window-local row index in [0, 3B); the
    one-hot is (iota == sel). Out-of-range sel selects nothing -> the
    output column is all-zero (callers treat a zero avail channel as
    "discard", matching the gather path's uses_pad contract).
  - "rank": sel[v, t] is a rank among the window's AVAILABLE rows; the
    source must carry an availability channel and its inclusive cumsum
    (avail_ch / cum_ch), and the one-hot is (avail > 0) & (cum == r+1)
    — i.e. "the r-th available row". Ranks >= the window's avail count
    select nothing (all-zero column), so exhausted windows degrade to
    discarded samples, never to wrong ones.

The jnp reference (`window_gather_reference`, used on CPU and in parity
tests) implements the same contract with searchsorted + take_along_axis.

Reference equivalent: the CUDA framework gathers minimal samples with
native per-thread loads (SURVEY.md §3.2); this is the TPU-shaped
replacement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# lane tile of selections per grid step; 3B=768 rows x 512 lanes of f32
# one-hot is 1.5 MB VMEM
_TT = 512


def _gather_kernel(win_ref, sel_ref, out_ref, *, mode, avail_ch, cum_ch):
    win = win_ref[0]                      # (3B, C) f32
    sel = sel_ref[0]                      # (1, TT) int32
    rows = win.shape[0]
    if mode == "index":
        iota = jax.lax.broadcasted_iota(jnp.int32, (rows, sel.shape[1]), 0)
        oh = iota == sel                  # (3B, TT)
    else:
        a = win[:, avail_ch][:, None]     # (3B, 1)
        c = win[:, cum_ch][:, None]
        r1 = sel.astype(jnp.float32) + 1.0
        oh = (a > 0.0) & (c == r1)        # exactly the r-th available row
    # HIGHEST: the MXU's default bf16 pass rounds win's mantissa (8 bits)
    # and the gather must be bit-exact — with bf16x3 each fp32 source row
    # times an exact 0/1 one-hot column reassembles exactly.
    out_ref[0] = jax.lax.dot_general(
        win, oh.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                      # (C, TT)


@functools.partial(jax.jit, static_argnames=("mode", "avail_ch", "cum_ch",
                                             "interpret"))
def window_gather(win_src: jax.Array, sel: jax.Array, mode: str = "index",
                  avail_ch: int = 4, cum_ch: int = 5,
                  interpret: bool = False) -> jax.Array:
    """win_src: (nb, 3B, C) f32, sel: (nb, T) int32 -> (nb, C, T) f32.

    T must be a multiple of 512 (pad with -1 selections: they select
    nothing and produce zero columns). C is the lane-free minor: the
    output keeps selections on lanes, channels on sublanes — the layout
    the DLT kernel's (16, S) packing consumes directly."""
    nb, rows, c = win_src.shape
    t = sel.shape[1]
    assert sel.shape[0] == nb and t % _TT == 0, (win_src.shape, sel.shape)
    kern = functools.partial(
        _gather_kernel, mode=mode, avail_ch=avail_ch, cum_ch=cum_ch
    )
    # sel rides as (nb, 1, T): Mosaic requires the block's sublane dim to
    # be a multiple of 8 OR equal to the array dim — a (1, TT) block over
    # (nb, T) violates that whenever nb % 8 != 0, while (1, 1, TT) over
    # (nb, 1, T) always satisfies it (sublane block 1 == array dim 1).
    return pl.pallas_call(
        kern,
        grid=(nb, t // _TT),
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda v, j: (v, 0, 0)),
            pl.BlockSpec((1, 1, _TT), lambda v, j: (v, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, c, _TT), lambda v, j: (v, 0, j)),
        out_shape=jax.ShapeDtypeStruct((nb, c, t), jnp.float32),
        interpret=interpret,
    )(win_src, sel.astype(jnp.int32)[:, None, :])


def window_gather_reference(win_src: jax.Array, sel: jax.Array,
                            mode: str = "index", avail_ch: int = 4,
                            cum_ch: int = 5) -> jax.Array:
    """jnp reference with identical semantics (CPU path / parity oracle)."""
    nb, rows, _ = win_src.shape
    if mode == "index":
        idx = sel
        ok = (sel >= 0) & (sel < rows)
    else:
        cum = win_src[:, :, cum_ch]
        # first row with cum >= r+1 is exactly the r-th available row
        idx = jax.vmap(
            lambda cv, rv: jnp.searchsorted(cv, rv.astype(cv.dtype) + 0.5)
        )(cum, sel)
        # rank past the window's avail count selects nothing
        total = cum[:, -1]
        ok = (sel >= 0) & (idx < rows) & (
            sel.astype(cum.dtype) < total[:, None]
        )
    g = jnp.take_along_axis(
        win_src, jnp.clip(idx, 0, rows - 1)[:, :, None], axis=1
    )                                      # (nb, T, C)
    g = jnp.where(ok[:, :, None], g, 0.0)
    return jnp.swapaxes(g, 1, 2)           # (nb, C, T)
