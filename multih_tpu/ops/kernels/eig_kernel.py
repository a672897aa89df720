"""Pallas TPU kernel: batched smallest-eigenvector of 9x9 SPD matrices.

The refit path's eigensolver (`geometry.jacobi_eigh_small`, 6 cyclic
Jacobi sweeps) compiles under vmap to ~1300 sequential tiny updates on
(C, 9, 9) arrays whose 9-wide minor dims pad to 128 lanes — the same
layout disease the DLT kernel (dlt_kernel.py) cured for minimal solves.
Here the BATCH rides the (sublane, lane) axes: A's 45 unique entries and
V's 81 entries live as (8, 128) registers, and all 216 rotations run
unrolled in VMEM. Rotations use the classic trig-free Jacobi tangent
formula (t = sign(theta)/(|theta| + sqrt(theta^2+1)); Golub & Van Loan
§8.4) instead of arctan2 — algebraically the same rotation, so
eigenvectors agree with the jnp reference to fp32 rotation noise
(parity-tested; sign canonicalized by the caller's convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SB = 8
_LANES = 128
TILE = _SB * _LANES
_N = 9
# upper-triangle (incl. diagonal) index order for the packed input
_TRI = [(i, j) for i in range(_N) for j in range(i, _N)]  # 45 entries


def _eig_kernel(a_ref, out_ref, *, sweeps: int):
    # unpack the 45 unique entries into a full symmetric register matrix
    tri = {}
    for idx, (i, j) in enumerate(_TRI):
        tri[(i, j)] = a_ref[idx, :, :]
    A = [[tri[(min(i, j), max(i, j))] for j in range(_N)]
         for i in range(_N)]
    best_col = jacobi_smallest_column(A, sweeps)
    for k in range(_N):
        out_ref[k, :, :] = best_col[k]


def jacobi_smallest_column(A, sweeps: int):
    """The kernel's math on any array type: A is a 9x9 nested list of
    same-shaped arrays (each array = one matrix entry across the batch);
    returns the 9 components of the eigenvector of the smallest
    eigenvalue. Shared between the Pallas kernel (entries are (8, 128)
    registers) and the plain-jnp parity tests (entries are (C,) arrays) —
    interpret-mode is too slow for the ~17k unrolled ops, so tests verify
    the identical computation through XLA instead."""
    one = jnp.ones_like(A[0][0])
    zero = jnp.zeros_like(A[0][0])
    V = [[one if i == j else zero for j in range(_N)] for i in range(_N)]

    eps = jnp.float32(1e-30)
    for _ in range(sweeps):
        for p in range(_N - 1):
            for q in range(p + 1, _N):
                app, aqq, apq = A[p][p], A[q][q], A[p][q]
                # trig-free rotation zeroing A[p][q]
                theta = (aqq - app) / (2.0 * jnp.where(
                    jnp.abs(apq) < eps, eps, apq))
                # not jnp.sign: sign(0) = 0 would yield t = 0 (identity)
                # at exactly-degenerate diagonals (aqq == app), leaving the
                # pivot unzeroed; the correct rotation at theta = 0 is 45deg
                sgn = jnp.where(theta >= 0.0, 1.0, -1.0)
                t = sgn / (
                    jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0)
                )
                t = jnp.where(jnp.abs(apq) < eps, 0.0, t)
                c = jax.lax.rsqrt(t * t + 1.0)
                s = t * c
                # A <- G^T A G on rows/cols p, q (symmetric update)
                for k in range(_N):
                    if k in (p, q):
                        continue
                    akp, akq = A[k][p], A[k][q]
                    nkp = c * akp - s * akq
                    nkq = s * akp + c * akq
                    A[k][p] = nkp
                    A[p][k] = nkp
                    A[k][q] = nkq
                    A[q][k] = nkq
                napp = c * c * app - 2.0 * s * c * apq + s * s * aqq
                naqq = s * s * app + 2.0 * s * c * apq + c * c * aqq
                A[p][p] = napp
                A[q][q] = naqq
                A[p][q] = zero
                A[q][p] = zero
                # V <- V G
                for k in range(_N):
                    vkp, vkq = V[k][p], V[k][q]
                    V[k][p] = c * vkp - s * vkq
                    V[k][q] = s * vkp + c * vkq

    # select the eigenvector column with the smallest diagonal entry
    best_val = A[0][0]
    best_col = [V[k][0] for k in range(_N)]
    for j in range(1, _N):
        take = A[j][j] < best_val
        best_val = jnp.where(take, A[j][j], best_val)
        for k in range(_N):
            best_col[k] = jnp.where(take, V[k][j], best_col[k])
    return best_col


@functools.partial(jax.jit, static_argnames=("sweeps", "interpret"))
def _eig_packed(packed: jax.Array, sweeps: int = 6,
                interpret: bool = False) -> jax.Array:
    """(45, C) upper-tri packed SPD matrices -> (9, C) unit eigenvectors
    of the smallest eigenvalue; C a multiple of TILE."""
    c = packed.shape[1]
    assert c % TILE == 0, (c, TILE)
    nb = c // _LANES
    p3 = packed.reshape(45, nb, _LANES)
    out = pl.pallas_call(
        functools.partial(_eig_kernel, sweeps=sweeps),
        grid=(c // TILE,),
        in_specs=[
            pl.BlockSpec(
                (45, _SB, _LANES), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (9, _SB, _LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((9, nb, _LANES), jnp.float32),
        interpret=interpret,
    )(p3)
    return out.reshape(9, c)


def smallest_eigvec_9x9_batch(
    ata: jax.Array, sweeps: int = 6, interpret: bool = False
) -> jax.Array:
    """Batched drop-in for `geometry.smallest_eigvec_9x9` (jacobi method):
    (C, 9, 9) symmetric -> (C, 9) unit eigenvectors. Pads C internally."""
    cnum = ata.shape[0]
    pad = (-cnum) % TILE
    if pad:
        eye = jnp.broadcast_to(jnp.eye(_N, dtype=ata.dtype), (pad, _N, _N))
        ata = jnp.concatenate([ata, eye])
    rows = jnp.stack(
        [ata[:, i, j] for (i, j) in _TRI], axis=0
    ).astype(jnp.float32)  # (45, C')
    v = _eig_packed(rows, sweeps=sweeps, interpret=interpret)  # (9, C')
    v = v.T  # (C', 9)
    norm = jnp.maximum(
        jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True)), 1e-12
    )
    return (v / norm)[:cnum]


def smallest_eigvec_9x9_batch_jnp(ata: jax.Array, sweeps: int = 6):
    """The kernel's exact computation through XLA (no Pallas): the CPU
    reference path and the parity oracle for the kernel itself."""
    A = [[ata[:, i, j] for j in range(_N)] for i in range(_N)]
    col = jacobi_smallest_column(A, sweeps)
    v = jnp.stack(col, axis=1)  # (C, 9)
    norm = jnp.maximum(
        jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True)), 1e-12
    )
    return v / norm
