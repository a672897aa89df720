"""A/B: MXU row-numerators vs VPU broadcast chains in the count kernel.

Measures `residual_kernel.inlier_counts(..., mxu=)` at the stress sweep
shape (102 400 hyp x 10 240 pts) with the memoization-proof chained-tau
methodology of bench.py::bench_verification_kernel (the dev tunnel
caches bitwise-identical dispatches, so the threshold must change every
iteration), plus an on-device count-parity check for every residual
kind.

Measured on TPU v5e (2026-08, recorded in docs/PERF.md): the MXU form
is a ~3x LOSS — symmetric 59.7 -> 19.4 Gpair/s, transfer 100.3 -> 35.7.
The contraction is intrinsically K=3 (homogeneous coordinates), so the
128x128 systolic array runs at 3/128 utilization and the HIGHEST
precision the pixel threshold demands multiplies passes. Kept as the
reproducible waiver for why the VPU form is the production form.
"""
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from multih_tpu.ops.kernels import residual_kernel

S, N = 102400, 10240


def make_inputs():
    rng = np.random.default_rng(0)
    H = np.eye(3)[None] + rng.normal(0, 0.1, (S, 3, 3))
    H[:, 2, :2] = rng.normal(0, 3e-4, (S, 2))
    H = (H / np.linalg.norm(H, axis=(1, 2), keepdims=True)).astype(np.float32)
    x1 = rng.uniform(0, 640, (N, 2)).astype(np.float32)
    x2 = rng.uniform(0, 640, (N, 2)).astype(np.float32)
    valid = np.ones((N,), np.float32)
    packed = residual_kernel.pack_points(
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(valid)
    )
    return jnp.asarray(H), jax.block_until_ready(packed)


def bench(Hs, packed, kind, mxu, iters=8, reps=2):
    @jax.jit
    def sweep(thr):
        c = residual_kernel.inlier_counts(
            Hs, packed, thr, hyp_tile=256, pt_tile=2048, kind=kind, mxu=mxu
        )
        return c, thr + c[0] * 1e-12  # chained: never bitwise-identical

    thr = jnp.asarray(2500.0, jnp.float32)
    c, thr = sweep(thr)
    jax.block_until_ready(thr)
    best = float("inf")
    for rep in range(reps + 1):  # rep 0 = warm-up
        t0 = time.perf_counter()
        for _ in range(iters):
            c, thr = sweep(thr)
        jax.block_until_ready(c)
        dt = (time.perf_counter() - t0) / iters
        if rep > 0:
            best = min(best, dt)
    print(
        f"kind={kind:9s} mxu={int(mxu)}: {best * 1e3:7.2f} ms "
        f"{S * N / best / 1e9:7.1f} Gpair/s"
    )


def parity(Hs, packed, kind):
    thr = jnp.asarray(600.0 if kind == "sampson" else 2500.0, jnp.float32)
    a = residual_kernel.inlier_counts(
        Hs[:4096], packed, thr, kind=kind, mxu=False, approx_rcp=False
    )
    b = residual_kernel.inlier_counts(
        Hs[:4096], packed, thr, kind=kind, mxu=True, approx_rcp=False
    )
    d = np.abs(np.asarray(a) - np.asarray(b))
    print(f"parity kind={kind}: max |dcount| = {d.max():.0f}, "
          f"mean {d.mean():.4f}")


if __name__ == "__main__":
    Hs, packed = make_inputs()
    for kind in ("symmetric", "transfer"):
        for mxu in (False, True):
            bench(Hs, packed, kind, mxu)
    for kind in ("symmetric", "transfer", "sampson"):
        parity(Hs, packed, kind)
