"""Profiling harness (SURVEY.md §5 'tracing/profiling'): capture a
jax.profiler trace of the full fit — stages are visible as named scopes
(knn_graph / hypothesize / verify / lo_refine / select / pearl / finalize).

Usage:
    python benchmarks/profile_fit.py [--outdir /tmp/multih_trace]
    # then: tensorboard --logdir /tmp/multih_trace   (or xprof)

Also prints a coarse per-stage wall-time breakdown measured by
re-jitting each stage in isolation (useful without a trace viewer).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/multih_trace")
    ap.add_argument("--points", type=int, default=480)
    ap.add_argument("--hypotheses", type=int, default=2048)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import multih_tpu
    from multih_tpu.models import labeling, pipeline
    from multih_tpu.utils import data

    n_pad = 1 << max(6, (args.points - 1).bit_length())
    cfg = multih_tpu.MultiHConfig(
        max_points=n_pad, n_hypotheses=args.hypotheses
    )
    cs, _ = data.synthetic_scene(args.points, 3, 0.15, 0.5, seed=1)
    x1, x2, valid = multih_tpu.pad_points(cs.x1, cs.x2, None, n_pad)
    x1, x2, valid = map(jnp.asarray, (x1, x2, valid))
    key = jax.random.key(0)

    f = multih_tpu.make_fit(cfg)
    jax.block_until_ready(f(x1, x2, valid, key))  # compile

    # full trace
    with jax.profiler.trace(args.outdir):
        for i in range(5):
            r = f(x1, x2, valid, jax.random.key(i))
        jax.block_until_ready(r)
    print(f"trace written to {args.outdir}")

    # coarse stage breakdown (each stage jitted standalone)
    nbr_idx, nbr_w = jax.jit(
        labeling.knn_graph, static_argnums=2
    )(x1, valid, cfg.knn_k)

    def timed(name, fn, *a, **k):
        out = jax.block_until_ready(fn(*a, **k))  # compile
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*a, **k)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"{name:>24}: {dt*1e3:8.3f} ms")
        return out

    import functools

    gen = jax.jit(functools.partial(
        pipeline.generate_hypotheses, cfg=cfg))
    Hs, ok = timed("hypothesize(+claims)", gen, key, x1, x2, valid, nbr_idx)
    cnt = jax.jit(functools.partial(pipeline.count_inliers, cfg=cfg))
    timed("verify(counts)", cnt, Hs, x1, x2, valid)
    lo = jax.jit(functools.partial(
        pipeline.lo_refine_candidates, cfg=cfg, rounds=cfg.lo_rounds))
    timed("lo_refine(256)", lo, Hs[: cfg.n_candidates], x1, x2, valid)
    timed("knn_graph", jax.jit(labeling.knn_graph, static_argnums=2),
          x1, valid, cfg.knn_k)
    timed("full fit", f, x1, x2, valid, key)


if __name__ == "__main__":
    main()
