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
    ap.add_argument("--candidates", type=int, default=256)
    ap.add_argument("--labels", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--window-sampling", action="store_true",
                    help="profile with cfg.window_sampling (MXU window "
                         "gather in hypothesize)")
    ap.add_argument("--no-trace", action="store_true",
                    help="skip the jax.profiler trace (stage table only)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated stage names to run (see --list)")
    ap.add_argument("--list", action="store_true",
                    help="print stage names and exit")
    ap.add_argument("--json", default=None,
                    help="write {stage: ms} results to this path")
    ap.add_argument("--isolate", action="store_true",
                    help="run each stage in its own subprocess so an XLA "
                    "compiler abort (observed: MSA CHECK-failure on one "
                    "stress-scale stage) marks that stage CRASHED instead "
                    "of killing the whole profile")
    args = ap.parse_args()

    if args.list:
        print("\n".join(STAGES))
        return
    if args.isolate:
        return run_isolated(args)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache: --isolate re-traces the same executables in
    # every per-stage subprocess; without the cache each would pay the full
    # stress-scale compile again
    cache = os.environ.get("MULTIH_JIT_CACHE",
                           os.path.join(os.path.expanduser("~"),
                                        ".cache", "multih_tpu_jit"))
    from multih_tpu.utils.cache import compile_cache_dir

    cache = compile_cache_dir(cache)
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import multih_tpu
    from multih_tpu.models import labeling, pipeline
    from multih_tpu.utils import data

    # pad to a 256 multiple (not next pow2): matches bench.py's stress
    # shape exactly (10240) and keeps the banded-operator block divisor
    n_pad = max(64, -(-args.points // 256) * 256)
    cfg = multih_tpu.MultiHConfig(
        max_points=n_pad, n_hypotheses=args.hypotheses,
        n_candidates=args.candidates, max_labels=args.labels,
        residual_chunk=args.chunk, window_sampling=args.window_sampling,
    )
    n_planes = 8 if args.points > 2048 else 3
    outl = 0.7 if args.points > 2048 else 0.15
    cs, _ = data.synthetic_scene(args.points, n_planes, outl, 0.5, seed=1)
    x1, x2, valid = multih_tpu.pad_points(cs.x1, cs.x2, None, n_pad)
    x1, x2, valid = map(jnp.asarray, (x1, x2, valid))
    key = jax.random.key(0)

    only = (set(s.strip() for s in args.only.split(","))
            if args.only else None)

    def wanted(name):
        return only is None or name.split("(")[0] in only

    f = multih_tpu.make_fit(cfg)
    if not args.no_trace or wanted("full_fit"):
        jax.block_until_ready(f(x1, x2, valid, key))  # compile

    if not args.no_trace:
        with jax.profiler.trace(args.outdir):
            for i in range(5):
                r = f(x1, x2, valid, jax.random.key(i))
            jax.block_until_ready(r)
        print(f"trace written to {args.outdir}")

    # Per-stage wall-time breakdown, scan-amortized: each stage runs REPS
    # times inside ONE jitted lax.scan with a data-dependent carry, and one
    # dispatch is blocked. This is the only reliable methodology on a
    # tunnel-attached device: per-call blocking measures the dispatch RTT
    # (~30 ms here), async loops understate (the tunnel elides/memoizes
    # repeated work), but a chained scan amortizes RTT across REPS real
    # executions of the op. Stages mirror fit()'s named scopes.
    import functools

    from multih_tpu.models import selection
    from multih_tpu.ops import geometry

    nbr_idx, nbr_w = jax.jit(
        labeling.knn_graph, static_argnums=(2, 3)
    )(x1, valid, cfg.knn_k, cfg.knn_row_block)
    n_pts = x1.shape[0]
    use_adj = (cfg.agree_block > 0 and cfg.spatial_sort
               and n_pts % cfg.agree_block == 0
               and n_pts >= 2 * cfg.agree_block)
    adj = jax.jit(
        labeling.build_banded_adjacency, static_argnums=(2,)
    )(nbr_idx, nbr_w, cfg.agree_block) if use_adj else None

    results = {}
    REPS = 16

    def scan_time(name, step, init):
        """Median-of-3 of (one blocked dispatch of REPS chained steps)."""
        if not wanted(name):
            return

        @jax.jit
        def many(c):
            out, _ = jax.lax.scan(
                lambda c, _: (step(c), ()), c, None, length=REPS
            )
            return out

        jax.block_until_ready(many(init))  # compile
        ts = []
        for i in range(3):
            init_i = jax.tree_util.tree_map(
                lambda a: a + (i + 1) * 1e-9
                if jnp.issubdtype(a.dtype, jnp.floating) else a, init
            )
            t0 = time.perf_counter()
            jax.block_until_ready(many(init_i))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        results[name] = ts[0] / REPS * 1e3
        print(f"{name:>24}: {results[name]:9.3f} ms", flush=True)

    fb = 1e-20  # feedback scale: keeps the carry chain data-dependent

    scan_time("knn_graph", lambda c: c + fb * labeling.knn_graph(
        c, valid, cfg.knn_k, cfg.knn_row_block)[1].sum(), x1)
    if cfg.sampling_motion_weight > 0:
        feat = jnp.concatenate(
            [x1, cfg.sampling_motion_weight * (x2 - x1)], axis=1
        )
        scan_time("sampling_knn", lambda c: c + fb * labeling.knn_graph(
            c, valid, cfg.knn_k, cfg.knn_row_block)[1].sum(), feat)
    if adj is not None:
        scan_time("banded_adjacency", lambda c: c + fb *
                  labeling.build_banded_adjacency(
                      nbr_idx, c, cfg.agree_block).deg.sum(), nbr_w)

    # mirror fit()'s window-sampling gate so the stage reflects the
    # production path when cfg.window_sampling is set
    wblock = (
        cfg.agree_block
        if use_adj and cfg.knn_window and cfg.window_sampling else 0
    )

    def hyp_step(c):
        Hs, ok = pipeline.generate_hypotheses(
            key, c, x2, valid, nbr_idx, cfg, window_block=wblock
        )
        return c + fb * ok.sum()
    scan_time("hypothesize(+claims)", hyp_step, x1)

    Hs, ok = jax.jit(functools.partial(
        pipeline.generate_hypotheses, cfg=cfg))(key, x1, x2, valid, nbr_idx)

    def verify_step(c):
        counts = pipeline.count_inliers(
            Hs, x1, x2, valid, cfg, tau=cfg.inlier_threshold + c * fb
        )
        return c + fb * counts[0]
    scan_time(f"verify({cfg.n_hypotheses})", verify_step, jnp.asarray(0.0))

    counts0 = jax.jit(functools.partial(pipeline.count_inliers, cfg=cfg))(
        Hs, x1, x2, valid)

    def topk_step(c):
        tc, ti = jax.lax.top_k(c, cfg.n_candidates)
        return c + fb * tc[0]
    scan_time("top_k", topk_step, counts0)

    scan_time(f"lo_refine({cfg.n_candidates})",
              lambda c: pipeline.lo_refine_candidates(
                  c, x1, x2, valid, cfg, cfg.lo_rounds),
              Hs[: cfg.n_candidates])

    thr = jnp.asarray(cfg.inlier_threshold**2, x1.dtype)
    Hs_top = jax.jit(functools.partial(
        pipeline.lo_refine_candidates, cfg=cfg, rounds=cfg.lo_rounds))(
        Hs[: cfg.n_candidates], x1, x2, valid)

    def select_step(c):
        r_top = geometry.residual_matrix(c, x1, x2, cfg.residual)
        grown = jnp.sum((r_top < thr) * valid[None, :], axis=1)
        ci, ca = selection.select_candidates(
            r_top, valid, thr, jnp.ones_like(grown),
            cfg.n_candidates, cfg.max_labels, cfg.nms_iou,
        )
        return c * (1.0 + fb * ca.sum())
    scan_time("select(NMS)", select_step, Hs_top)

    ci, ca = jax.jit(lambda h: selection.select_candidates(
        geometry.residual_matrix(h, x1, x2, cfg.residual), valid, thr,
        jnp.ones((h.shape[0],)), cfg.n_candidates, cfg.max_labels,
        cfg.nms_iou))(Hs_top)
    Hs_k = Hs_top[ci]
    r0 = geometry.residual_matrix(Hs_k, x1, x2, cfg.residual)
    # label-major (L, N) carry, matching fit()'s PEARL loop
    d0 = labeling.data_costs_t(r0, valid, thr, cfg.outlier_cost, ca)
    q0 = jax.nn.softmax(-d0 / cfg.temperature_start, axis=0)

    scan_time("pearl_iteration", lambda c: pipeline._pearl_iteration(
        c, 3, x1, x2, valid, nbr_idx, nbr_w, cfg, None, adj)[0],
        (Hs_k, ca, q0))
    if "pearl_iteration" in results:
        results[f"pearl({cfg.pearl_iterations} iters)"] = (
            results["pearl_iteration"] * cfg.pearl_iterations)

    def finalize_step(q):
        r = geometry.residual_matrix(Hs_k, x1, x2, cfg.residual)
        dct = labeling.data_costs_t(r, valid, thr, cfg.outlier_cost, ca)
        labels = labeling.best_labeling_t(
            [jnp.argmax(q, axis=0), jnp.argmin(dct, axis=0)],
            dct, nbr_idx, nbr_w, cfg.spatial_weight, cfg.icm_iterations,
            adj=adj, use_kernel=pipeline._pallas_enabled(cfg),
        )
        return q + fb * labels.sum().astype(q.dtype)
    scan_time("finalize", finalize_step, q0)

    # full fit: scan-wrapping the entire fit program crashes the XLA TPU
    # compiler (MSA CHECK-failure, reproduced at 512 pts), so time it as
    # blocked per-call dispatches minus the measured tunnel RTT (a no-op
    # device roundtrip). Valid because fit latency >> RTT at every
    # interesting scale; fresh keys defeat tunnel memoization.
    if wanted("full_fit"):
        noop = jax.jit(lambda a: a + 1.0)
        jax.block_until_ready(noop(jnp.asarray(0.0)))
        rtts = []
        for i in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(noop(jnp.asarray(float(i))))
            rtts.append(time.perf_counter() - t0)
        rtt = sorted(rtts)[len(rtts) // 2]
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x1, x2, valid, jax.random.key(i + 1)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        results["full_fit"] = max(ts[len(ts) // 2] - rtt, 0.0) * 1e3
        print(f"{'full_fit':>24}: {results['full_fit']:9.3f} ms "
              f"(RTT-corrected; rtt {rtt*1e3:.1f} ms)", flush=True)

    if only is None:
        staged = sum(v for k, v in results.items()
                     if k not in ("full_fit", "pearl_iteration"))
        print(f"{'sum of stages':>24}: {staged:9.3f} ms "
              f"(full fit {results.get('full_fit', float('nan')):.3f} ms)")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=1)
    return results


# base names acceptable to --only; each is independently derivable (inputs
# are recomputed outside the timed region), so they can run in isolation
STAGES = [
    "knn_graph", "sampling_knn", "banded_adjacency", "hypothesize",
    "verify", "top_k", "lo_refine", "select", "pearl_iteration",
    "finalize", "full_fit",
]


def run_isolated(args):
    """Per-stage subprocesses: an XLA compiler abort (SIGABRT, observed in
    memory-space assignment at the stress shape) is confined to its stage
    and reported as CRASHED; every other stage still gets a number."""
    import json
    import subprocess
    import tempfile

    results: dict = {}
    for name in STAGES:
        with tempfile.NamedTemporaryFile(suffix=".json", mode="r") as tf:
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--points", str(args.points),
                "--hypotheses", str(args.hypotheses),
                "--candidates", str(args.candidates),
                "--labels", str(args.labels),
                "--chunk", str(args.chunk),
                "--no-trace", "--only", name, "--json", tf.name,
            ]
            if args.platform:
                cmd += ["--platform", args.platform]
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800
            )
            stage_res = {}
            try:
                stage_res = json.load(open(tf.name))
            except (json.JSONDecodeError, OSError):
                pass
        if proc.returncode != 0 and not stage_res:
            results[name] = None
            tail = proc.stderr.strip().splitlines()[-1:] or ["?"]
            print(f"{name:>24}:   CRASHED (rc={proc.returncode}; "
                  f"{tail[0][:100]})", flush=True)
        else:
            results.update(stage_res)
            for k, v in stage_res.items():
                print(f"{k:>24}: {v:9.3f} ms", flush=True)
    ok = {k: v for k, v in results.items() if v is not None}
    staged = sum(v for k, v in ok.items()
                 if k.split("(")[0] not in ("full_fit", "pearl_iteration"))
    print(f"{'sum of stages':>24}: {staged:9.3f} ms "
          f"(full fit {ok.get('full_fit', float('nan')):9.3f} ms)")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=1)
    return results


if __name__ == "__main__":
    main()
