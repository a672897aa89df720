"""Run the TPU pipeline over the benchmark suite and report per-scene
misclassification vs. the CPU-reference goldens (BASELINE.json:9 report).

The whole suite runs as ONE batched device call (SURVEY.md §2 P4): every
scene padded into a single bucket, per-scene inlier thresholds as a traced
tau vector, vmapped fit sharded over the mesh's pair axis — one compile,
one dispatch. --per-pair restores the old loop (per-bucket recompiles) for
debugging individual scenes.

Usage: python benchmarks/run_suite.py [--platform cpu] [--hypotheses 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks import suite  # noqa: E402


def run_batched(args, scenes):
    import jax  # noqa: F401

    import multih_tpu
    from multih_tpu.parallel import sharding
    from multih_tpu.utils import evaluation

    css = [cs for cs, _ in scenes]
    taus = [suite.tau_for_noise(row[4]) for row in suite.SUITE]
    n_max = max(cs.n_points for cs in css)
    n_pad = 1 << max(6, (n_max - 1).bit_length())
    cfg = multih_tpu.MultiHConfig(
        max_points=n_pad, n_hypotheses=args.hypotheses,
        use_pallas=not args.no_pallas,
    )
    mesh = sharding.make_mesh()
    # upload once: per-call host->device transfer dominates wall time on
    # remotely-attached devices
    prepared = sharding.prepare_benchmark_batch(css, cfg, mesh, taus=taus)
    t0 = time.perf_counter()
    res = sharding.run_benchmark_batch(
        css, cfg, mesh=mesh, seed=0, adaptive=args.adaptive,
        prepared=prepared,
    )
    wall_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = sharding.run_benchmark_batch(
        css, cfg, mesh=mesh, seed=1, adaptive=args.adaptive,
        prepared=prepared,
    )
    wall_warm = time.perf_counter() - t0

    rows = []
    for i, cs in enumerate(css):
        err = evaluation.misclassification_error(
            res.labels[i][: cs.n_points], cs.gt_labels, cfg.max_labels
        )
        rows.append({
            "scene": cs.name,
            "tpu_miscls_pct": round(err, 3),
            "n_planes": int(res.active[i].sum()),
        })
    return rows, {
        "batch_wall_s_cold": round(wall_cold, 3),
        "batch_wall_s_warm": round(wall_warm, 3),
        "compiles": 1,
    }


def run_per_pair(args, scenes):
    import jax

    import multih_tpu
    from multih_tpu.utils import evaluation

    rows = []
    wall = 0.0
    for (cs, _), row in zip(scenes, suite.SUITE):
        tau = suite.tau_for_noise(row[4])
        n_pad = 1 << max(6, (cs.n_points - 1).bit_length())
        cfg = multih_tpu.MultiHConfig(
            inlier_threshold=tau, max_points=n_pad,
            n_hypotheses=args.hypotheses,
            use_pallas=not args.no_pallas,
        )
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg.max_points
        )
        if args.adaptive:
            fa = multih_tpu.make_fit_adaptive(cfg)

            def f(*a):
                return fa(*a)[0]
        else:
            f = multih_tpu.make_fit(cfg)
        key = jax.random.key(0)
        res = f(x1, x2, valid, key)
        jax.block_until_ready(res.labels)
        t0 = time.perf_counter()
        res = f(x1, x2, valid, jax.random.key(1))
        jax.block_until_ready(res.labels)
        dt = time.perf_counter() - t0
        wall += dt
        err = evaluation.misclassification_error(
            np.asarray(res.labels), gt, cfg.max_labels
        )
        rows.append({
            "scene": cs.name,
            "tpu_miscls_pct": round(err, 3),
            "n_planes": int(np.asarray(res.active).sum()),
            "warm_ms": round(dt * 1e3, 3),
        })
    return rows, {"sum_warm_s": round(wall, 3), "compiles": len(rows)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--hypotheses", type=int, default=2048)
    ap.add_argument("--adaptive", action="store_true",
                    help="use fit_adaptive (auto-tau) instead of the "
                         "per-scene noise-derived threshold")
    ap.add_argument("--no-pallas", action="store_true",
                    help="disable the Pallas kernels (jnp reference "
                         "paths) for numerics A/B debugging")
    ap.add_argument("--per-pair", action="store_true",
                    help="old loop: one compile + one call per scene "
                         "(debugging individual scenes)")
    ap.add_argument("--goldens", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "goldens"))
    ap.add_argument("--no-update", action="store_true",
                    help="diff against benchmarks/results/ but do not "
                         "overwrite the saved per-scene results")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    spath = os.path.join(args.goldens, "summary.json")
    _summary = {}
    if os.path.exists(spath):
        with open(spath) as fh:
            _summary = json.load(fh)

    scenes = suite.scenes()
    if args.per_pair:
        rows, timing = run_per_pair(args, scenes)
    else:
        rows, timing = run_batched(args, scenes)

    for row in rows:
        golden_path = os.path.join(args.goldens, f"{row['scene']}.npz")
        if os.path.exists(golden_path):
            golden_err = float(np.load(golden_path)["misclassification"])
            row["golden_miscls_pct"] = round(golden_err, 3)
            row["delta_pct"] = round(row["tpu_miscls_pct"] - golden_err, 3)
        # third code path of the three-way table (VERDICT r4 task 4):
        # OpenCV sequential-RANSAC peeling, tools/opencv_baseline.py
        ocv = _summary.get(row["scene"], {}).get("opencv_miscls_pct")
        if ocv is not None:
            row["opencv_miscls_pct"] = ocv
        print(json.dumps(row))

    errs = [r["tpu_miscls_pct"] for r in rows]
    deltas = [r["delta_pct"] for r in rows if "delta_pct" in r]

    from benchmarks import regression

    flags, _ = regression.track(
        "homography_suite", rows,
        meta={
            "platform": jax.default_backend(),
            "hypotheses": args.hypotheses,
            "keys": 2,
            "adaptive": args.adaptive,
        },
        update=not args.no_update,
    )
    summary = {
        "mean_tpu_miscls_pct": round(float(np.mean(errs)), 3),
        "median_tpu_miscls_pct": round(float(np.median(errs)), 3),
        "mean_delta_vs_golden_pct": (
            round(float(np.mean(deltas)), 3) if deltas else None
        ),
        "regressed_scenes": flags,
        **timing,
    }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
