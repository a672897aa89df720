"""Run the TPU pipeline over the benchmark suite and report per-scene
misclassification vs. the CPU-reference goldens (BASELINE.json:9 report).

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--hypotheses", type=int, default=2048)
    ap.add_argument("--adaptive", action="store_true",
                    help="use fit_adaptive (auto-tau) instead of the "
                         "per-scene noise-derived threshold")
    ap.add_argument("--goldens", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "goldens"))
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import multih_tpu
    from multih_tpu.utils import evaluation

    rows = []
    for (cs, _), row in zip(suite.scenes(), suite.SUITE):
        tau = suite.tau_for_noise(row[4])
        n_pad = 1 << max(6, (cs.n_points - 1).bit_length())
        cfg = multih_tpu.MultiHConfig(
            inlier_threshold=tau, max_points=n_pad,
            n_hypotheses=args.hypotheses,
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
        res = f(x1, x2, valid, key)
        jax.block_until_ready(res.labels)
        dt = time.perf_counter() - t0
        err = evaluation.misclassification_error(
            np.asarray(res.labels), gt, cfg.max_labels
        )
        golden_path = os.path.join(args.goldens, f"{cs.name}.npz")
        golden_err = None
        if os.path.exists(golden_path):
            golden_err = float(np.load(golden_path)["misclassification"])
        rows.append({
            "scene": cs.name,
            "tpu_miscls_pct": round(err, 3),
            "golden_miscls_pct": (
                round(golden_err, 3) if golden_err is not None else None
            ),
            "delta_pct": (
                round(err - golden_err, 3) if golden_err is not None else None
            ),
            "n_planes": int(np.asarray(res.active).sum()),
            "warm_ms": round(dt * 1e3, 3),
        })
        print(json.dumps(rows[-1]))

    errs = [r["tpu_miscls_pct"] for r in rows]
    deltas = [r["delta_pct"] for r in rows if r["delta_pct"] is not None]
    summary = {
        "mean_tpu_miscls_pct": round(float(np.mean(errs)), 3),
        "median_tpu_miscls_pct": round(float(np.median(errs)), 3),
        "mean_delta_vs_golden_pct": (
            round(float(np.mean(deltas)), 3) if deltas else None
        ),
        "mean_warm_ms": round(float(np.mean([r["warm_ms"] for r in rows])), 3),
    }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
