"""Run the fundamental-model pipeline over the motion suite and report
per-scene misclassification vs the fm*.npz goldens (the motion analog of
run_suite.py; VERDICT r3 task 2's measurement loop).

Usage: python benchmarks/run_motion_suite.py [--platform cpu] [--keys 3]
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


def _summary_json(goldens_dir):
    spath = os.path.join(goldens_dir, "summary.json")
    if os.path.exists(spath):
        with open(spath) as fh:
            return json.load(fh)
    return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--hypotheses", type=int, default=2048)
    ap.add_argument("--keys", type=int, default=3)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--goldens", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "goldens"))
    ap.add_argument("--no-update", action="store_true",
                    help="diff against benchmarks/results/ but do not "
                         "overwrite the saved per-scene results")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="MultiHConfig field override for A/B bisects, "
                         "e.g. --set f_exclusive_refine=False; parsed "
                         "with ast.literal_eval (implies --no-update)")
    args = ap.parse_args()
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        import ast

        overrides[k] = ast.literal_eval(v)
    if overrides:
        args.no_update = True

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from multih_tpu.utils.cache import compile_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      compile_cache_dir("/tmp/multih_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import multih_tpu
    from multih_tpu.utils import evaluation

    floor_path = os.path.join(os.path.dirname(__file__), "results",
                              "fm_floor.json")
    floors = {}
    if os.path.exists(floor_path):
        with open(floor_path) as fh:
            floors = json.load(fh)

    rows = []
    fits = {}
    t_start = time.perf_counter()
    for (name, n, motions, outl, noise, seed), (cs, _) in zip(
        suite.MOTION_SUITE, suite.motion_scenes()
    ):
        tau = suite.tau_for_noise(noise)
        npad = 1 << max(9, (cs.n_points - 1).bit_length())
        if npad not in fits:
            cfg = multih_tpu.MultiHConfig(
                max_points=npad, n_hypotheses=args.hypotheses,
                model="fundamental", residual="sampson",
                use_pallas=not args.no_pallas, **overrides,
            )
            fits[npad] = (cfg, multih_tpu.make_fit_tau(cfg))
        cfg, f = fits[npad]
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, npad
        )
        errs, counts = [], []
        for k in range(args.keys):
            res = f(x1, x2, valid, jax.random.key(k), tau)
            lab = np.asarray(res.labels)[: cs.n_points]
            errs.append(evaluation.misclassification_error(
                lab, cs.gt_labels, cfg.max_labels
            ))
            counts.append(int(np.asarray(res.active).sum()))
        row = {
            "scene": name,
            "tpu_miscls_pct": round(float(np.mean(errs)), 3),
            "per_key": [round(e, 2) for e in errs],
            "n_motions": counts,
            "gt_motions": motions,
        }
        gp = os.path.join(args.goldens, f"{name}.npz")
        if os.path.exists(gp):
            g = float(np.load(gp)["misclassification"])
            row["golden_miscls_pct"] = round(g, 3)
            row["delta_pct"] = round(row["tpu_miscls_pct"] - g, 3)
        # third code path of the three-way table (VERDICT r4 task 4):
        # OpenCV sequential-RANSAC peeling, tools/opencv_baseline.py
        # --update-summary
        ocv = _summary_json(args.goldens).get(name, {}).get(
            "opencv_miscls_pct")
        if ocv is not None:
            row["opencv_miscls_pct"] = ocv
        if name in floors:
            # error relative to the scene's GT-model Potts floor
            # (benchmarks/fm_floor.py --save): the estimator-attributable
            # part of the error, VERDICT r4 task 1
            fl = floors[name]["floor_potts_pct"]
            row["floor_potts_pct"] = fl
            row["above_floor_pct"] = round(row["tpu_miscls_pct"] - fl, 3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    errs = [r["tpu_miscls_pct"] for r in rows]
    deltas = [r["delta_pct"] for r in rows if "delta_pct" in r]

    from benchmarks import regression

    flags, _ = regression.track(
        "motion_suite", rows,
        meta={
            "platform": jax.default_backend(),
            "hypotheses": args.hypotheses,
            "keys": args.keys,
        },
        update=not args.no_update,
    )
    above = [r["above_floor_pct"] for r in rows if "above_floor_pct" in r]
    print(json.dumps({"summary": {
        "mean_tpu_miscls_pct": round(float(np.mean(errs)), 3),
        "mean_delta_vs_golden_pct": (
            round(float(np.mean(deltas)), 3) if deltas else None
        ),
        "mean_above_floor_pct": (
            round(float(np.mean(above)), 3) if above else None
        ),
        "regressed_scenes": flags,
        "wall_s": round(time.perf_counter() - t_start, 1),
    }}))


if __name__ == "__main__":
    main()
