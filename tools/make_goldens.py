"""Generate golden labelings for the benchmark suite with the CPU
reference-style PEARL (tools/reference_pearl.py) and store them under
tests/goldens/ (SURVEY.md §4 'golden files').

Usage: python tools/make_goldens.py [--hypotheses 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from benchmarks import suite  # noqa: E402
import reference_pearl as rp  # noqa: E402
from multih_tpu.utils import evaluation  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hypotheses", type=int, default=2048)
    ap.add_argument("--only", default="",
                    help="comma-separated scene-name prefixes to "
                         "regenerate (e.g. 'fm,mx'); others keep their "
                         "existing golden + summary entry")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "goldens"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    prefixes = tuple(p for p in args.only.split(",") if p)

    def wanted(name):
        return not prefixes or name.startswith(prefixes)

    summary = {}
    spath = os.path.join(args.out, "summary.json")
    if prefixes and os.path.exists(spath):
        with open(spath) as f:
            summary = {k: v for k, v in json.load(f).items()
                       if not k.startswith("_")
                       and not k.startswith(prefixes)}
    for (cs, H_true), row in zip(suite.scenes(), suite.SUITE):
        if not wanted(cs.name):
            continue
        tau = suite.tau_for_noise(row[4])
        p = rp.PearlParams(
            inlier_threshold=tau, n_hypotheses=args.hypotheses
        )
        labels, Hs, active = rp.pearl_fit(
            cs.x1.astype(np.float64), cs.x2.astype(np.float64), p
        )
        # pearl_fit labels outliers with index len(Hs) — including the
        # no-plane case, where every point carries label 0 == len(Hs); any
        # other choice here would score those points as members of a
        # nonexistent plane
        outlier = len(Hs)
        err = evaluation.misclassification_error(
            labels, cs.gt_labels, outlier
        )
        np.savez(
            os.path.join(args.out, f"{cs.name}.npz"),
            labels=labels,
            outlier_label=outlier,
            n_planes=len(active),
            misclassification=err,
            inlier_threshold=tau,
        )
        summary[cs.name] = {
            "n_planes": len(active),
            "misclassification_pct": round(err, 3),
            "tau": tau,
        }
        print(f"{cs.name}: {len(active)} planes, {err:.2f}%")

    # motion-segmentation suite (model='fundamental'); goldens fm*.npz
    for (cs, _), row in zip(suite.motion_scenes(), suite.MOTION_SUITE):
        if not wanted(cs.name):
            continue
        tau = suite.tau_for_noise(row[4])
        p = rp.PearlParams(
            model="fundamental", inlier_threshold=tau,
            n_hypotheses=args.hypotheses,
        )
        labels, Fs, active = rp.pearl_fit(
            cs.x1.astype(np.float64), cs.x2.astype(np.float64), p
        )
        outlier = len(Fs)
        err = evaluation.misclassification_error(
            labels, cs.gt_labels, outlier
        )
        np.savez(
            os.path.join(args.out, f"{cs.name}.npz"),
            labels=labels,
            outlier_label=outlier,
            n_planes=len(active),
            misclassification=err,
            inlier_threshold=tau,
        )
        summary[cs.name] = {
            "n_planes": len(active),
            "misclassification_pct": round(err, 3),
            "tau": tau,
        }
        print(f"{cs.name}: {len(active)} motions, {err:.2f}%")

    # mixed plane+motion suite (mixed_fit oracle); goldens mx*.npz
    # (VERDICT r3 task 4: the mixed fit gets the same golden-anchored
    # evidence standard as both single-class paths)
    for (cs, _, _), row in zip(suite.mixed_scenes(), suite.MIXED_SUITE):
        if not wanted(cs.name):
            continue
        tau = suite.tau_for_noise(row[5])
        p_h = rp.PearlParams(
            inlier_threshold=tau, n_hypotheses=args.hypotheses
        )
        p_f = rp.PearlParams(
            model="fundamental", inlier_threshold=tau,
            n_hypotheses=args.hypotheses,
        )
        labels, models, is_f, n_active = rp.mixed_fit(
            cs.x1.astype(np.float64), cs.x2.astype(np.float64), p_h, p_f
        )
        outlier = len(models)
        err = evaluation.misclassification_error(
            labels, cs.gt_labels, outlier
        )
        n_h = int(is_f[np.unique(labels[labels < outlier])].sum()) \
            if n_active else 0
        np.savez(
            os.path.join(args.out, f"{cs.name}.npz"),
            labels=labels,
            outlier_label=outlier,
            n_planes=n_active,  # total active models (union space)
            n_fundamental=n_h,
            is_f=is_f,
            misclassification=err,
            inlier_threshold=tau,
        )
        summary[cs.name] = {
            "n_planes": n_active,
            "n_fundamental": n_h,
            "misclassification_pct": round(err, 3),
            "tau": tau,
        }
        print(f"{cs.name}: {n_active} models ({n_h} F), {err:.2f}%")

    summary["_oracle"] = {"version": rp.ORACLE_VERSION,
                          "n_hypotheses": args.hypotheses}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    errs = [v["misclassification_pct"] for k, v in summary.items()
            if not k.startswith("_")]
    print(f"mean misclassification: {np.mean(errs):.3f}%")


if __name__ == "__main__":
    main()
