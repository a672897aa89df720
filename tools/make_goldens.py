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
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "tests", "goldens"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    summary = {}
    for (cs, H_true), row in zip(suite.scenes(), suite.SUITE):
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

    summary["_oracle"] = {"version": rp.ORACLE_VERSION,
                          "n_hypotheses": args.hypotheses}
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    errs = [v["misclassification_pct"] for k, v in summary.items()
            if not k.startswith("_")]
    print(f"mean misclassification: {np.mean(errs):.3f}%")


if __name__ == "__main__":
    main()
