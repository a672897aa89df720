"""Per-scene regression tracking for the benchmark suites.

VERDICT r4 task 2: a suite MEAN can hide a per-scene regression (and a
single-key per-scene number can fake one — docs/PERF.md 'The r4
motion-bench move was key noise'). Each suite runner persists its
per-scene results to a committed JSON file and diffs the current run
against it, flagging any scene whose misclassification regresses by
more than `threshold` percentage points. The files live under
benchmarks/results/ and are refreshed every round.
"""

from __future__ import annotations

import json
import os

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def track(name, rows, meta, key="tpu_miscls_pct", threshold=1.0,
          update=True):
    """Diff `rows` (list of {"scene": ..., key: ...}) against the saved
    previous run `benchmarks/results/{name}.json`; returns (flags,
    previous) where flags is a list of {"scene", "prev", "now", "delta"}
    for scenes regressing > threshold pp. When `update`, the saved file
    is replaced by the current run (meta stored alongside).

    Comparison is skipped (with a note in flags[0]["note"]) if the saved
    meta differs on fields that change the measurement itself
    (platform/hypotheses/keys) — a CPU run must not be 'regressed'
    against a TPU file.
    """
    path = os.path.join(RESULTS_DIR, f"{name}.json")
    prev = None
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)

    flags = []
    comparable = prev is not None and all(
        prev.get("meta", {}).get(k) == meta.get(k)
        for k in ("platform", "hypotheses", "keys")
    )
    if prev is not None and not comparable:
        flags.append({"note": (
            f"previous {name} results were measured under "
            f"{prev.get('meta')} vs current {meta}; regression diff "
            f"skipped"
        )})
    elif prev is not None:
        old = prev.get("scenes", {})
        for row in rows:
            sc = row["scene"]
            if sc in old:
                delta = row[key] - old[sc]
                if delta > threshold:
                    flags.append({
                        "scene": sc,
                        "prev": old[sc],
                        "now": row[key],
                        "delta": round(delta, 3),
                    })

    if update:
        os.makedirs(RESULTS_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump({
                "meta": meta,
                "scenes": {r["scene"]: r[key] for r in rows},
            }, f, indent=1, sort_keys=True)
            f.write("\n")
    return flags, prev
