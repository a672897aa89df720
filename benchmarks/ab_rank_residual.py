"""A/B: forward-only ('transfer') ranking sweeps vs full-'symmetric'
ranking at the stress shape — the gate for cfg.rank_residual in
bench.py's stress config (same protocol as the window-sampling /
claim_subsample / verify_subsample adoptions in docs/PERF.md).

Usage: python benchmarks/ab_rank_residual.py [--seeds 7 13 99]

Adoption rule: planes and miscls within noise of the baseline arm on
every seed, device time strictly better. Final candidate counts are
exact cfg.residual counts in BOTH arms by construction (the rank kind
only picks supersets that are rescored / LO-regrown at full fidelity).
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

sys.path.insert(0, ".")


def run_arm(rank_residual: str, seeds, iters=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import multih_tpu
    from bench import _stress_cfg
    from multih_tpu.utils import data, evaluation, tracing

    cfg = _stress_cfg(
        10240, 102400, n_candidates=256, max_labels=16,
        rank_residual=rank_residual,
    )
    f = multih_tpu.make_fit(cfg)
    rows = []
    device_ms = None
    for si, seed in enumerate(seeds):
        cs, _ = data.synthetic_scene(10000, 8, 0.7, 0.5, seed=seed)
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg.max_points
        )
        x1, x2, valid = map(jnp.asarray, (x1, x2, valid))
        res = f(x1, x2, valid, jax.random.key(0))
        jax.block_until_ready(res)
        err = evaluation.misclassification_error(
            np.asarray(res.labels)[: cs.n_points], gt[: cs.n_points],
            cfg.max_labels,
        )
        planes = float(jnp.sum(res.active))
        rows.append((seed, planes, err))
        if si == 0:
            with tempfile.TemporaryDirectory() as td:
                with jax.profiler.trace(td):
                    r = None
                    for i in range(iters):
                        r = f(x1, x2, valid, jax.random.key(100 + i))
                    jax.block_until_ready(r.labels)
                device_ms = tracing.median_device_ms(td, min_ms=5.0)
    return device_ms, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[7, 13, 99])
    args = ap.parse_args()
    for rr in ("", "transfer"):
        t0 = time.time()
        device_ms, rows = run_arm(rr, args.seeds)
        print(f"rank_residual={rr or 'symmetric(ref)'}: device "
              f"{device_ms:.1f} ms/fit "
              f"(wall incl. compile {time.time() - t0:.0f}s)")
        for seed, planes, err in rows:
            print(f"  seed {seed}: planes {planes:.0f}/8, "
                  f"miscls {err:.2f}%")


if __name__ == "__main__":
    main()
