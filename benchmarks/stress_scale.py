"""Scale demonstration (VERDICT r1 #8 / BASELINE.json:10 scaling axis):
full fits at 10k and 32k correspondences. Everything on the scaling path
is O(N * block): the row-blocked k-NN build, the banded agreement
operator, and the chunked residual sweeps — the dense (N, N) and (S, N)
matrices never materialize.

Usage: python benchmarks/stress_scale.py [--points 32768] [--hyps 102400]
Prints one JSON line per scale with blocked wall latency and recovered
plane count.

--pt-table (VERDICT r4 task 3): the POINT-AXIS sharding scale table —
for N in {16k, 32k, 64k, 128k}, compile + run the full fit single-device
and pt-sharded over an 8-device mesh, and report (a) label parity
between the two, (b) per-device compile-time memory (argument + temp
bytes from XLA's memory analysis — the quantity pt-sharding exists to
divide; N past ~1M pts outgrows one chip's HBM), (c) wall time. This
image exposes ONE physical core, so the 8 virtual CPU devices
time-slice it: sharded wall comparable to single-device wall means the
halo exchange + all-reduce overhead is small, but no wall-clock
SPEEDUP is observable here — the honest scaling evidence on this host
is (a) + (b).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

if "--pt-table" in sys.argv:
    # must precede the first jax import: virtual 8-device CPU mesh
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_scale(n_points: int, n_hyp: int, seed: int = 42):
    import jax
    import jax.numpy as jnp

    import multih_tpu
    from multih_tpu.utils import data

    n_pad = -(-n_points // 2048) * 2048
    cfg = multih_tpu.MultiHConfig(
        max_points=n_pad, n_hypotheses=n_hyp, n_candidates=256,
        max_labels=16, residual_chunk=4096,
    )
    cs, _ = data.synthetic_scene(n_points, 8, 0.7, 0.5, seed=seed)
    x1, x2, valid = map(
        jnp.asarray, multih_tpu.pad_points(cs.x1, cs.x2, None, n_pad)
    )
    f = multih_tpu.make_fit(cfg)
    t0 = time.perf_counter()
    res = jax.block_until_ready(f(x1, x2, valid, jax.random.key(0)))
    compile_s = time.perf_counter() - t0
    # timing on the tunnel-attached dev chip: per-call block_until_ready
    # has been observed to return early for repeated executables, so the
    # reliable measurement is a DEPENDENT chain of fits (each consumes the
    # previous energy) timed end-to-end and closed by a device->host
    # transfer, which cannot be elided
    reps = 4
    float(res.energy)
    t0 = time.perf_counter()
    for i in range(reps):
        x1_i = x1 + 1e-9 * res.energy.astype(x1.dtype)
        res = f(x1_i, x2, valid, jax.random.key(i + 1))
    e_final = float(res.energy)
    chain_s = time.perf_counter() - t0
    n_planes = int(jnp.sum(res.active))
    # NOTE: the chained number is an UPPER bound — it serializes one full
    # tunnel roundtrip per link, so it sits well above the device time
    # (profiler trace at 10k: ~79 ms device). It is comparable ACROSS
    # scales, which is what this script demonstrates.
    print(json.dumps({
        "n_points": n_points, "n_pad": n_pad, "n_hypotheses": n_hyp,
        "fit_ms_chained_upper": round(chain_s / reps * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "planes_found": n_planes,
        "energy": e_final,
    }), flush=True)


def _pt_cfg(n_pad: int, n_hyp: int):
    import multih_tpu

    # big-scene knobs per _stress_cfg's rationale (bench.py): trade
    # progressive rounds for claims; the pt table holds them fixed so
    # the only variable is N and the mesh
    return multih_tpu.MultiHConfig(
        max_points=n_pad, n_hypotheses=n_hyp, n_candidates=256,
        max_labels=16, residual_chunk=4096, progressive_rounds=2,
        claims_per_round=8, agree_block=128,
    )


def run_pt_table(n_points: int, n_hyp: int, seed: int = 42):
    """One row of the pt-sharding scale table: single-device vs
    8-device-pt-sharded full fit at N points (see module docstring)."""
    import jax
    import numpy as np

    import multih_tpu
    from multih_tpu.parallel import sharding
    from multih_tpu.utils import data, evaluation

    jax.config.update("jax_platforms", "cpu")
    from multih_tpu.utils.cache import compile_cache_dir

    jax.config.update("jax_compilation_cache_dir",
                      compile_cache_dir("/tmp/multih_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    devices = jax.devices()
    assert len(devices) >= 8, devices

    n_pad = -(-n_points // (128 * 8)) * (128 * 8)
    cfg = _pt_cfg(n_pad, n_hyp)
    # 4 planes / 20% outliers, not the stress 8 / 70%: the table scales
    # the POINT axis at a fixed 8k pool (the CPU-host wall limit), and a
    # stress-hard scene under a thin pool turns plane claims into greedy
    # threshold coin-flips — measured on the 8-plane/30% variant, both
    # paths dropped 1-2 planes (single-device 6-7/8, miscls 9-37%) and a
    # flipped float32 ulp from the pt-mesh all-reduce reassociation
    # cascaded into DIFFERENT same-quality decompositions (agreement
    # 87-91%): the table was comparing luck, not the decomposition. At
    # 4 planes the pool holds >= 2k hypotheses per plane at every N and
    # both paths recover 4/4, so the parity column measures the sharded
    # numerics. Outlier robustness at scale is bench.py's stress job
    # (102k-hypothesis pool).
    cs, _ = data.synthetic_scene(n_points, 4, 0.2, 0.5, seed=seed)
    x1, x2, valid, gt = multih_tpu.pad_points(
        cs.x1, cs.x2, cs.gt_labels, n_pad
    )
    key = jax.random.key(0)

    def mem_mb(compiled):
        ma = compiled.memory_analysis()
        try:
            return round((ma.argument_size_in_bytes
                          + ma.temp_size_in_bytes
                          + ma.output_size_in_bytes) / 2**20, 1)
        except AttributeError:
            return None

    row = {"n_points": n_points, "n_pad": n_pad, "n_hypotheses": n_hyp}

    # single device
    from multih_tpu.models import pipeline

    f1 = jax.jit(lambda a, b, v, k: pipeline.fit(a, b, v, k, cfg))
    t0 = time.perf_counter()
    lowered = f1.lower(x1, x2, valid, key)
    comp1 = lowered.compile()
    row["single_compile_s"] = round(time.perf_counter() - t0, 1)
    row["single_mem_mb_per_device"] = mem_mb(comp1)
    t0 = time.perf_counter()
    res1 = jax.block_until_ready(comp1(x1, x2, valid, key))
    row["single_fit_wall_s"] = round(time.perf_counter() - t0, 2)
    lab1 = np.asarray(res1.labels)
    row["single_planes"] = int(np.asarray(res1.active).sum())
    row["single_miscls_pct"] = round(evaluation.misclassification_error(
        lab1[: cs.n_points], gt[: cs.n_points], cfg.max_labels), 3)

    # pt-sharded over 8 devices (inputs placed per the fit's shardings:
    # each device receives only its contiguous Morton-block run)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = sharding.make_pt_mesh(devices[:8])
    fpt = sharding.pt_sharded_fit(cfg, mesh)
    xs1 = jax.device_put(x1, NamedSharding(mesh, P("pt", None)))
    xs2 = jax.device_put(x2, NamedSharding(mesh, P("pt", None)))
    vs = jax.device_put(valid, NamedSharding(mesh, P("pt")))
    ks = jax.device_put(key, NamedSharding(mesh, P()))
    t0 = time.perf_counter()
    comp8 = fpt.lower(xs1, xs2, vs, ks).compile()
    row["pt8_compile_s"] = round(time.perf_counter() - t0, 1)
    row["pt8_mem_mb_per_device"] = mem_mb(comp8)
    t0 = time.perf_counter()
    res8 = jax.block_until_ready(comp8(xs1, xs2, vs, ks))
    row["pt8_fit_wall_s"] = round(time.perf_counter() - t0, 2)
    lab8 = np.asarray(res8.labels)
    row["pt8_planes"] = int(np.asarray(res8.active).sum())
    row["pt8_miscls_pct"] = round(evaluation.misclassification_error(
        lab8[: cs.n_points], gt[: cs.n_points], cfg.max_labels), 3)
    # Hungarian-matched label agreement (plane SLOT order is arbitrary
    # between the two runs, so raw equality under-reports), not a strict
    # bool: the per-shard partial sums of refit moments / counts /
    # energies reassociate float32 adds, and the claim rounds' greedy
    # accepts are threshold decisions — one flipped ulp early can cascade
    # into a different (same-quality) decomposition on a 70%-outlier
    # stress scene. The CI parity tests (tests/test_sharding.py) assert
    # exact labels on the calibrated suite shapes.
    agree = 100.0 - evaluation.misclassification_error(
        lab1, lab8, cfg.max_labels, gt_outlier=cfg.max_labels
    )
    row["label_agreement_pct"] = round(agree, 3)
    row["blocks_per_device"] = n_pad // (128 * 8)
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, nargs="*",
                    default=[10240, 32768])
    ap.add_argument("--hyps", type=int, default=102400)
    ap.add_argument("--pt-table", action="store_true")
    args = ap.parse_args()
    if args.pt_table:
        for n in (args.points if args.points != [10240, 32768]
                  else [16384, 32768, 65536, 131072]):
            run_pt_table(n, args.hyps if args.hyps != 102400 else 8192)
        return
    for n in args.points:
        run_scale(n, args.hyps)


if __name__ == "__main__":
    main()
