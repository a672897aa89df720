"""Cold-start breakdown benchmark (docs/PERF.md "Cold start and AOT
export"; VERDICT r2 item 9). Run in a FRESH process per variant —
in-process state (jit caches, backend init) would otherwise pollute
the numbers; prints one JSON line.

Variants (argv[1]):
  cold        - no persistent cache: trace+lower time, compile time
  cached      - persistent cache at argv[2]: same, compile should hit
  export_save - aot.export_fit into cache dir argv[2]
  export_load - aot.cached_fit from argv[2], time first+second call,
                with XLA persistent cache at argv[3] if given

Typical sequence (see docs/PERF.md for measured results):

    python benchmarks/coldstart.py cold
    python benchmarks/coldstart.py cached /tmp/c && \
        python benchmarks/coldstart.py cached /tmp/c
    python benchmarks/coldstart.py export_save /tmp/a
    python benchmarks/coldstart.py export_load /tmp/a /tmp/c  # twice
"""
import json
import sys
import time

import numpy as np


def main():
    variant = sys.argv[1]
    t_start = time.perf_counter()
    import jax
    import jax.numpy as jnp

    if variant in ("cached",) or (variant == "export_load"
                                  and len(sys.argv) > 3):
        cache = sys.argv[2] if variant == "cached" else sys.argv[3]
        import os
        from multih_tpu.utils.cache import compile_cache_dir

        cache = compile_cache_dir(cache)
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import multih_tpu
    from multih_tpu.models import pipeline

    cfg = multih_tpu.MultiHConfig(max_points=512, n_hypotheses=2048)
    x1 = jnp.zeros((cfg.max_points, 2), jnp.float32)
    x2 = jnp.zeros((cfg.max_points, 2), jnp.float32)
    valid = jnp.ones((cfg.max_points,), jnp.float32)
    key = jax.random.key(0)
    t_import = time.perf_counter() - t_start

    out = {"variant": variant, "t_import_s": round(t_import, 2)}

    if variant in ("cold", "cached"):
        f = pipeline.make_fit(cfg)
        t0 = time.perf_counter()
        lowered = f.lower(x1, x2, valid, key)
        out["t_trace_lower_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        compiled = lowered.compile()
        out["t_compile_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        jax.block_until_ready(compiled(x1, x2, valid, key).labels)
        out["t_first_run_s"] = round(time.perf_counter() - t0, 2)
    elif variant == "export_save":
        from multih_tpu.utils import aot
        t0 = time.perf_counter()
        path = aot.export_fit(cfg, "fit", sys.argv[2])
        out["t_export_serialize_s"] = round(time.perf_counter() - t0, 2)
        import os
        out["blob_mb"] = round(os.path.getsize(path) / 1e6, 2)
    elif variant == "export_load":
        from multih_tpu.utils import aot
        t0 = time.perf_counter()
        f = aot.cached_fit(cfg, "fit", sys.argv[2], save_on_miss=False)
        out["t_load_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        res = f(x1, x2, valid, key)
        jax.block_until_ready(res)
        out["t_first_call_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        res = f(x1, x2, valid, jax.random.key(1))
        jax.block_until_ready(res)
        out["t_second_call_s"] = round(time.perf_counter() - t0, 2)
    out["t_total_s"] = round(time.perf_counter() - t_start, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
