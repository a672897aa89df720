"""Ahead-of-time export of compiled fit programs (SURVEY.md §5
"checkpoint/resume" — the only durable state this pipeline has is
compiled executables; VERDICT r2 item 9 asked for a cold-start story
beyond the persistent XLA compile cache).

Cold start of a fresh CLI process decomposes as (measured on the axon
TPU v5e tunnel, default CLI config, docs/PERF.md "Cold start"):

    import + backend init    ~3 s
    trace + lower            ~9 s   <- Python-side, per process
    XLA backend compile      ~15 s  <- cached by jax_compilation_cache_dir

The persistent compile cache only removes the third line; every fresh
process still pays Python tracing + StableHLO lowering. ``jax.export``
serializes the lowered module, so a later process deserializes
(~sub-second) and goes straight to the (cached) backend compile.

Usage (the CLI wires this behind ``--aot`` / MULTIH_AOT=1):

    fn = aot.cached_fit(cfg, kind="fit")   # load-or-export
    res = fn(x1, x2, valid, key)

Artifacts live next to the XLA cache, keyed by (jax version, backend,
config, fit kind) — shapes/dtypes are determined by cfg, so they are
part of the key via the config fields. Any miss or incompatibility
falls back to plain ``jax.jit`` transparently.
"""

from __future__ import annotations

import hashlib
import logging
import os

log = logging.getLogger(__name__)

# bump when the traced program's meaning changes without a config or
# jax-version change (e.g. pipeline refactors) — stale blobs are only
# reused within the same stamp
_STAMP = "aot-v1"


_registered = False


def _register_pytrees():
    """jax.export needs custom pytree containers registered by name for
    (de)serialization; idempotent, done lazily so importing this module
    stays cheap."""
    global _registered
    if _registered:
        return
    from jax import export as jexport
    from multih_tpu.models import mixed, pipeline

    jexport.register_namedtuple_serialization(
        pipeline.FitResult, serialized_name="multih_tpu.FitResult"
    )
    jexport.register_namedtuple_serialization(
        mixed.MixedFitResult, serialized_name="multih_tpu.MixedFitResult"
    )
    _registered = True


def _jit_fit(cfg, kind: str):
    from multih_tpu.models import pipeline

    return {
        "fit": pipeline.make_fit,
        "fit_tau": pipeline.make_fit_tau,
        "fit_seeded": pipeline.make_fit_seeded,
        "fit_adaptive": pipeline.make_fit_adaptive,
    }[kind](cfg)


def _example_args(cfg, kind: str):
    import jax
    import jax.numpy as jnp

    n = cfg.max_points
    x1 = jnp.zeros((n, 2), jnp.float32)
    valid = jnp.ones((n,), jnp.float32)
    key = jax.random.key(0)
    base = (x1, x1, valid, key)
    if kind == "fit_tau":
        return base + (jnp.asarray(cfg.inlier_threshold, jnp.float32),)
    if kind == "fit_seeded":
        k = cfg.max_labels
        return base + (
            jnp.zeros((k, 3, 3), jnp.float32),
            jnp.zeros((k,), jnp.float32),
        )
    return base


def cache_key(cfg, kind: str) -> str:
    import jax

    sig = "|".join(
        [_STAMP, jax.__version__, jax.default_backend(), kind, repr(cfg)]
    )
    return hashlib.sha256(sig.encode()).hexdigest()[:24]


def default_cache_dir() -> str:
    return os.environ.get(
        "MULTIH_AOT_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "multih_tpu_aot"),
    )


def export_fit(cfg, kind: str = "fit", cache_dir: str | None = None) -> str:
    """Trace+lower the fit once and serialize it. Returns the blob path."""
    from jax import export as jexport

    _register_pytrees()
    cache_dir = cache_dir or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, cache_key(cfg, kind) + ".bin")
    exp = jexport.export(_jit_fit(cfg, kind))(*_example_args(cfg, kind))
    blob = exp.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, path)  # atomic vs concurrent CLI runs
    return path


def cached_fit(cfg, kind: str = "fit", cache_dir: str | None = None,
               save_on_miss: bool = True):
    """Load-or-build: deserialize a previously exported fit if one
    matches (cfg, kind, jax version, backend); otherwise jit normally
    and (optionally) export for the next process. The returned callable
    has the same signature and pytree results as the jitted original.

    The exported call still goes through XLA backend compilation on
    first use — pair this with the persistent compile cache (the CLI
    sets both) so a warm-cache cold start pays neither tracing nor
    backend compile.
    """
    from jax import export as jexport

    _register_pytrees()
    cache_dir = cache_dir or default_cache_dir()
    path = os.path.join(cache_dir, cache_key(cfg, kind) + ".bin")
    if os.path.exists(path):
        try:
            import jax

            with open(path, "rb") as fh:
                exp = jexport.deserialize(fh.read())
            # jit the exported call so repeated invocations reuse one
            # executable (tracing the deserialized module is cheap — no
            # pipeline re-trace happens)
            return jax.jit(exp.call)
        except Exception as e:  # stale/corrupt blob: fall through to jit
            log.warning("AOT blob %s unusable (%s); re-tracing", path, e)
    if save_on_miss:
        try:
            import jax

            path = export_fit(cfg, kind, cache_dir)
            # run THIS process through the exported module too — its
            # backend compile then populates the XLA persistent cache
            # with exactly the module every later process deserializes
            # (the roundtripped StableHLO hashes differently from the
            # plain-jit lowering, so compiling the jit path here would
            # leave the next cold start with a cache miss)
            with open(path, "rb") as fh:
                return jax.jit(jexport.deserialize(fh.read()).call)
        except Exception as e:  # export is an optimization, never fatal
            log.warning("AOT export failed (%s); continuing jitted", e)
    return _jit_fit(cfg, kind)


# ---------------------------------------------------------------------------
# mixed multi-class fit (two-config program; ADVICE r3 asked that the CLI's
# --aot flag cover --model mixed instead of silently re-tracing)
# ---------------------------------------------------------------------------

def cache_key_mixed(cfg_h, cfg_f, f_bias, polish_meanfield,
                    polish_icm, f_scope="all", kind="fit") -> str:
    import jax

    sig = "|".join([
        _STAMP, jax.__version__, jax.default_backend(),
        "fit_mixed" if kind == "fit" else f"fit_mixed_{kind[4:]}",
        repr(cfg_h), repr(cfg_f),
        repr((f_bias, polish_meanfield, polish_icm, f_scope)),
    ])
    return hashlib.sha256(sig.encode()).hexdigest()[:24]


def cached_fit_mixed(cfg_h, cfg_f, f_bias: float = 0.5,
                     polish_meanfield: int = 4, polish_icm: int = 2,
                     cache_dir: str | None = None,
                     save_on_miss: bool = True, f_scope: str = "all",
                     kind: str = "fit"):
    """Mixed-fit analog of `cached_fit`: load-or-export the two-stage +
    joint-polish program (models/mixed.py). kind selects the variant:
    "fit" (fixed taus), "fit_tau" (traced tau_h/tau_f), "fit_adaptive"
    (two-pass per-class calibration). Same fallback semantics — any miss
    or incompatibility returns the plain jitted fit."""
    import jax
    from jax import export as jexport
    import jax.numpy as jnp
    from multih_tpu.models import mixed

    _register_pytrees()
    cache_dir = cache_dir or default_cache_dir()

    def _jit():
        maker = {
            "fit": mixed.make_fit_mixed,
            "fit_tau": mixed.make_fit_mixed_tau,
            "fit_adaptive": mixed.make_fit_mixed_adaptive,
        }[kind]
        return maker(
            cfg_h, cfg_f, f_bias, polish_meanfield, polish_icm,
            f_scope=f_scope,
        )

    path = os.path.join(
        cache_dir,
        cache_key_mixed(cfg_h, cfg_f, f_bias, polish_meanfield,
                        polish_icm, f_scope, kind) + ".bin",
    )
    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                exp = jexport.deserialize(fh.read())
            return jax.jit(exp.call)
        except Exception as e:
            log.warning("AOT blob %s unusable (%s); re-tracing", path, e)
    if save_on_miss:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            n = cfg_h.max_points
            x1 = jnp.zeros((n, 2), jnp.float32)
            valid = jnp.ones((n,), jnp.float32)
            ex = (x1, x1, valid, jax.random.key(0))
            if kind == "fit_tau":
                ex = ex + (
                    jnp.asarray(cfg_h.inlier_threshold, jnp.float32),
                    jnp.asarray(cfg_f.inlier_threshold, jnp.float32),
                )
            exp = jexport.export(_jit())(*ex)
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(exp.serialize())
            os.replace(tmp, path)  # atomic vs concurrent CLI runs
            with open(path, "rb") as fh:
                return jax.jit(jexport.deserialize(fh.read()).call)
        except Exception as e:
            log.warning("AOT export failed (%s); continuing jitted", e)
    return _jit()
