"""Multi-chip execution: batched multi-pair fitting sharded over a device
mesh (SURVEY.md §2 P3/P4; §5 'Distributed communication backend').

The reference runs its CLI once per stereo pair on one CPU core; the TPU
rebuild batches pairs into one padded tensor program (P4) and shards that
batch over a ``jax.sharding.Mesh`` (P3). Collectives are never written by
hand here — the sharding annotations let XLA lower any cross-device traffic
onto ICI. Two mesh axes:

- ``pair``: data parallelism over stereo pairs (embarrassingly parallel —
  zero collectives in steady state).
- ``hyp``: intra-pair parallelism over the hypothesis pool for the huge
  stress configs (BASELINE.json:10) — the verification sweep's inlier-count
  reduction crosses this axis via an XLA-inserted psum.

Tests run this on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``); the driver's
``dryrun_multichip`` does the same (SURVEY.md §4 'hardware strategy').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multih_tpu.config import MultiHConfig
from multih_tpu.models import pipeline


def make_mesh(devices=None, pair_axis: int | None = None) -> Mesh:
    """1-D or 2-D mesh over the available devices: ('pair', 'hyp')."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if pair_axis is None:
        pair_axis = n  # default: all devices on the pair axis
    hyp_axis = n // pair_axis
    import numpy as np

    dev = np.array(devices[: pair_axis * hyp_axis]).reshape(
        pair_axis, hyp_axis
    )
    return Mesh(dev, axis_names=("pair", "hyp"))


def make_pt_mesh(devices=None) -> Mesh:
    """1-D mesh over the point (correspondence) axis — SURVEY.md §5
    'long-context' second scaling axis: at N >> 10k the k-NN graph, the
    banded agreement operator, and the PEARL sweeps outgrow one chip;
    this mesh shards them over Morton blocks (VERDICT r3 task 3)."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=("pt",))


def pt_sharded_fit(cfg: MultiHConfig, mesh: Mesh):
    """The full single-pair fit with the POINT axis sharded over the
    mesh's 'pt' axis (SURVEY.md §2 P2/P3, the N-scaling counterpart of
    hyp_sharded_fit).

    Decomposition: points are Morton-sorted and the banded agreement
    operator is block-tridiagonal over Morton blocks, so sharding N in
    contiguous block runs gives each device its own run of blocks; the
    only cross-device dependency of a PEARL sweep is the one-block halo
    (the roll of the (nb, B, 3B) band window), which GSPMD lowers to a
    collective-permute. The windowed k-NN build shards the same way; the
    residual sweeps are pointwise in N; refit moments / inlier counts /
    energies reduce over N via all-reduce. The annotation points live in
    pipeline.fit (`_pt_constrain`); this factory jits with the inputs
    placed on the mesh so each device receives only its point slice.

    Requirements (asserted): the windowed-banded gate must hold — i.e.
    cfg.spatial_sort, cfg.agree_block > 0, N a multiple of agree_block *
    mesh 'pt' size — so every block and its halo are well-defined.

    Parity: the math is identical to the single-device fit; reductions
    over N (refit moments, counts, energies) become per-shard partials +
    all-reduce, whose float32 reassociation can differ from the
    single-device sum order in the last ulp. The parity tests therefore
    assert label-level equality (same segmentation), not bitwise floats
    (tests/test_sharding.py) — unlike the hyp axis, whose merges are
    exact by construction.

    Returns jitted f(x1, x2, valid, key) -> FitResult.
    """
    cache_key = ("pt_fit", cfg, mesh)
    hit = _SHARDED_FIT_CACHE.get(cache_key)
    if hit is not None:
        return hit
    npt = mesh.shape["pt"]
    n = cfg.max_points
    assert cfg.spatial_sort and cfg.agree_block > 0, (
        "pt sharding needs the banded gate: spatial_sort + agree_block"
    )
    assert n % (cfg.agree_block * npt) == 0 and n >= 2 * cfg.agree_block, (
        f"max_points={n} must be a multiple of agree_block*npt="
        f"{cfg.agree_block}*{npt}"
    )
    pt2 = NamedSharding(mesh, P("pt", None))
    pt1 = NamedSharding(mesh, P("pt"))
    rep = NamedSharding(mesh, P())
    f = jax.jit(
        lambda x1, x2, valid, key: pipeline.fit(
            x1, x2, valid, key, cfg, mesh=mesh
        ),
        in_shardings=(pt2, pt2, pt1, rep),
    )
    _SHARDED_FIT_CACHE[cache_key] = f
    return f


def batched_fit(cfg: MultiHConfig, adaptive: bool = False,
                probe_tau: float = 8.0, mesh: Mesh | None = None):
    """vmapped fit over a batch of padded pairs: the P4 'run the CLI 19
    times' replacement — one XLA program for the whole benchmark.

    Signature of the returned callable: (x1 (B,N,2), x2, valid (B,N),
    keys (B,), taus (B,)) -> FitResult with leading batch axis. `taus` is
    the per-pair inlier threshold in px, *traced* — one compile serves any
    mix of per-scene thresholds. With `adaptive`, each pair instead
    self-calibrates its threshold (fit_adaptive) and `taus` is ignored.

    `mesh`: optional 2-D ('pair', 'hyp') mesh — when its 'hyp' axis is
    > 1, EACH per-pair fit additionally shards its hypothesize+verify
    block over that axis (P3 composed under P4: the batch rides the
    'pair' axis via sharded_fit's in_shardings while every pair's
    hypothesis pool splits over 'hyp').
    """
    fit_mesh = (
        mesh if mesh is not None and mesh.shape.get("hyp", 1) > 1
        else None
    )
    if adaptive:
        def one(x1, x2, valid, key, tau):
            res, _ = pipeline.fit_adaptive(
                x1, x2, valid, key, cfg, probe_tau=probe_tau,
                mesh=fit_mesh,
            )
            return res
    else:
        def one(x1, x2, valid, key, tau):
            return pipeline.fit(x1, x2, valid, key, cfg, tau=tau,
                                mesh=fit_mesh)
    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))


_SHARDED_FIT_CACHE: dict = {}


def sharded_fit(cfg: MultiHConfig, mesh: Mesh, adaptive: bool = False):
    """Batched fit with the pair axis sharded over the mesh's 'pair' axis.

    Inputs: x1, x2 (B, N, 2); valid (B, N); keys (B,) PRNG keys; taus (B,).
    B must be a multiple of the mesh 'pair' axis size (pad with dummy pairs).
    The jitted callable is cached per (cfg, mesh, adaptive): a fresh closure
    per call would retrace and recompile every time.
    """
    cache_key = (cfg, mesh, adaptive)
    hit = _SHARDED_FIT_CACHE.get(cache_key)
    if hit is not None:
        return hit
    vf = batched_fit(cfg, adaptive=adaptive, mesh=mesh)
    in_shardings = (
        NamedSharding(mesh, P("pair", None, None)),  # x1
        NamedSharding(mesh, P("pair", None, None)),  # x2
        NamedSharding(mesh, P("pair", None)),        # valid
        NamedSharding(mesh, P("pair")),              # keys
        NamedSharding(mesh, P("pair")),              # taus
    )
    out_shardings = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P("pair")),
        pipeline.FitResult(*(None,) * len(pipeline.FitResult._fields)),
    )
    f = jax.jit(
        vf, in_shardings=in_shardings, out_shardings=out_shardings
    )
    _SHARDED_FIT_CACHE[cache_key] = f
    return f


def batched_fit_mixed(cfg_h: MultiHConfig, cfg_f: MultiHConfig,
                      adaptive: bool = False, **kw):
    """vmapped mixed (plane + motion) fit over a batch of padded pairs —
    the P4 batching surface for `--model mixed` (VERDICT r4 task 8).

    Signature: (x1 (B,N,2), x2, valid (B,N), keys (B,)) ->
    MixedFitResult with leading batch axis. With `adaptive`, each pair
    self-calibrates its per-class thresholds inside the batched program
    (mixed.fit_mixed_adaptive — the mixed analog of batched_fit's
    adaptive mode). Extra kwargs forward to mixed.fit_mixed (f_bias,
    polish iterations, probe taus, ...)."""
    from multih_tpu.models import mixed

    if adaptive:
        def one(x1, x2, valid, key):
            res, _, _ = mixed.fit_mixed_adaptive(
                x1, x2, valid, key, cfg_h, cfg_f, **kw
            )
            return res
    else:
        def one(x1, x2, valid, key):
            return mixed.fit_mixed(x1, x2, valid, key, cfg_h, cfg_f,
                                    **kw)

    return jax.vmap(one, in_axes=(0, 0, 0, 0))


_SHARDED_MIXED_CACHE: dict = {}


def sharded_fit_mixed(cfg_h: MultiHConfig, cfg_f: MultiHConfig,
                      mesh: Mesh, adaptive: bool = False):
    """Batched mixed fit with the pair axis sharded over the mesh's
    'pair' axis — sharded_fit's analog for the union label space. B must
    be a multiple of the mesh 'pair' axis size. `adaptive` = per-pair
    per-class threshold self-calibration inside the sharded program."""
    from multih_tpu.models import mixed

    cache_key = (cfg_h, cfg_f, mesh, adaptive)
    hit = _SHARDED_MIXED_CACHE.get(cache_key)
    if hit is not None:
        return hit
    vf = batched_fit_mixed(cfg_h, cfg_f, adaptive=adaptive)
    in_shardings = (
        NamedSharding(mesh, P("pair", None, None)),  # x1
        NamedSharding(mesh, P("pair", None, None)),  # x2
        NamedSharding(mesh, P("pair", None)),        # valid
        NamedSharding(mesh, P("pair")),              # keys
    )
    pair_leaf = NamedSharding(mesh, P("pair"))
    fit_leaves = pipeline.FitResult(
        *(pair_leaf,) * len(pipeline.FitResult._fields)
    )
    out_shardings = mixed.MixedFitResult(
        labels=pair_leaf, models=pair_leaf, is_f=pair_leaf,
        active=pair_leaf, support=pair_leaf, energy=pair_leaf,
        result_h=fit_leaves, result_f=fit_leaves,
    )
    f = jax.jit(
        vf, in_shardings=in_shardings, out_shardings=out_shardings
    )
    _SHARDED_MIXED_CACHE[cache_key] = f
    return f


def hyp_sharded_fit(cfg: MultiHConfig, mesh: Mesh):
    """The FULL single-pair fit with hypothesis GENERATION and the
    verification sweep + top-M sharded over the mesh's 'hyp' axis (P3
    integrated into fit: pipeline._hypothesize_verify_sharded). Each
    device samples, solves and sweeps only its slice of every progressive
    round's slot range; cross-device traffic is R (count, slot, H)
    triples per claim round + M for the final top-M — independent of
    pool size. PEARL and refits are replicated (they do not grow with
    the pool). Bit-compatible with the unsharded fit (tested).

    Returns jitted f(x1, x2, valid, key) -> FitResult.
    """
    cache_key = ("hyp_fit", cfg, mesh)
    hit = _SHARDED_FIT_CACHE.get(cache_key)
    if hit is not None:
        return hit
    f = jax.jit(
        lambda x1, x2, valid, key: pipeline.fit(
            x1, x2, valid, key, cfg, mesh=mesh
        )
    )
    _SHARDED_FIT_CACHE[cache_key] = f
    return f


def sharded_verification(cfg: MultiHConfig, mesh: Mesh,
                         replication_check: bool = False):
    """P3's intra-pair axis: the hypothesis pool sharded over the mesh's
    'hyp' axis via shard_map. Each device verifies its own hypothesis
    shard against the (replicated) points — counts need no collective;
    the global top-M is a distributed top-k: local top-M, all_gather of
    the (count, index) candidates, then a replicated final top-M. This is
    what scales the 100k-hypothesis stress pools (BASELINE.json:10) past
    one chip.

    Returns f(Hs (S,3,3), x1, x2, valid) -> (top_counts (M,), top_idx (M,))
    with S divisible by the 'hyp' axis size.
    """
    from jax import shard_map

    from multih_tpu.models import pipeline

    n_hyp_shards = mesh.shape["hyp"]
    m = cfg.n_candidates

    def local_fn(Hs_blk, x1, x2, valid):
        # Hs_blk: (S/n, 3, 3) local shard; points replicated
        counts = pipeline.count_inliers(Hs_blk, x1, x2, valid, cfg)
        c_loc, i_loc = jax.lax.top_k(counts, m)
        shard = jax.lax.axis_index("hyp")
        gidx = i_loc + shard * Hs_blk.shape[0]
        # gather every shard's candidates, final top-M replicated
        c_all = jax.lax.all_gather(c_loc, "hyp").reshape(-1)
        i_all = jax.lax.all_gather(gidx, "hyp").reshape(-1)
        c_top, pos = jax.lax.top_k(c_all, m)
        out = c_top, i_all[pos]
        if replication_check:
            return out + (pipeline.replicated_ok(out, "hyp"),)
        return out

    n_out = 3 if replication_check else 2
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("hyp"), P(), P(), P()),
        out_specs=(P(),) * n_out,
        # outputs ARE replicated (all_gather + identical final top_k on
        # every shard) but the static checker cannot infer it; the
        # sharding tests verify it at runtime via replication_check=True
        check_vma=False,
    )
    return jax.jit(fn)


def prepare_benchmark_batch(pairs, cfg: MultiHConfig,
                            mesh: Mesh | None = None, taus=None):
    """Pad a list of CorrespondenceSets into one device-resident sharded
    batch (x1, x2, valid, taus). Uploading once and reusing across calls
    matters on remotely-attached devices, where per-call host->device
    transfers dominate wall time."""
    import numpy as np

    if mesh is None:
        mesh = make_mesh()
    npair = mesh.shape["pair"]
    b = len(pairs)
    b_pad = -(-b // npair) * npair

    x1 = np.zeros((b_pad, cfg.max_points, 2), np.float32)
    x2 = np.zeros((b_pad, cfg.max_points, 2), np.float32)
    valid = np.zeros((b_pad, cfg.max_points), np.float32)
    for i, cs in enumerate(pairs):
        p1, p2, v = pipeline.pad_points(cs.x1, cs.x2, None, cfg.max_points)
        x1[i], x2[i], valid[i] = p1, p2, v
    t = np.full((b_pad,), cfg.inlier_threshold, np.float32)
    if taus is not None:
        t[: len(taus)] = np.asarray(taus, np.float32)

    s2 = NamedSharding(mesh, P("pair", None, None))
    s1 = NamedSharding(mesh, P("pair", None))
    s0 = NamedSharding(mesh, P("pair"))
    return (
        jax.device_put(x1, s2),
        jax.device_put(x2, s2),
        jax.device_put(valid, s1),
        jax.device_put(t, s0),
    ), b


def run_benchmark_batch(pairs, cfg: MultiHConfig, mesh: Mesh | None = None,
                        seed: int = 0, taus=None, adaptive: bool = False,
                        prepared=None):
    """Fit a list of CorrespondenceSets as one sharded batch; returns a
    FitResult with a leading batch axis (device order = input order).

    `taus`: optional per-pair inlier thresholds in px (length == len(pairs));
    defaults to cfg.inlier_threshold for every pair. Ignored with
    `adaptive` (per-pair self-calibration). Pass `prepared` (from
    prepare_benchmark_batch) to reuse device-resident inputs across calls."""
    import numpy as np

    if mesh is None:
        mesh = make_mesh()
    if prepared is None:
        prepared = prepare_benchmark_batch(pairs, cfg, mesh, taus)
    (x1, x2, valid, t), b = prepared
    b_pad = x1.shape[0]
    keys = jax.vmap(jax.random.key)(jnp.arange(seed, seed + b_pad))

    f = sharded_fit(cfg, mesh, adaptive=adaptive)
    with mesh:
        res = f(x1, x2, valid, keys, t)
    return jax.tree_util.tree_map(lambda a: np.asarray(a)[:b], res)
