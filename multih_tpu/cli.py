"""Command-line interface — the reference's ``main()`` contract (SURVEY.md
§2 C1, §3.1): correspondences in, per-point plane labels + homographies out,
with misclassification error printed when ground truth is available.

Input formats (reference C13): AdelaideRMF ``.mat`` or whitespace text
``x y x' y' [gt_label]``. Parameters mirror the reference CLI: inlier
threshold, smoothness weight (lambda), label cost (beta), iteration caps
(SURVEY.md §5 'Config / flag system').

Example:
    multih fit data/johnsona.mat --threshold 3.0 --lambda 0.3
    multih synth --planes 3 --points 600 --noise 0.5
    multih bench-adelaide path/to/adelaide_dir
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _build_config(args) -> "MultiHConfig":
    from multih_tpu.config import MultiHConfig

    n = args.n_points_hint
    max_points = 1 << max(6, (n - 1).bit_length())  # next pow2 bucket >= n
    return MultiHConfig(
        inlier_threshold=args.threshold,
        spatial_weight=args.spatial_weight,
        label_cost=args.label_cost,
        max_points=max_points,
        n_hypotheses=args.hypotheses,
        max_labels=args.max_labels,
        pearl_iterations=args.iterations,
        min_inliers=args.min_inliers,
        residual=args.residual,
        model=getattr(args, "model", "homography"),
    )


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--threshold", type=float, default=3.0,
                   help="inlier threshold in px (tau)")
    p.add_argument("--spatial-weight", "--lambda", dest="spatial_weight",
                   type=float, default=0.1, help="Potts smoothness weight")
    p.add_argument("--label-cost", "--beta", dest="label_cost", type=float,
                   default=20.0, help="per-plane label cost")
    p.add_argument("--hypotheses", type=int, default=2048)
    p.add_argument("--max-labels", type=int, default=16)
    p.add_argument("--iterations", type=int, default=8,
                   help="PEARL alternation count")
    p.add_argument("--min-inliers", type=int, default=10)
    p.add_argument("--residual", default="symmetric",
                   choices=["symmetric", "transfer", "sampson"])
    p.add_argument("--model", default="homography",
                   choices=["homography", "fundamental", "mixed"],
                   help="geometric model class: 'homography' = multiple "
                        "scene planes (the reference's problem); "
                        "'fundamental' = multi-motion segmentation "
                        "(8-pt minimal solves, epipolar residuals); "
                        "'mixed' = planes AND motions in one label space "
                        "(models/mixed.py — H stage, F stage on the "
                        "remainder, joint PEARL polish)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--restarts", type=int, default=1,
                   help="fit this many times with different seeds and keep "
                        "the lowest-energy result")
    p.add_argument("--adaptive-tau", action="store_true",
                   help="self-calibrate the inlier threshold from a probe "
                        "pass (overrides --threshold)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu)")
    p.add_argument("--aot", action="store_true",
                   default=os.environ.get("MULTIH_AOT", "") == "1",
                   help="load/save jax.export'ed fit programs in the AOT "
                        "cache (skips Python tracing on later cold starts; "
                        "see docs/PERF.md 'Cold start'). Also via "
                        "MULTIH_AOT=1")
    p.add_argument("--json", action="store_true",
                   help="emit machine-readable JSON on stdout")
    p.add_argument("--save-labels", default=None,
                   help="write per-point labels to this file")
    p.add_argument("--save-viz", default=None,
                   help="write a label visualization image (png/jpg)")


def _reject_mixed(args, what: str):
    """Subcommands whose device path is single-class (batched bench,
    streaming, affine one-point hypotheses) must fail loudly on --model
    mixed instead of silently fitting homographies under a mixed banner
    (ADVICE r3, medium)."""
    if getattr(args, "model", "homography") == "mixed":
        print(f"--model mixed is not supported by {what}; run 'fit'/"
              f"'synth' for the mixed multi-class path", file=sys.stderr)
        sys.exit(2)


def _setup_jax(platform):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    # persistent compilation cache: keeps CLI cold-start acceptable across
    # invocations (SURVEY.md §5 'checkpoint/resume' — the only durable
    # state this pipeline has is compiled executables)
    from multih_tpu.utils.cache import compile_cache_dir

    cache = compile_cache_dir(os.environ.get(
        "MULTIH_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "multih_tpu_jit"),
    ))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    return jax


def _fit_one_mixed(cs, args):
    """The `--model mixed` CLI path: plane stage + motion stage + joint
    polish in one XLA program (models/mixed.py). Restarts keep the
    lowest joint-energy result; --adaptive-tau self-calibrates one
    threshold PER CLASS (tau_h from plane members under the transfer
    residual, tau_f from motion members under the epipolar one —
    mixed.estimate_tau_mixed) and freezes both for the restarts."""
    import numpy as np

    args.n_points_hint = cs.n_points
    args.model = "homography"
    cfg_h = _build_config(args)
    args.model = "fundamental"
    args_f_res = args.residual
    args.residual = "sampson"  # epipolar stage: first-order geometric
    cfg_f = _build_config(args)
    args.residual = args_f_res
    args.model = "mixed"
    jax = _setup_jax(args.platform)
    import multih_tpu
    from multih_tpu.models import mixed
    from multih_tpu.utils import evaluation

    if cs.gt_labels is not None:
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg_h.max_points
        )
    else:
        x1, x2, valid = multih_tpu.pad_points(
            cs.x1, cs.x2, None, cfg_h.max_points
        )
        gt = None
    adaptive = getattr(args, "adaptive_tau", False)
    if getattr(args, "aot", False):
        from multih_tpu.utils import aot

        def _mk(kind):
            return aot.cached_fit_mixed(cfg_h, cfg_f, kind=kind)
    else:
        def _mk(kind):
            return {
                "fit": mixed.make_fit_mixed,
                "fit_tau": mixed.make_fit_mixed_tau,
                "fit_adaptive": mixed.make_fit_mixed_adaptive,
            }[kind](cfg_h, cfg_f)
    if adaptive:
        f_ad = _mk("fit_adaptive")

        def f(x1_, x2_, v_, k_):
            r_, th_, tf_ = f_ad(x1_, x2_, v_, k_)
            return r_, (th_, tf_)
    else:
        f_fix = _mk("fit")

        def f(x1_, x2_, v_, k_):
            return f_fix(x1_, x2_, v_, k_), None
    t0 = time.perf_counter()
    res, taus = f(x1, x2, valid, jax.random.key(args.seed))
    jax.block_until_ready(res.labels)
    t_total = time.perf_counter() - t0
    t0 = time.perf_counter()
    res, taus = f(x1, x2, valid, jax.random.key(args.seed + 1))
    jax.block_until_ready(res.labels)
    t_warm = time.perf_counter() - t0
    # restarts under frozen per-class taus — each pass re-calibrating
    # would make the joint energies incomparable (same rationale as the
    # single-class path)
    if args.restarts > 1 and adaptive:
        f_tau = _mk("fit_tau")

        def f_restart(x1_, x2_, v_, k_, taus_):
            return f_tau(x1_, x2_, v_, k_, *taus_)
    else:
        def f_restart(x1_, x2_, v_, k_, _taus):
            return f(x1_, x2_, v_, k_)[0]
    for r in range(1, max(args.restarts, 1)):
        cand = f_restart(
            x1, x2, valid, jax.random.key(args.seed + 7919 * r), taus
        )
        if float(np.asarray(cand.energy)) < float(np.asarray(res.energy)):
            res = cand

    k_union = cfg_h.max_labels + cfg_f.max_labels
    labels = np.asarray(res.labels)[: cs.n_points]
    active = np.asarray(res.active)
    is_f = np.asarray(res.is_f)
    out = {
        "name": cs.name,
        "n_points": cs.n_points,
        "n_planes_found": int(active[is_f == 0].sum()),
        "n_motions_found": int(active[is_f == 1].sum()),
        "support_planes":
            np.asarray(res.support)[(active > 0) & (is_f == 0)].tolist(),
        "support_motions":
            np.asarray(res.support)[(active > 0) & (is_f == 1)].tolist(),
        "energy": float(np.asarray(res.energy)),
        "time_total_s": round(t_total, 4),
        "time_warm_s": round(t_warm, 4),
    }
    if taus is not None:
        out["tau_h"] = round(float(np.asarray(taus[0])), 3)
        out["tau_f"] = round(float(np.asarray(taus[1])), 3)
    if gt is not None:
        out["misclassification_pct"] = evaluation.misclassification_error(
            labels, gt[: cs.n_points], k_union
        )
    models = np.asarray(res.models)[active > 0]
    kinds = ["F" if v else "H" for v in is_f[active > 0]]
    if args.json:
        out["models"] = models.tolist()
        out["model_kinds"] = kinds
        print(json.dumps(out))
    else:
        print(f"pair: {out['name']}  points: {out['n_points']}")
        print(f"planes found: {out['n_planes_found']}  "
              f"support: {out['support_planes']}")
        print(f"motions found: {out['n_motions_found']}  "
              f"support: {out['support_motions']}")
        if "tau_h" in out:
            print(f"calibrated tau_h: {out['tau_h']:.2f} px  "
                  f"tau_f: {out['tau_f']:.2f} px")
        if "misclassification_pct" in out:
            print(f"misclassification: {out['misclassification_pct']:.2f}%")
        print(f"energy: {out['energy']:.2f}  warm latency: "
              f"{out['time_warm_s']*1e3:.2f} ms")
        for i, (m, kind) in enumerate(zip(models, kinds)):
            print(f"{kind}[{i}] =")
            for row in m:
                print("   ", " ".join(f"{v:+.6e}" for v in row))
    if args.save_labels:
        np.savetxt(args.save_labels, labels, fmt="%d")
    if args.save_viz:
        from multih_tpu.utils import viz

        viz.save_labels_figure(
            args.save_viz, cs.x1, cs.x2, labels, k_union
        )
    return out


def _fit_one(cs, args):
    import numpy as np

    if getattr(args, "model", "homography") == "mixed":
        return _fit_one_mixed(cs, args)
    args.n_points_hint = cs.n_points
    cfg = _build_config(args)
    jax = _setup_jax(args.platform)
    import multih_tpu
    from multih_tpu.utils import evaluation

    if cs.gt_labels is not None:
        x1, x2, valid, gt = multih_tpu.pad_points(
            cs.x1, cs.x2, cs.gt_labels, cfg.max_points
        )
    else:
        x1, x2, valid = multih_tpu.pad_points(
            cs.x1, cs.x2, None, cfg.max_points
        )
        gt = None

    adaptive = getattr(args, "adaptive_tau", False)
    use_aot = getattr(args, "aot", False)
    if use_aot:
        from multih_tpu.utils import aot

        def _maker(kind):
            return lambda: aot.cached_fit(cfg, kind)
    else:
        def _maker(kind):
            return {
                "fit": lambda: multih_tpu.make_fit(cfg),
                "fit_tau": lambda: multih_tpu.make_fit_tau(cfg),
                "fit_adaptive": lambda: multih_tpu.make_fit_adaptive(cfg),
            }[kind]
    if adaptive:
        f_ad = _maker("fit_adaptive")()

        def f(x1_, x2_, v_, k_):
            return f_ad(x1_, x2_, v_, k_)
    else:
        f_fix = _maker("fit")()

        def f(x1_, x2_, v_, k_):
            return f_fix(x1_, x2_, v_, k_), None
    key = jax.random.key(args.seed)
    t0 = time.perf_counter()
    res, tau = f(x1, x2, valid, key)
    jax.block_until_ready(res.labels)
    t_total = time.perf_counter() - t0
    # steady-state latency (compiled); fresh key — the dev tunnel memoizes
    # repeated identical (executable, inputs) calls, which would fake this
    t0 = time.perf_counter()
    res, tau = f(x1, x2, valid, jax.random.key(args.seed + 1))
    jax.block_until_ready(res.labels)
    t_warm = time.perf_counter() - t0
    # optional restarts: keep the lowest-energy result. Under adaptive tau
    # the calibrated threshold from the timed run is frozen for every
    # restart — each pass re-calibrating its own tau would make the
    # energies incomparable (different data-cost scales).
    if args.restarts > 1 and adaptive:
        f_restart = _maker("fit_tau")()
    else:
        def f_restart(x1_, x2_, v_, k_, _tau):
            return f(x1_, x2_, v_, k_)[0]
    for r in range(1, max(args.restarts, 1)):
        cand = f_restart(
            x1, x2, valid, jax.random.key(args.seed + 7919 * r), tau
        )
        if float(np.asarray(cand.energy)) < float(np.asarray(res.energy)):
            res = cand

    labels = np.asarray(res.labels)[: cs.n_points]
    active = np.asarray(res.active)
    out = {
        "name": cs.name,
        "n_points": cs.n_points,
        "n_planes_found": int(active.sum()),
        "support": np.asarray(res.support)[active > 0].tolist(),
        "energy": float(np.asarray(res.energy)),
        "time_total_s": round(t_total, 4),
        "time_warm_s": round(t_warm, 4),
    }
    n_far_dropped = int(np.asarray(res.n_far_dropped))
    if n_far_dropped:
        # banded-operator capacity overflow: the Potts energy lost edges
        # (ADVICE r2 — never silent)
        out["n_far_dropped"] = n_far_dropped
    if gt is not None:
        out["misclassification_pct"] = evaluation.misclassification_error(
            labels, gt[: cs.n_points], cfg.max_labels
        )
    homos = np.asarray(res.homographies)[active > 0]

    if args.json:
        out["homographies"] = homos.tolist()
        print(json.dumps(out))
    else:
        print(f"pair: {out['name']}  points: {out['n_points']}")
        print(f"planes found: {out['n_planes_found']}  "
              f"support: {out['support']}")
        if "misclassification_pct" in out:
            print(f"misclassification: {out['misclassification_pct']:.2f}%")
        print(f"energy: {out['energy']:.2f}  warm latency: "
              f"{out['time_warm_s']*1e3:.2f} ms")
        for i, h in enumerate(homos):
            print(f"H[{i}] =")
            for row in h:
                print("   ", " ".join(f"{v:+.6e}" for v in row))
    if args.save_labels:
        np.savetxt(args.save_labels, labels, fmt="%d")
    if args.save_viz:
        from multih_tpu.utils import viz

        viz.save_labels_figure(
            args.save_viz, cs.x1, cs.x2, labels, cfg.max_labels
        )
    return out


def cmd_fit(args):
    from multih_tpu.utils import data

    if args.input.endswith(".mat"):
        cs = data.load_adelaide_mat(args.input)
    else:
        cs = data.load_correspondences_txt(args.input)
    _fit_one(cs, args)


def cmd_fit_images(args):
    """Raw image pair -> SIFT matching (reference C3) -> fit, optionally
    feeding the matches' affine frames into the paper's one-point
    hypothesis path."""
    import cv2
    import numpy as np

    from multih_tpu.utils import features

    img1 = cv2.imread(args.image1, cv2.IMREAD_GRAYSCALE)
    img2 = cv2.imread(args.image2, cv2.IMREAD_GRAYSCALE)
    if img1 is None or img2 is None:
        print("could not read input images", file=sys.stderr)
        sys.exit(1)
    cs, affines = features.detect_and_match(
        img1, img2, max_features=args.max_features, ratio=args.ratio
    )
    if cs.n_points < 8:
        print(f"only {cs.n_points} matches — not enough", file=sys.stderr)
        sys.exit(1)
    print(f"matched {cs.n_points} correspondences", file=sys.stderr)

    if args.use_affines:
        import functools

        _reject_mixed(args, "fit-images --use-affines (homography "
                            "one-point hypothesis path)")
        args.n_points_hint = cs.n_points
        cfg = _build_config(args)
        jax = _setup_jax(args.platform)
        import jax.numpy as jnp

        import multih_tpu
        from multih_tpu.models import pipeline

        x1, x2, valid = multih_tpu.pad_points(
            cs.x1, cs.x2, None, cfg.max_points
        )
        aff = np.tile(np.eye(2, dtype=np.float32),
                      (cfg.max_points, 1, 1))
        aff[: cs.n_points] = affines
        f = jax.jit(functools.partial(pipeline.fit, cfg=cfg))
        res = f(x1, x2, valid, jax.random.key(args.seed),
                affines=jnp.asarray(aff))
        active = np.asarray(res.active)
        labels = np.asarray(res.labels)[: cs.n_points]
        out = {
            "name": f"{args.image1}|{args.image2}",
            "n_points": cs.n_points,
            "n_planes_found": int(active.sum()),
            "support": np.asarray(res.support)[active > 0].tolist(),
        }
        print(json.dumps(out) if args.json else
              "\n".join(f"{k}: {v}" for k, v in out.items()))
        if args.save_labels:
            np.savetxt(args.save_labels, labels, fmt="%d")
        if args.save_viz:
            from multih_tpu.utils import viz

            viz.save_labels_figure(args.save_viz, cs.x1, cs.x2, labels,
                                   cfg.max_labels, img1, img2)
    else:
        _fit_one(cs, args)


def cmd_synth(args):
    from multih_tpu.utils import data

    if getattr(args, "model", "homography") == "mixed":
        cs, _, _ = data.synthetic_mixed_scene(
            n_points=args.points, n_planes=args.planes,
            n_motions=args.motions, outlier_rate=args.outliers,
            noise_px=args.noise, seed=args.seed,
        )
    elif getattr(args, "model", "homography") == "fundamental":
        cs, _ = data.synthetic_motion_scene(
            n_points=args.points, n_motions=args.planes,
            outlier_rate=args.outliers, noise_px=args.noise,
            seed=args.seed,
        )
    else:
        cs, _ = data.synthetic_scene(
            n_points=args.points, n_planes=args.planes,
            outlier_rate=args.outliers, noise_px=args.noise,
            seed=args.seed,
        )
    _fit_one(cs, args)


def cmd_bench_adelaide(args):
    """The 19-pair benchmark as ONE batched device call (SURVEY.md §2 P4):
    all pairs padded into a single bucket, vmapped fit sharded over the
    mesh's pair axis — one compile, one dispatch, instead of 19 CLI runs
    with per-bucket recompiles. Per-pair --threshold is replaced by the
    traced per-pair tau vector (here: one global tau, or --adaptive-tau
    for per-pair self-calibration)."""
    import numpy as np

    from multih_tpu.utils import data, evaluation

    paths = data.adelaide_pairs(args.root)
    if not paths:
        print(f"no AdelaideRMF .mat files found under {args.root}",
              file=sys.stderr)
        sys.exit(1)
    _reject_mixed(args, "bench-adelaide (single-class batched dispatch)")
    css = [data.load_adelaide_mat(p) for p in paths]
    args.n_points_hint = max(cs.n_points for cs in css)
    cfg = _build_config(args)
    jax = _setup_jax(args.platform)
    from multih_tpu.parallel import sharding

    mesh = sharding.make_mesh()
    adaptive = getattr(args, "adaptive_tau", False)
    # upload once: per-call host->device transfer dominates wall time on
    # remotely-attached devices
    prepared = sharding.prepare_benchmark_batch(css, cfg, mesh)
    t0 = time.perf_counter()
    res = sharding.run_benchmark_batch(
        css, cfg, mesh=mesh, seed=args.seed, adaptive=adaptive,
        prepared=prepared,
    )
    t_total = time.perf_counter() - t0  # includes the single compile
    t0 = time.perf_counter()
    res = sharding.run_benchmark_batch(
        css, cfg, mesh=mesh, seed=args.seed + 1, adaptive=adaptive,
        prepared=prepared,
    )
    t_warm = time.perf_counter() - t0

    errs = []
    for i, cs in enumerate(css):
        row = {
            "name": cs.name,
            "n_points": cs.n_points,
            "n_planes_found": int(res.active[i].sum()),
        }
        if cs.gt_labels is not None:
            labels = res.labels[i][: cs.n_points]
            err = evaluation.misclassification_error(
                labels, cs.gt_labels, cfg.max_labels
            )
            row["misclassification_pct"] = round(err, 3)
            errs.append(err)
        print(json.dumps(row))
    summary = {
        "pairs": len(css),
        "mean_misclassification_pct": (
            round(float(np.nanmean(errs)), 3) if errs else None
        ),
        "batch_wall_s_cold": round(t_total, 3),
        "batch_wall_s_warm": round(t_warm, 3),
        "devices": int(np.prod(list(mesh.shape.values()))),
    }
    print(json.dumps({"summary": summary}))


def cmd_stream(args):
    from multih_tpu.utils import streaming

    _reject_mixed(args, "stream (single-class frame pipeline)")
    _setup_jax(args.platform)
    args.n_points_hint = 480
    cfg = _build_config(args)
    if args.source == "synth":
        src = streaming.SyntheticStream(n_frames=args.frames, n_points=480,
                                        n_planes=3, seed=args.seed)
    else:
        src = streaming.DirectoryStream(args.source)
    stats = streaming.run_stream(
        src, cfg, budget_ms=args.budget_ms,
        pipeline_depth=args.pipeline_depth,
        warm_start=not args.no_warm_start,
        upload="preload" if args.preload else "stream",
    )
    out = {
        "frames": stats.frames,
        "fps": round(stats.fps, 1),
        "latency_p50_ms": round(stats.p50_ms, 3),
        "latency_p95_ms": round(stats.p95_ms, 3),
        "mean_planes": round(stats.mean_planes, 2),
        "budget_ms": stats.budget_ms,
        "meets_budget": stats.meets_budget(),
    }
    print(json.dumps(out) if args.json else
          "\n".join(f"{k}: {v}" for k, v in out.items()))


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="multih",
        description="TPU-native multi-homography recovery (Multi-H rebuild)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_fit = sub.add_parser("fit", help="fit one correspondence file")
    p_fit.add_argument("input", help=".mat (AdelaideRMF) or text x y x' y'")
    _add_common(p_fit)
    p_fit.set_defaults(fn=cmd_fit)

    p_im = sub.add_parser(
        "fit-images",
        help="detect+match SIFT features on an image pair, then fit",
    )
    p_im.add_argument("image1")
    p_im.add_argument("image2")
    p_im.add_argument("--max-features", type=int, default=4000)
    p_im.add_argument("--ratio", type=float, default=0.8)
    p_im.add_argument("--use-affines", action="store_true",
                      help="add affine+F one-point hypotheses (paper path)")
    _add_common(p_im)
    p_im.set_defaults(fn=cmd_fit_images)

    p_sy = sub.add_parser("synth", help="fit a synthetic scene")
    p_sy.add_argument("--points", type=int, default=500)
    p_sy.add_argument("--planes", type=int, default=2,
                      help="planes (or motions with --model fundamental)")
    p_sy.add_argument("--motions", type=int, default=1,
                      help="independently moving non-planar rigid bodies "
                           "(--model mixed only)")
    p_sy.add_argument("--outliers", type=float, default=0.1)
    p_sy.add_argument("--noise", type=float, default=0.5)
    _add_common(p_sy)
    p_sy.set_defaults(fn=cmd_synth)

    p_b = sub.add_parser("bench-adelaide",
                         help="run the 19-pair AdelaideRMF benchmark")
    p_b.add_argument("root", help="directory containing the .mat files")
    _add_common(p_b)
    p_b.set_defaults(fn=cmd_bench_adelaide)

    p_st = sub.add_parser(
        "stream",
        help="per-frame fitting on a frame stream (dir of files, or "
             "'synth') under a real-time budget",
    )
    p_st.add_argument("source", help="directory of .txt/.mat frames, or "
                                     "'synth' for the synthetic stream")
    p_st.add_argument("--frames", type=int, default=60)
    p_st.add_argument("--budget-ms", type=float, default=33.3)
    p_st.add_argument("--pipeline-depth", type=int, default=3)
    p_st.add_argument("--no-warm-start", action="store_true",
                      help="disable seeding each frame's candidate pool "
                           "with the previous frame's planes")
    p_st.add_argument("--preload", action="store_true",
                      help="upload all frames before timing (isolates "
                           "device compute from transfer; default is "
                           "per-frame upload, the deployment shape)")
    _add_common(p_st)
    p_st.set_defaults(fn=cmd_stream)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
