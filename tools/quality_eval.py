#!/usr/bin/env python
"""Quality-evaluation protocol with error bars (VERDICT r2 next #7).

Single-seed eval deltas at the ~1% scale sit inside the synthetic stream's
sampling noise (evaluate.py docstring), so quality claims need spread. This
tool fixes the protocol every "best model" claim must use:

  PROTOCOL (declared here, reused by future rounds):
  - metrics: evaluate.evaluate() on the held-out synthetic stream
  - seeds: 123, 231, 312 (three disjoint streams; --seeds overrides)
  - batches: 8 per seed at the preset's batch size
  - checkpoint: the run's latest (orbax auto-pick via --checkpoint dir)
  - report: per-metric mean ± half-range across seeds; a claimed
    improvement counts only if the means differ by more than the SUM of
    the two runs' half-ranges on that metric.

    python tools/quality_eval.py --preset config4_large --checkpoint DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Runnable as `python tools/quality_eval.py` from anywhere (script dir is
# sys.path[0], not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROTOCOL_SEEDS = (123, 231, 312)


def main():
    from indirect_learning_pose_shape_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="config4_full")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--step",
        type=int,
        default=None,
        help="score this checkpoint step instead of the latest (quality is "
        "horizon-dependent; see BASELINE.md)",
    )
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument(
        "--keep-bf16", nargs="*", default=[], metavar="SITE",
        help="with --int8: encoder sites (names or prefixes, e.g. stem s3) "
        "kept in bf16 — the per-site accuracy/throughput Pareto knob "
        "(models/quantize.py keep_sites)",
    )
    ap.add_argument("--seeds", type=int, nargs="+", default=list(PROTOCOL_SEEDS))
    ap.add_argument(
        "--int8",
        action="store_true",
        help="score the int8-PTQ serving path (models/quantize.py) instead of "
        "the bf16 forward; calibration uses a held-out synthetic batch "
        "(seed 999, 16 images) disjoint from the protocol's eval seeds",
    )
    ap.add_argument(
        "--int8-impl",
        default="int8",
        choices=["int8", "int8c", "sim", "simc"],
        help="int8 execution scheme (models/quantize.py): per-site 'int8' "
        "or carried-activation 'int8c' (+ portable sim/simc twins)",
    )
    ap.add_argument(
        "--ema",
        action="store_true",
        help="score the Polyak-averaged (EMA) params from the checkpoint "
        "(requires a run trained with ema_decay>0)",
    )
    ap.add_argument(
        "--ief-iters",
        type=int,
        default=None,
        help="IEF iteration count T the checkpoint was trained with "
        "(train --ief-iters); the IEF stack is shared across iterations so "
        "params restore under any T, but scoring must run the trained T",
    )
    ap.add_argument(
        "--rot-format",
        default=None,
        choices=["axis_angle", "rot6d"],
        help="rotation parameterization the checkpoint was trained with "
        "(train --rot-format); the IEF head width differs, so restore "
        "requires the matching format",
    )
    ap.add_argument(
        "--eval-suite",
        default=None,
        choices=["plain", "hard", "hardapp"],
        help="named eval distribution (data/synthetic.EVAL_SUITES): the "
        "protocol's fixed FIELD=VALUE sets — 'hard' = renderer-independent "
        "z-buffer targets, 'hardapp' = hard targets + domain-randomized "
        "appearance; explicit --synthetic overrides apply on top",
    )
    ap.add_argument(
        "--synthetic",
        action="append",
        default=None,
        metavar="FIELD=VALUE",
        help="override one synthetic-stream knob for the EVAL distribution "
        "(repeatable), e.g. --synthetic pose_std=0.35 --synthetic "
        "cam_scale_range=0.5,1.3 — scores the checkpoint on a harder/"
        "shifted stream than it was trained on (out-of-distribution row); "
        "the overrides are recorded in the output JSON",
    )
    args = ap.parse_args()

    import jax

    from indirect_learning_pose_shape_tpu import configs, evaluate
    from indirect_learning_pose_shape_tpu.predict import load_model
    from indirect_learning_pose_shape_tpu.utils import assets as assets_lib

    cfg = configs.PRESETS[args.preset]
    specs = []
    if args.eval_suite:
        from indirect_learning_pose_shape_tpu.data import synthetic as synth_lib

        specs += list(synth_lib.EVAL_SUITES[args.eval_suite])
    if args.synthetic:
        specs += list(args.synthetic)
    if specs:
        import dataclasses

        from indirect_learning_pose_shape_tpu.data import synthetic as synth_lib

        try:
            cfg = dataclasses.replace(
                cfg,
                synthetic=synth_lib.apply_overrides(cfg.synthetic, specs),
            )
        except ValueError as e:
            ap.error(str(e))
    if args.ief_iters is not None or args.rot_format is not None:
        import dataclasses

        ief = cfg.model.ief
        if args.ief_iters is not None:
            ief = dataclasses.replace(ief, num_iterations=args.ief_iters)
        if args.rot_format is not None:
            ief = dataclasses.replace(ief, rotation_format=args.rot_format)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, ief=ief)
        )
    params, state, consts = load_model(
        cfg, args.checkpoint, assets_lib.load_asset(), ema=args.ema,
        step=args.step,
    )

    qparams = None
    if args.int8:
        from indirect_learning_pose_shape_tpu.data import synthetic
        from indirect_learning_pose_shape_tpu.models import quantize as quant

        calib = synthetic.generate_batch(
            jax.random.PRNGKey(999), 16, consts, cfg.model, cfg.synthetic
        )["image"]
        qparams = quant.ptq_quantize(
            params["encoder"], state["encoder"], cfg.model.encoder, calib,
            keep_sites=tuple(args.keep_bf16),
        )

    per_seed = {}
    for seed in args.seeds:
        per_seed[seed] = evaluate.evaluate(
            params, state, consts, cfg, num_batches=args.batches, seed=seed,
            qparams=qparams, int8_impl=args.int8_impl,
        )
        print(f"seed {seed}: {json.dumps({k: round(v, 5) for k, v in per_seed[seed].items()})}",
              file=sys.stderr)

    metrics = sorted(next(iter(per_seed.values())))
    summary = {}
    for m in metrics:
        vals = [per_seed[s][m] for s in args.seeds]
        mean = sum(vals) / len(vals)
        half_range = (max(vals) - min(vals)) / 2.0
        summary[m] = {"mean": round(mean, 5), "pm": round(half_range, 5)}
    out = {
        "preset": args.preset,
        "checkpoint": args.checkpoint,
        "step": args.step,
        "seeds": args.seeds,
        "batches": args.batches,
        "int8": args.int8,
        "int8_impl": args.int8_impl if args.int8 else None,
        "ema": args.ema,
        "eval_suite": args.eval_suite,
        "synthetic": specs or None,
        "metrics": summary,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
