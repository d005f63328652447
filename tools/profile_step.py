#!/usr/bin/env python
"""Capture a jax.profiler trace of the train step and print the top device ops.

Observability tool (SURVEY.md §5 tracing): runs a few fused train steps under
the profiler, then parses the Perfetto JSON to attribute device time by op —
a terminal-friendly XProf substitute. The raw trace directory remains
viewable in XProf/Perfetto.

    python tools/profile_step.py --preset config4_full --out /tmp/ilps_trace
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def capture(
    preset: str, out_dir: str, steps: int, batch_size: int,
    conv1x1: str | None = None,
) -> str:
    import dataclasses

    from indirect_learning_pose_shape_tpu import configs, train

    cfg = dataclasses.replace(configs.PRESETS[preset], batch_size=batch_size)
    if conv1x1:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                encoder=dataclasses.replace(cfg.model.encoder, conv1x1=conv1x1),
            ),
        )
    ts, consts = train.init_state(cfg)
    fused = train.compile_fused_step(cfg, consts)
    for _ in range(3):
        ts, _ = fused(ts)
    jax.block_until_ready(ts.params)
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            ts, _ = fused(ts)
        jax.block_until_ready(ts.params)
    traces = sorted(glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                              recursive=True))
    return traces[-1]


# The model runs its stages under jax.named_scope (models/network.py,
# train.py) and those names survive into each HLO op's `tf_op` metadata —
# including backward ops, whose paths keep the primal scope inside
# transpose(jvp(...)). Grouping on them attributes the one fused jit graph
# per component. Events with no tf_op metadata (copies, infeed, host ops,
# or older XProf versions) land in an explicit 'unattributed' bucket so
# the table's total always matches the device total.
_SCOPES = ("datagen", "encoder", "ief", "smpl", "raster", "losses", "optimizer")

# Backward-time markers: 'transpose(' covers VJP-transposed ops; 'rematted'
# and 'checkpoint' cover forward ops re-executed inside the backward under
# jax.checkpoint. Heuristic — fwd/bwd split is approximate for fused ops.
_BWD_MARKS = ("transpose(", "rematted", "checkpoint")


def _component(tf_op: str) -> str:
    if not tf_op:
        return "unattributed"
    for s in _SCOPES:
        if s in tf_op:
            return s
    return "other"


def report(trace_path: str, steps: int, top: int = 20) -> None:
    with gzip.open(trace_path) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {}
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    agg = collections.Counter()
    comp = collections.Counter()
    comp_bwd = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            pname = pids.get(e.get("pid"), "")
            if "TPU" in pname or "GPU" in pname:
                # Only the per-op track: the 'Steps' / 'XLA Modules' tracks
                # carry whole-graph aggregate spans that would double-count.
                tname = tids.get((e.get("pid"), e.get("tid")), "")
                if tname and "Ops" not in tname:
                    continue
                tf_op = str((e.get("args") or {}).get("tf_op") or "")
                # Per-op rows: fusions carry their origin op path; fall back
                # to the raw event name when metadata is missing.
                agg[(tf_op or e.get("name", ""))[:80]] += e["dur"]
                c = _component(tf_op)
                comp[c] += e["dur"]
                if any(m in tf_op for m in _BWD_MARKS):
                    comp_bwd[c] += e["dur"]
    total = sum(comp.values())
    if total:
        print(f"\ndevice time by component ({trace_path}):")
        print(f"{'ms/step':>9}  {'%':>5}  {'bwd ms':>7}  component")
        for name, dur in comp.most_common():
            print(
                f"{dur / steps / 1000:9.2f}  {100 * dur / total:5.1f}"
                f"  {comp_bwd[name] / steps / 1000:7.2f}  {name}"
            )
    print(f"\ndevice ops by time:")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for name, dur in agg.most_common(top):
        print(f"{dur / steps / 1000:9.2f}  {100 * dur / max(total, 1):5.1f}  {name}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="config4_full")
    ap.add_argument("--out", default="/tmp/ilps_trace")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument(
        "--conv1x1", default=None, choices=["conv", "dot"],
        help="override EncoderConfig.conv1x1 (the R50 backward-conv audit's "
        "A/B lever; docs/DESIGN.md round-4 audit)",
    )
    args = ap.parse_args()
    trace = capture(args.preset, args.out, args.steps, args.batch_size,
                    conv1x1=args.conv1x1)
    report(trace, args.steps, args.top)


if __name__ == "__main__":
    main()
