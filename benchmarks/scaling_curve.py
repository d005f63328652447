#!/usr/bin/env python
"""Data-parallel scaling curve on a fake CPU mesh (VERDICT r1 next #9).

Real multi-chip hardware is unavailable (one tunneled chip), so the
*shape* of the scaling claim is audited the same way the sharding tests
run: N virtual CPU devices via `jax_num_cpu_devices`. Each mesh size runs
in its own subprocess (a backend can only be provisioned once per process)
and trains the config-5 step at a fixed PER-DEVICE batch (weak scaling —
the deployment regime: more chips, more global batch).

Interpretation: the virtual devices SHARE the same physical cores, so a
speedup is impossible by construction — what the curve measures is the
OVERHEAD the sharded program adds (partitioning, emulated collectives).
Per-image work is constant, so perfectly-sharded weak scaling keeps total
images/sec flat as the mesh grows; the table reports throughput retention
vs the 1-device run. On real ICI the collectives are faster than this
host emulation, so retention here lower-bounds hardware efficiency.

    python benchmarks/scaling_curve.py [--devices 1 2 4 8] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_WORKER = r"""
import json, sys, time
import jax

n = int(sys.argv[1])
per_device_batch = int(sys.argv[2])
steps = int(sys.argv[3])
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", n)

import dataclasses
import jax.numpy as jnp
from indirect_learning_pose_shape_tpu import configs, train
from indirect_learning_pose_shape_tpu.models import network as net
from indirect_learning_pose_shape_tpu.models.encoder import EncoderConfig
from indirect_learning_pose_shape_tpu.models.ief import IEFConfig
from indirect_learning_pose_shape_tpu.ops.raster import RasterConfig
from indirect_learning_pose_shape_tpu.parallel import mesh as mesh_lib
from indirect_learning_pose_shape_tpu.utils import assets as assets_lib

model_cfg = net.ModelConfig(
    image_size=64,
    encoder=EncoderConfig(depth=18, width=32, compute_dtype=jnp.float32),
    ief=IEFConfig(hidden_dims=(256,)),
    raster=RasterConfig(image_size=64, num_parts=24),
)
cfg = dataclasses.replace(
    configs.CONFIG5_DATA_PARALLEL,
    model=model_cfg,
    batch_size=per_device_batch * n,
    num_devices=n,
)
asset = assets_lib.synthetic_asset(num_verts=864, seed=1)
ts, consts = train.init_state(cfg, asset)
mesh = mesh_lib.make_mesh(n) if n > 1 else None
if mesh is not None:
    ts = mesh_lib.replicate_pytree(ts, mesh)
    consts = mesh_lib.replicate_pytree(consts, mesh)
fused = train.compile_fused_step(cfg, consts, mesh)
ts, _ = fused(ts)  # compile + first step
jax.block_until_ready(ts.params)
t0 = time.perf_counter()
for _ in range(steps):
    ts, _ = fused(ts)
jax.block_until_ready(ts.params)
dt = (time.perf_counter() - t0) / steps
print(json.dumps({
    "devices": n,
    "global_batch": cfg.batch_size,
    "step_ms": round(dt * 1e3, 2),
    "images_per_sec": round(cfg.batch_size / dt, 1),
}))
"""


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for n in args.devices:
        out = subprocess.run(
            [sys.executable, "-c", _WORKER, str(n), str(args.per_device_batch), str(args.steps)],
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=1200,
        )
        if out.returncode != 0:
            print(out.stdout)
            print(out.stderr, file=sys.stderr)
            raise SystemExit(f"mesh size {n} failed")
        row = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append(row)
        print(json.dumps(row))

    base = rows[0]["images_per_sec"]
    print(
        "\n| devices | global batch | step ms | images/sec "
        f"| throughput retention vs {rows[0]['devices']} dev |"
    )
    print("|---|---|---|---|---|")
    for r in rows:
        eff = r["images_per_sec"] / base
        print(
            f"| {r['devices']} | {r['global_batch']} | {r['step_ms']} "
            f"| {r['images_per_sec']} | {eff * 100:.0f}% |"
        )


if __name__ == "__main__":
    main()
