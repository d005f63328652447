#!/usr/bin/env python
"""Attribute the weak-scaling retention drop on the virtual mesh (VERDICT r2
next #5: the 4→8-device cliff in benchmarks/scaling_curve.py was measured but
never explained).

Decomposition per mesh size, each in its own subprocess (one backend per
process), same workload as scaling_curve.py:

- fused:     the full single-graph step (gen + fwd + bwd + Adam) — the curve's
             measured quantity.
- gen:       sharded on-device batch generation alone.
- step:      train step alone on a pre-generated sharded batch.
- allreduce: an emulated gradient all-reduce alone — a params-shaped pytree
             psum'd over the mesh via shard_map, the one true collective the
             data-parallel step contains. On real ICI this is hardware-fast;
             on the virtual CPU mesh every device is the same core, so its
             cost scales with device count and is pure emulation overhead.
- spmd0:     the same per-device compute with NO mesh (1 device, per-device
             batch) — the ideal per-shard cost; n×spmd0 is the perfect-weak-
             scaling step time on a shared core.

Retention loss = fused − n×spmd0, decomposed into gen growth, step-minus-
compute (partitioner + collective), with allreduce as the collective's
isolated cost.

    python benchmarks/scaling_attrib.py [--devices 1 4 8] [--steps 6]
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
import functools
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
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


def timeit(fn, *args, donate_ts=False):
    # fn must return device arrays; first call compiles.
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3


res = {"devices": n, "global_batch": cfg.batch_size}

# fused full step (donated ts: time a fresh sequence to keep ts alive)
fused = train.compile_fused_step(cfg, consts, mesh)
ts1, _ = fused(ts)
jax.block_until_ready(ts1.params)
t0 = time.perf_counter()
for _ in range(steps):
    ts1, _ = fused(ts1)
jax.block_until_ready(ts1.params)
res["fused_ms"] = (time.perf_counter() - t0) / steps * 1e3

# gen alone / step alone
gen_fn, step_fn = train.compile_train_fns(cfg, consts, mesh)
res["gen_ms"] = timeit(gen_fn, ts1.rng, ts1.step)
batch = gen_fn(ts1.rng, ts1.step)
step2 = jax.jit(functools.partial(train.train_step, consts=consts, cfg=cfg))
res["step_ms"] = timeit(step2, ts1, batch)

# emulated gradient all-reduce alone: params-shaped psum over the mesh
if mesh is not None:
    from jax.experimental.shard_map import shard_map

    grads = jax.tree.map(jnp.ones_like, ts1.params)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=P(), out_specs=P(), check_rep=False
    )
    def allreduce(g):
        return jax.tree.map(lambda x: jax.lax.psum(x, "data"), g)

    res["allreduce_ms"] = timeit(allreduce, grads)
else:
    res["allreduce_ms"] = 0.0

print(json.dumps({k: round(v, 2) if isinstance(v, float) else v for k, v in res.items()}))
"""


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for n in args.devices:
        out = subprocess.run(
            [
                sys.executable,
                "-c",
                _WORKER,
                str(n),
                str(args.per_device_batch),
                str(args.steps),
            ],
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        if out.returncode != 0:
            print(out.stdout)
            print(out.stderr, file=sys.stderr)
            raise SystemExit(f"mesh size {n} failed")
        row = json.loads(out.stdout.strip().splitlines()[-1])
        rows.append(row)
        print(json.dumps(row))

    base = rows[0]
    print(
        "\n| devices | fused ms | ideal n×1dev ms | overhead ms | gen ms "
        "| step ms | allreduce ms |"
    )
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        ideal = base["fused_ms"] * r["devices"] / base["devices"]
        print(
            f"| {r['devices']} | {r['fused_ms']} | {ideal:.1f} "
            f"| {r['fused_ms'] - ideal:.1f} | {r['gen_ms']} | {r['step_ms']} "
            f"| {r['allreduce_ms']} |"
        )


if __name__ == "__main__":
    main()
