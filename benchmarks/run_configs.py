#!/usr/bin/env python
"""Benchmark harness for the five BASELINE configs (BASELINE.json:6-12).

Prints one JSON line per config. `bench.py` at the repo root is the driver's
single-number entry point (config 4); this script fills in the full table in
BASELINE.md. Run on the accelerator (default backend).

Each compile costs minutes on this tunneled stack and the config-1 CPU
latency floor costs minutes more on a 1-core host, so configs are
individually selectable and the CPU floor runs last:

    python benchmarks/run_configs.py [--quick] [--skip-cpu] [--only 2 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _fence(out):
    """Sync by fetching one scalar element (see utils.metrics.fetch_fence:
    block_until_ready can return WITHOUT fencing through the tunnel)."""
    from indirect_learning_pose_shape_tpu.utils.metrics import fetch_fence

    fetch_fence(out)


def _timeit(fn, *args, steps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / steps


def _emit(name, value, unit, **extra):
    print(
        json.dumps({"config": name, "value": round(value, 3), "unit": unit, **extra}),
        flush=True,
    )


def config1_cpu_floor(asset, steps):
    """Single 256² crop forward, batch 1, host-CPU latency floor."""
    from indirect_learning_pose_shape_tpu import configs, train
    from indirect_learning_pose_shape_tpu.models import network as net

    cfg1 = configs.CONFIG1_SINGLE
    try:
        cpu = jax.devices("cpu")[0]
        m1 = dataclasses.replace(cfg1.model, smpl_impl="xla", raster_impl="xla")
        ts, consts = train.init_state(dataclasses.replace(cfg1, model=m1), asset)
        ts = jax.device_put(ts, cpu)
        consts = jax.device_put(consts, cpu)
        img = jax.device_put(jnp.zeros((1, 256, 256, 3)), cpu)
        fwd = jax.jit(
            lambda p, s, im: net.forward(p, s, consts, im, m1, train=False)[0]["theta"]
        )
        dt = _timeit(fwd, ts.params, ts.model_state, img, steps=max(3, steps // 4))
        _emit("config1_single_cpu", dt * 1e3, "ms/image (CPU latency floor)")
    except Exception as e:  # pragma: no cover
        print(f"# config1 cpu failed: {e}", file=sys.stderr)


def config2_smpl_batch(asset, steps):
    """Batched SMPL forward + weak-perspective projection, batch 64."""
    from indirect_learning_pose_shape_tpu.models import smpl as smpl_mod
    from indirect_learning_pose_shape_tpu.ops import camera

    consts2 = smpl_mod.smpl_consts(asset)
    pose = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (64, 72))
    betas = jax.random.normal(jax.random.PRNGKey(1), (64, 10))
    cam = jnp.tile(jnp.array([0.9, 0.0, 0.0]), (64, 1))

    def smpl_proj(p, b):
        out = smpl_mod.smpl_forward(consts2, p, b)
        return camera.project_pixel(out["kp3d"], cam, 256)

    dt = _timeit(jax.jit(smpl_proj), pose, betas, steps=steps)
    _emit("config2_smpl_batch64", 64 / dt, "SMPL fwd images/sec")

    # Device-rate variant: the op is sub-millisecond, so one-dispatch-per-
    # step timing above measures the tunnel control plane (~1-3 ms/dispatch,
    # session-dependent) rather than the chip. K data-chained forwards
    # inside ONE jit (lax.scan; each iteration's pose depends on the
    # previous projection, so nothing collapses) time the op itself.
    K = 50

    def chained(p, b):
        def body(pp, _):
            o = smpl_proj(pp, b)
            return pp + 1e-9 * jnp.mean(o), jnp.mean(o)

        _, ys = jax.lax.scan(body, p, None, length=K)
        return ys

    dt_k = _timeit(jax.jit(chained), pose, betas, steps=max(2, steps // 5)) / K
    _emit(
        "config2_smpl_batch64_device",
        64 / dt_k,
        "SMPL fwd images/sec (chained on-device)",
    )


def config3_render(asset, steps):
    """Differentiable render 256² + IoU/BCE loss fwd+bwd, batch 32."""
    from indirect_learning_pose_shape_tpu import configs, losses
    from indirect_learning_pose_shape_tpu.models import network as net
    from indirect_learning_pose_shape_tpu.models import smpl as smpl_mod
    from indirect_learning_pose_shape_tpu.ops import camera, raster

    cfg3 = configs.CONFIG3_RENDER
    consts3 = net.build_consts(asset, cfg3.model)
    pose = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (32, 72))
    betas = jax.random.normal(jax.random.PRNGKey(1), (32, 10))
    cam = jnp.tile(jnp.array([0.9, 0.0, 0.0]), (32, 1))
    v2d = camera.project_pixel(
        smpl_mod.smpl_forward(consts3.smpl, pose, betas)["verts"], cam, 256
    )
    target = (jax.random.uniform(jax.random.PRNGKey(2), (32, 256, 256)) > 0.5).astype(
        jnp.float32
    )

    def render_loss(v):
        r = raster.soft_rasterize(v, consts3.part_layout, cfg3.model.raster)
        return losses.silhouette_bce(r["silhouette"], target) + losses.silhouette_iou(
            r["silhouette"], target
        )

    dt = _timeit(jax.jit(jax.value_and_grad(render_loss)), v2d, steps=steps)
    _emit("config3_render_b32", 32 / dt, "render fwd+bwd images/sec")


def config4_full_train(asset, steps):
    """Full indirect train step (the bench.py headline), batch 32."""
    from indirect_learning_pose_shape_tpu import configs, train

    cfg4 = dataclasses.replace(configs.CONFIG4_FULL, batch_size=32)
    ts, consts4 = train.init_state(cfg4, asset)
    gen_fn, step_fn = train.compile_train_fns(cfg4, consts4)

    def one_step(ts):
        batch = gen_fn(ts.rng, ts.step)
        ts, terms = step_fn(ts, batch)
        return ts, terms

    for _ in range(2):
        ts, terms = one_step(ts)
    _fence(terms["total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        ts, terms = one_step(ts)
    _fence(terms["total"])
    dt = (time.perf_counter() - t0) / steps
    _emit(
        "config4_full_train_b32",
        32 / dt,
        "train images/sec/chip",
        steps_per_sec=round(1 / dt, 3),
    )


def config7_hard_targets(asset, steps, batches=(32, 128), k_faces=(0, 512)):
    """Hard-target (z-buffer) training cost: the full config4_r34 train
    step with `targets=hard` — what the robust recipes actually pay per
    step versus the ~13 ms soft-target step. Dense vs top_k-culled face
    modes; k=512's zero-overflow validity on this distribution is asserted
    by tests/test_raster_hard.py (dropped faces would silently corrupt
    targets, so the budget is test-gated, not assumed)."""
    from indirect_learning_pose_shape_tpu import configs, train

    for k in k_faces:
        for b in batches:
            cfg = dataclasses.replace(
                configs.CONFIG4_R34,
                batch_size=b,
                synthetic=dataclasses.replace(
                    configs.CONFIG4_R34.synthetic, targets="hard", hard_k_faces=k
                ),
            )
            ts, consts = train.init_state(cfg, asset)
            gen_fn, step_fn = train.compile_train_fns(cfg, consts)

            def one_step(ts):
                batch = gen_fn(ts.rng, ts.step)
                ts, terms = step_fn(ts, batch)
                return ts, terms

            for _ in range(2):
                ts, terms = one_step(ts)
            _fence(terms["total"])
            t0 = time.perf_counter()
            for _ in range(steps):
                ts, terms = one_step(ts)
            _fence(terms["total"])
            dt = (time.perf_counter() - t0) / steps
            _emit(
                f"config7_hard_train_b{b}_k{k or 'dense'}",
                b / dt,
                "train images/sec/chip (hard z-buffer targets)",
                ms_per_step=round(dt * 1e3, 2),
            )


def config6_inference(asset, steps):
    """Flagship inference throughput (BASELINE.json:2 images/sec/chip):
    full forward — encoder → IEF → SMPL → projection — batch 64, no raster
    (the rasterizer is training-only supervision machinery, SURVEY §3.2)."""
    from indirect_learning_pose_shape_tpu import configs, train
    from indirect_learning_pose_shape_tpu.models import network as net

    cfg = dataclasses.replace(configs.CONFIG2_SMPL_BATCH, batch_size=64)
    ts, consts = train.init_state(cfg, asset)
    fwd = jax.jit(
        lambda p, s, im: net.forward(p, s, consts, im, cfg.model, train=False)[0][
            "kp2d"
        ]
    )
    img = jax.random.uniform(
        jax.random.PRNGKey(3), (64, 256, 256, 3), minval=-1.0, maxval=1.0
    )
    dt = _timeit(fwd, ts.params, ts.model_state, img, steps=steps)
    _emit("config6_inference_b64", 64 / dt, "inference images/sec/chip")


def config5_data_parallel(asset, steps):
    """Data-parallel train step over all local devices."""
    from indirect_learning_pose_shape_tpu import configs, train
    from indirect_learning_pose_shape_tpu.parallel import mesh as mesh_lib

    ndev = len(jax.devices())
    cfg5 = dataclasses.replace(
        configs.CONFIG5_DATA_PARALLEL, batch_size=32 * ndev, num_devices=ndev
    )
    ts, consts5 = train.init_state(cfg5, asset)
    if ndev > 1:
        mesh = mesh_lib.make_mesh(ndev)
        ts = mesh_lib.replicate_pytree(ts, mesh)
        consts5 = mesh_lib.replicate_pytree(consts5, mesh)
        gen_fn, step_fn = train.compile_train_fns(cfg5, consts5, mesh)
    else:
        gen_fn, step_fn = train.compile_train_fns(cfg5, consts5)
    for _ in range(2):
        batch = gen_fn(ts.rng, ts.step)
        ts, terms = step_fn(ts, batch)
    _fence(terms["total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        batch = gen_fn(ts.rng, ts.step)
        ts, terms = step_fn(ts, batch)
    _fence(terms["total"])
    dt = (time.perf_counter() - t0) / steps
    _emit(
        "config5_data_parallel",
        cfg5.batch_size / dt,
        f"train images/sec over {ndev} device(s)",
        per_chip=round(cfg5.batch_size / dt / ndev, 3),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer timing steps")
    ap.add_argument(
        "--skip-cpu", action="store_true", help="skip the config-1 CPU latency floor"
    )
    ap.add_argument(
        "--only",
        type=int,
        nargs="+",
        default=None,
        help="run only these config numbers",
    )
    args = ap.parse_args()
    steps = 5 if args.quick else 20

    from indirect_learning_pose_shape_tpu.utils import assets as assets_lib

    asset = assets_lib.load_asset()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    def want(n):
        return args.only is None or n in args.only

    # TPU configs first; the (slow, 1-core) CPU floor last so the
    # accelerator numbers are never hostage to it.
    if want(2):
        config2_smpl_batch(asset, steps)
    if want(3):
        config3_render(asset, steps)
    if want(4):
        config4_full_train(asset, steps)
    if want(5):
        config5_data_parallel(asset, steps)
    if want(6):
        config6_inference(asset, steps)
    if want(7):
        config7_hard_targets(asset, steps)
    if want(1) and not args.skip_cpu:
        config1_cpu_floor(asset, steps)


if __name__ == "__main__":
    main()
