"""Benchmark entry point: full indirect train step throughput (BASELINE config 4).

Times the flagship workload — encoder(ResNet-18, 256²) → IEF → SMPL(6890
verts) → weak-persp projection → differentiable soft raster at 256² →
render+keypoint losses → backward → Adam, with on-device synthetic batch
generation — on the default accelerator, and the identical step on the host
CPU as the reference point (the reference implementation is CPU/single-GPU
era TF; BASELINE.json:5 sets the ≥10×-vs-CPU target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value
is train images/sec/chip on the accelerator and vs_baseline is the
accelerator/CPU throughput ratio.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp


def _throughput(
    device,
    batch_size: int,
    steps: int,
    warmup: int = 2,
    force_xla: bool = False,
    two_point: bool = True,
) -> float:
    """Train-step throughput (images/sec) for config-4 on `device`."""
    from indirect_learning_pose_shape_tpu import configs, train
    from indirect_learning_pose_shape_tpu.utils import assets as assets_lib
    from indirect_learning_pose_shape_tpu.utils.metrics import fetch_fence

    cfg = dataclasses.replace(configs.CONFIG4_FULL, batch_size=batch_size)
    if force_xla:
        # Host baseline: 'auto' would pick the TPU Pallas kernels (the
        # process default backend is the accelerator), which can't lower
        # for a CPU-placed jit.
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, smpl_impl="xla", raster_impl="xla"),
        )
    asset = assets_lib.load_asset()
    ts, consts = train.init_state(cfg, asset)
    ts = jax.device_put(ts, device)
    consts = jax.device_put(consts, device)
    fused = train.compile_fused_step(cfg, consts)

    # Sync by VALUE FETCH (utils.metrics.fetch_fence), not
    # block_until_ready, which through the remote-chip tunnel has been
    # observed to return without fencing.
    for _ in range(warmup):
        ts, terms = fused(ts)
    assert bool(jnp.isfinite(fetch_fence(terms["total"]))), "non-finite warmup"

    if not two_point:
        # Single-window timing: fine when the fence round trip is
        # negligible vs the window (the 25 s/step CPU baseline).
        t0 = time.perf_counter()
        for _ in range(steps):
            ts, terms = fused(ts)
        total = fetch_fence(terms["total"])
        dt = time.perf_counter() - t0
        assert bool(jnp.isfinite(total)), "non-finite loss in benchmark"
        return batch_size * steps / dt

    # Two-point timing: the fence's host↔device round trip (~38 ms via
    # the tunnel — ~8% of a 12-step b128 window) sits inside any single
    # timed window. Timing an N-step and a 2N-step window and taking the
    # difference cancels it exactly, leaving N steps of pure device time.
    t0 = time.perf_counter()
    for _ in range(steps):
        ts, terms = fused(ts)
    fetch_fence(terms["total"])
    t1 = time.perf_counter()
    for _ in range(2 * steps):
        ts, terms = fused(ts)
    total = fetch_fence(terms["total"])
    t2 = time.perf_counter()
    dt = (t2 - t1) - (t1 - t0)
    if not dt > 0:
        # Pipeline anomaly (e.g. the first window absorbed queued work):
        # fall back to the 2N window, which merely re-includes one RTT.
        dt, steps = t2 - t1, 2 * steps
    assert bool(jnp.isfinite(total)), "non-finite loss in benchmark"
    return batch_size * steps / dt


def _probe_backend(timeout_s: int = 240) -> bool:
    """True if backend init completes within timeout_s, else False.

    The remote-chip tunnel can go down entirely; jax.devices() then blocks
    for minutes inside C++ before raising UNAVAILABLE (seen >6 h on
    2026-08-17/18). Probing in a SUBPROCESS keeps this process clean and
    bounds the wait, so the bench emits a diagnosable JSON line instead of
    wedging the driver.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    from indirect_learning_pose_shape_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import os

    if not _probe_backend():
        print(
            json.dumps(
                {
                    "metric": "train_images_per_sec_per_chip_config4",
                    "value": 0.0,
                    "unit": "images/sec/chip",
                    "vs_baseline": 0.0,
                    "error": "accelerator backend init timed out (tunnel down?)",
                }
            )
        )
        return
    accel = jax.devices()[0]
    batch = 32
    accel_imgs_per_sec = _throughput(accel, batch_size=batch, steps=30, warmup=5)
    # Best-batch operating point (BASELINE.md batch-scaling table): larger
    # batches amortize launch/HBM overheads; report it alongside the
    # config-4 b32 headline so the peak-throughput preset is measured too.
    best_batch = 128
    best_imgs_per_sec = _throughput(accel, batch_size=best_batch, steps=12, warmup=3)

    vs_baseline = float("nan")
    cpu_cores = os.cpu_count() or 1
    # Denominator policy (ADVICE r2): the batch-1 CPU measurement is only a
    # fair per-image rate when the host cannot amortize batching — measured
    # batch-invariant on a 1-core host (25.0 s/img at b1 vs 25.3 at b4). On
    # a multi-core host batch 1 would UNDERSTATE CPU throughput and inflate
    # the ratio, so there the denominator is batch-matched-per-core instead
    # (batch = min(cores, 4), still bounded by the bench budget), and the
    # JSON records which was used.
    cpu_batch = 1 if cpu_cores == 1 else min(cpu_cores, 4)
    try:
        cpu = jax.devices("cpu")[0]
        cpu_imgs_per_sec = _throughput(
            cpu, batch_size=cpu_batch, steps=2, warmup=1, force_xla=True,
            two_point=False,  # ~25 s/step: the fence RTT is negligible
        )
        vs_baseline = accel_imgs_per_sec / cpu_imgs_per_sec
    except Exception as e:  # CPU backend unavailable: report accel number only
        print(f"cpu baseline unavailable: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip_config4",
                "value": round(accel_imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs_baseline, 2),
                "steps_per_sec": round(accel_imgs_per_sec / batch, 2),
                "value_best_batch": round(best_imgs_per_sec, 2),
                "best_batch": best_batch,
                "cpu_batch_size": cpu_batch,
                "cpu_cores": cpu_cores,
            }
        )
    )


if __name__ == "__main__":
    main()
