"""Serving benchmark: bf16 vs int8-PTQ inference latency and throughput.

The inference path (encoder → IEF → SMPL → projection; no rasterizer) is the
deployment workload — SURVEY.md §2.11's predict/demo role productionized.
Measures, per batch size:
  - bf16: the standard eval forward (fold_bn_eval taken from the preset)
  - int8: models/quantize.py quantized_forward with true int8 convs. The
    rate win is TPU-specific (double-rate int8 MXU); on CPU the numbers
    only sanity-check the path, and the JSON records the backend.

Timing uses the same two-point windows as bench.py: the fetch fence's
host↔device round trip (~40 ms over the remote-chip tunnel) is cancelled by
differencing an N- and a 2N-step window.

    python benchmarks/serving.py [--batches 1 32 128] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _time_fn(fn, args, steps: int, warmup: int, fence) -> float:
    """Seconds per call via two-point windows (see bench.py)."""
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fence(out)
    t1 = time.perf_counter()
    for _ in range(2 * steps):
        out = fn(*args)
    fence(out)
    t2 = time.perf_counter()
    dt = (t2 - t1) - (t1 - t0)
    if not dt > 0:
        dt, steps = t2 - t1, 2 * steps
    return dt / steps


def main():
    from indirect_learning_pose_shape_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 32, 128])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--preset", default="config4_full")
    ap.add_argument(
        "--keep-bf16", nargs="*", default=[], metavar="SITE",
        help="encoder sites (names or prefixes, e.g. stem s3) kept bf16 in "
        "the int8 paths (models/quantize.py keep_sites Pareto knob)",
    )
    ap.add_argument(
        "--chained",
        type=int,
        default=0,
        metavar="K",
        help="also measure on-device latency: K data-chained forwards "
        "inside one jit (lax.scan; iteration i+1's input depends on "
        "iteration i's output). Per-call dispatch timing of a ~1 ms op "
        "through the remote-chip tunnel measures the ~1-3 ms/dispatch "
        "control plane, not the chip — this is the device-rate view, the "
        "number that matters for latency-critical serving on a local host.",
    )
    args = ap.parse_args()

    from indirect_learning_pose_shape_tpu import configs
    from indirect_learning_pose_shape_tpu.data import synthetic
    from indirect_learning_pose_shape_tpu.models import network as net
    from indirect_learning_pose_shape_tpu.models import quantize as q
    from indirect_learning_pose_shape_tpu.utils import assets as assets_lib
    from indirect_learning_pose_shape_tpu.utils.metrics import fetch_fence

    cfg = configs.PRESETS[args.preset]
    backend = jax.default_backend()
    impl = "int8"

    params, state, consts = net.init(
        jax.random.PRNGKey(0), assets_lib.load_asset(), cfg.model
    )
    calib = synthetic.generate_batch(
        jax.random.PRNGKey(17), 16, consts, cfg.model, cfg.synthetic
    )["image"]
    qparams = q.ptq_quantize(
        params["encoder"], state["encoder"], cfg.model.encoder, calib,
        keep_sites=tuple(args.keep_bf16),
    )

    bf16_fwd = jax.jit(
        lambda p, s, im: net.forward(p, s, consts, im, cfg.model, train=False)[0][
            "theta"
        ]
    )
    int8_fwd = jax.jit(
        lambda qp, ip, im: q.quantized_forward(
            qp, ip, consts, im, cfg.model, impl=impl
        )["theta"]
    )
    # Carried-int8 path: activations stay int8 across layers (requant fused
    # into each conv epilogue; models/quantize.py int8c).
    int8c_fwd = jax.jit(
        lambda qp, ip, im: q.quantized_forward(
            qp, ip, consts, im, cfg.model, impl="int8c"
        )["theta"]
    )
    fence = lambda out: fetch_fence(out[0, 0])  # noqa: E731

    results = []
    size = cfg.model.image_size
    for b in args.batches:
        images = jax.random.uniform(
            jax.random.PRNGKey(b), (b, size, size, 3), jnp.float32, -1, 1
        )
        sec_bf16 = _time_fn(bf16_fwd, (params, state, images), args.steps, 3, fence)
        sec_int8 = _time_fn(int8_fwd, (qparams, params["ief"], images), args.steps, 3, fence)
        sec_int8c = _time_fn(int8c_fwd, (qparams, params["ief"], images), args.steps, 3, fence)
        chained = {}
        if args.chained:
            K = args.chained

            def _chain(fwd, fwd_args):
                def run(*a):
                    def body(im, _):
                        th = fwd(*a, im)
                        # Value-neutral data dependency: the next input
                        # reads this output, so the scan cannot collapse.
                        return im + 1e-30 * jnp.mean(th), jnp.mean(th)

                    _, ys = jax.lax.scan(body, images, None, length=K)
                    return ys

                f = jax.jit(run)
                sec = _time_fn(
                    f, fwd_args, max(2, args.steps // 10),
                    2, lambda out: fetch_fence(out[0]),
                )
                return sec / K

            chained = {
                "bf16_device_ms": round(
                    _chain(lambda p, s, im: bf16_fwd(p, s, im), (params, state)) * 1e3, 3
                ),
                "int8c_device_ms": round(
                    _chain(
                        lambda qp, ip, im: int8c_fwd(qp, ip, im),
                        (qparams, params["ief"]),
                    ) * 1e3, 3,
                ),
                "chained_k": K,
            }
        row = {
            "batch": b,
            "backend": backend,
            "int8_impl": impl,
            "bf16_ms": round(sec_bf16 * 1e3, 3),
            "int8_ms": round(sec_int8 * 1e3, 3),
            "int8c_ms": round(sec_int8c * 1e3, 3),
            "bf16_imgs_per_sec": round(b / sec_bf16, 1),
            "int8_imgs_per_sec": round(b / sec_int8, 1),
            "int8c_imgs_per_sec": round(b / sec_int8c, 1),
            "int8_speedup": round(sec_bf16 / sec_int8, 3),
            "int8c_speedup": round(sec_bf16 / sec_int8c, 3),
            **chained,
        }
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
