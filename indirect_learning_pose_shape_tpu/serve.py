"""Serving runtime: bucketed-batch inference without recompiles.

jit specializes on shapes, so a naive server recompiles the forward for
every distinct request batch size — on the tunneled TPU a fresh compile
costs 1-10 MINUTES, which turns the first odd-sized request into an
outage. The fix every production JAX server uses: pad the batch up to a
small set of bucket sizes, run the compiled bucket graph, slice the
outputs back. At most len(buckets) compiles ever happen, amortized to
zero; the padding waste is bounded by the bucket spacing (powers of two →
<2x, and the tail bucket runs at the best large-batch operating point).

Works over either forward:
    predictor = Predictor(cfg)                      # bf16 eval forward
    predictor = Predictor(cfg, qparams=qp)          # int8 serving encoder
    out = predictor(images)                         # any batch size

The reference has no serving runtime at all (SURVEY.md §2.11 — its demo
scripts run fixed-size batches); this is deployment machinery sized for
the TPU compile model.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from indirect_learning_pose_shape_tpu import configs
from indirect_learning_pose_shape_tpu.models import network as net


DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


class Predictor:
    """Shape-bucketed inference wrapper around the flagship forward.

    One jit cache entry per bucket actually used; outputs are sliced back
    to the true batch size. Thread-compatible for the common
    single-dispatcher server loop (jit itself is thread-safe; Python-side
    state here is append-only caches).
    """

    def __init__(
        self,
        cfg: configs.TrainConfig,
        params,
        state,
        consts: net.ModelConsts,
        qparams: Optional[dict] = None,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        int8_impl: str = "int8c",
    ):
        if not buckets or any(b <= 0 for b in buckets):
            raise ValueError(f"buckets must be positive, got {buckets!r}")
        self.cfg = cfg
        self.params = params
        self.state = state
        self.consts = consts
        self.qparams = qparams
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))

        model_cfg = cfg.model
        if qparams is None:

            def fwd(images):
                outputs, _ = net.forward(
                    params, state, consts, images, model_cfg, train=False
                )
                return outputs

        else:
            from indirect_learning_pose_shape_tpu.models import quantize as quant

            def fwd(images):
                return quant.quantized_forward(
                    qparams, params["ief"], consts, images, model_cfg,
                    impl=int8_impl,
                )

        self._fwd = jax.jit(fwd)  # one cache entry per padded shape = per bucket

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(
            f"batch {n} exceeds largest bucket {self.buckets[-1]}; "
            "split the request or extend buckets"
        )

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Pre-compile chosen buckets (all by default) before serving traffic."""
        size = self.cfg.model.image_size
        for b in buckets or self.buckets:
            self._fwd(jnp.zeros((self.bucket_for(b), size, size, 3), jnp.float32))

    def __call__(self, images) -> dict:
        """images [N, S, S, 3] float32 in [-1, 1], any N within buckets."""
        images = jnp.asarray(images)
        n = images.shape[0]
        b = self.bucket_for(n)
        if b != n:
            pad = [(0, b - n)] + [(0, 0)] * (images.ndim - 1)
            images = jnp.pad(images, pad)
        outputs = self._fwd(images)
        if b != n:
            outputs = {k: v[:n] for k, v in outputs.items()}
        return outputs
