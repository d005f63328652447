"""Post-training int8 quantization of the encoder for TPU serving.

The reference has no quantized deploy path (SURVEY.md §2.11 covers fp32
inference only); this module is a beyond-parity serving capability sized for
TPU hardware: v5e-class chips run int8 matmuls at 2x the bf16 MXU rate, and
the encoder is ~60% of inference device time (docs/DESIGN.md profile), so an
int8 encoder is the single highest-leverage serving optimisation available.

Scheme — standard static PTQ, symmetric:
- BN folded into conv weights at running statistics (same fold as
  EncoderConfig.fold_bn_eval), so each site is conv -> bias -> (relu/add).
- Weights: per-output-channel symmetric int8, scale = absmax/127 over
  [kh,kw,cin].
- Activations: per-tensor symmetric int8, scale calibrated as absmax/127
  over a calibration batch run through the folded f32 network. Symmetric
  (not affine) quantization halves the usable range post-ReLU but keeps the
  conv a pure int8xint8->int32 op with a single rescale — no zero-point
  cross terms — which is what lowers cleanly onto the MXU.
- Residual adds, ReLU, max-pool and global-average-pool stay f32: the
  dequantized domain between convs. All FLOPs live in the convs.

Two execution impls, one math:
- impl='int8': true int8 convs with int32 accumulation
  (preferred_element_type) — the serving path (int8 lowers on both TPU and
  XLA:CPU; tested equivalent on CPU, perf-relevant on TPU).
- impl='sim': identical quantize/dequantize rounding but the conv runs in
  f32 on dequantized values. Exactly equal to 'int8' modulo f32 accumulation
  rounding (f32 sums >2^24 of the int products can round; int32 is exact).
  Kept as the readable reference semantics the equivalence test pins the
  int8 path against (tests/test_quantize.py).

The quantized encoder feeds the unmodified f32/bf16 head via
network.head_from_features — IEF/SMPL/projection are <1% of inference
FLOPs and numerically sensitive (rot6d orthonormalisation, kinematic
chain), so quantizing them buys nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from indirect_learning_pose_shape_tpu.models import encoder as enc
from indirect_learning_pose_shape_tpu.models import network as net


_QMAX = 127.0


# ---------------------------------------------------------------------------
# BN folding: conv+BN(eval) -> conv' + bias
# ---------------------------------------------------------------------------


def _fold_site(w, bnp, bns, eps):
    inv = jax.lax.rsqrt(bns["var"] + eps) * bnp["scale"]
    shift = bnp["bias"] - bns["mean"] * inv
    return w.astype(jnp.float32) * inv, shift.astype(jnp.float32)


def _conv_names(block_params):
    names = [("conv1", "bn1"), ("conv2", "bn2")]
    if "conv3" in block_params:
        names.append(("conv3", "bn3"))
    if "proj" in block_params:
        names.append(("proj", "bn_proj"))
    return names


def fold_bn(params: dict, state: dict, cfg: enc.EncoderConfig) -> dict:
    """Folded eval-mode conv sites: {site_name: (w_f32, bias_f32)}.

    Site names: 'stem' and 's{stage}b{block}/{conv1|conv2|conv3|proj}'.
    """
    sites = {"stem": _fold_site(params["stem"], params["bn_stem"], state["bn_stem"], cfg.bn_eps)}
    for name, p in params.items():
        if not isinstance(p, dict) or name in ("bn_stem",):
            continue
        for cname, bnname in _conv_names(p):
            sites[f"{name}/{cname}"] = _fold_site(
                p[cname], p[bnname], state[name][bnname], cfg.bn_eps
            )
    return sites


# ---------------------------------------------------------------------------
# Shared structure walker
# ---------------------------------------------------------------------------


def _walk(images, cfg: enc.EncoderConfig, has_proj, conv_op):
    """Run the ResNet topology with `conv_op(x, site, stride, stem)` supplying
    every conv+bias; mirrors encoder_apply/_block_apply (eval mode)."""
    blocks = enc._STAGE_BLOCKS[cfg.depth]
    bottleneck = cfg.depth >= 50
    x = images.astype(jnp.float32)
    x = jax.nn.relu(conv_op(x, "stem", 2, stem=True))
    x = enc._max_pool_ref(x)
    for stage, n in enumerate(blocks):
        for b in range(n):
            stride = 2 if (b == 0 and stage > 0) else 1
            name = f"s{stage}b{b}"
            shortcut = x
            if has_proj(name):
                shortcut = conv_op(x, f"{name}/proj", stride, stem=False)
            if bottleneck:
                y = jax.nn.relu(conv_op(x, f"{name}/conv1", 1, stem=False))
                y = jax.nn.relu(conv_op(y, f"{name}/conv2", stride, stem=False))
                y = conv_op(y, f"{name}/conv3", 1, stem=False)
            else:
                y = jax.nn.relu(conv_op(x, f"{name}/conv1", stride, stem=False))
                y = conv_op(y, f"{name}/conv2", 1, stem=False)
            x = jax.nn.relu(y + shortcut)
    return jnp.mean(x, axis=(1, 2))


def _s2d_input(x):
    """Space-to-depth rearrangement of the stem input (see enc._stem_conv_s2d)."""
    B, H, W, Cin = x.shape
    xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
    Hp, Wp = xp.shape[1] // 2, xp.shape[2] // 2
    return (
        xp.reshape(B, Hp, 2, Wp, 2, Cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, Hp, Wp, 4 * Cin)
    )


def _s2d_kernel(w):
    """7x7 stem kernel -> 4x4 kernel over 4*Cin channels (see enc._stem_conv_s2d)."""
    Cin, C = w.shape[2], w.shape[3]
    w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    return (
        w8.reshape(4, 2, 4, 2, Cin, C).transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * Cin, C)
    )


def _conv_nhwc(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else None,
    )


def _sym_pad(k):
    p = (k - 1) // 2
    return ((p, p), (p, p))


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


def calibrate(folded: dict, images: jax.Array, cfg: enc.EncoderConfig):
    """Folded-f32 forward; returns (features, {site: input_absmax})."""
    absmax = {}

    def conv_op(x, site, stride, stem):
        absmax[site] = jnp.max(jnp.abs(x))
        w, b = folded[site]
        if stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            y = _conv_nhwc(_s2d_input(x), _s2d_kernel(w), 1, "VALID")
        else:
            y = _conv_nhwc(x, w, stride, _sym_pad(w.shape[0]))
        return y + b

    feat = _walk(images, cfg, lambda n: f"{n}/proj" in folded, conv_op)
    return feat, absmax


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------


def _quantize_weight(w):
    """Per-output-channel symmetric int8. Returns (w_int8, scale [cout])."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / _QMAX
    q = jnp.clip(jnp.round(w / s), -_QMAX, _QMAX).astype(jnp.int8)
    return q, s


def _site_kept(site: str, keep_sites) -> bool:
    """True if `site` matches any keep pattern (exact name or prefix —
    'stem' keeps the stem, 's3' keeps every stage-3 conv)."""
    return any(site == p or site.startswith(p) for p in keep_sites)


def ptq_quantize(
    params: dict,
    state: dict,
    cfg: enc.EncoderConfig,
    calib_images: jax.Array,
    keep_sites: tuple = (),
) -> dict:
    """Calibrate + quantize. Returns the qparams pytree:

    {site: {'w': int8, 'w_scale': f32 [cout], 'bias': f32 [cout],
            'act_scale': f32 scalar}}
    The stem site's weight is stored pre-transformed to the space-to-depth
    4x4 layout (serving inputs must have even H, W — standard 256²).

    `keep_sites` (site names or prefixes, e.g. ("stem", "s3")) marks sites to
    run in bf16 instead of int8: those sites additionally store 'w_bf16'
    (the folded weight) and the serving paths skip BOTH the weight rounding
    and — on the carried path — the activation requantization feeding them.
    Motivation: carried-int8's only protocol accuracy cost is +0.17 px
    keypoint error / −1.8% relative mIoU from per-handoff activation
    rounding (BASELINE.md §serving); this knob makes that a per-site
    accuracy/throughput Pareto choice instead of an all-or-nothing int8
    switch. The measured keep-variant rows (throughput + protocol
    accuracy for stem / s4 / both) are BASELINE.md's keep_sites table.
    """
    folded = fold_bn(params, state, cfg)
    # A keep pattern that matches no site is a silent accuracy no-op (the
    # classic: asking for the "final stage" as 's4' when stages are s0-s3)
    # — refuse loudly, the repo's convention for label/name knobs.
    unmatched = [
        p for p in keep_sites if not any(_site_kept(s, (p,)) for s in folded)
    ]
    if unmatched:
        raise ValueError(
            f"keep_sites patterns {unmatched} match no encoder site; "
            f"sites are {sorted(folded)}"
        )
    _, absmax = jax.jit(calibrate, static_argnums=2)(folded, calib_images, cfg)
    qparams = {}
    for site, (w, b) in folded.items():
        if site == "stem":
            w = _s2d_kernel(w)
        wq, ws = _quantize_weight(w)
        qparams[site] = {
            "w": wq,
            "w_scale": ws,
            "bias": b,
            "act_scale": jnp.maximum(absmax[site], 1e-12) / _QMAX,
        }
        if _site_kept(site, keep_sites):
            qparams[site]["w_bf16"] = w.astype(jnp.bfloat16)
    return qparams


# ---------------------------------------------------------------------------
# Quantized forward
# ---------------------------------------------------------------------------


def quantized_encoder_apply(
    qparams: dict, images: jax.Array, cfg: enc.EncoderConfig, impl: str = "int8"
) -> jax.Array:
    """images [B,H,W,3] f32 -> features [B,D] f32, through int8 convs.

    impl='int8' (TPU, f32 activations between convs) | 'sim' (portable
    fake-quant; equal math, f32 accum) | 'int8c'/'simc' (activations
    CARRIED int8 across layers — see quantized_encoder_apply_carried).
    """
    if impl in ("int8c", "simc"):
        return quantized_encoder_apply_carried(qparams, images, cfg, impl=impl)
    if impl not in ("int8", "sim"):
        raise ValueError(
            f"impl must be one of 'int8', 'sim', 'int8c', 'simc', got {impl!r}"
        )

    def conv_op(x, site, stride, stem):
        q = qparams[site]
        s_x = q["act_scale"]
        if stem:
            if x.shape[1] % 2 or x.shape[2] % 2:
                raise ValueError(
                    "int8 serving path requires even input H, W "
                    f"(got {x.shape[1]}x{x.shape[2]})"
                )
            x = _s2d_input(x)
            stride, padding = 1, "VALID"
        else:
            padding = _sym_pad(q["w"].shape[0])
        if "w_bf16" in q:  # bf16-kept site: no weight or activation rounding
            y = _conv_nhwc(
                x.astype(jnp.bfloat16), q["w_bf16"], stride, padding
            ).astype(jnp.float32)
            return y + q["bias"]
        xq = jnp.clip(jnp.round(x / s_x), -_QMAX, _QMAX)
        if impl == "int8":
            y = _conv_nhwc(xq.astype(jnp.int8), q["w"], stride, padding)
            y = y.astype(jnp.float32) * (s_x * q["w_scale"])
        else:
            w_dq = q["w"].astype(jnp.float32) * q["w_scale"]
            y = _conv_nhwc(xq * s_x, w_dq, stride, padding)
        return y + q["bias"]

    return _walk(images, cfg, lambda n: f"{n}/proj" in qparams, conv_op)


def _max_pool_int8(x):
    """enc._max_pool_ref for integer dtypes (its -inf init only exists for
    floats). Max-pool commutes with the monotone round/clip requant, so
    pooling in the int8 domain is exact."""
    init = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype) if jnp.issubdtype(
        x.dtype, jnp.integer
    ) else -jnp.inf
    return jax.lax.reduce_window(
        x, init, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def quantized_encoder_apply_carried(
    qparams: dict, images: jax.Array, cfg: enc.EncoderConfig, impl: str = "int8c"
) -> jax.Array:
    """Fully-quantized serving path: activations stay int8 ACROSS layers.

    Motivation (BASELINE.md §serving): the per-site path ('int8') loses ~7%
    end-to-end to bf16 because every conv is bracketed by an f32→int8
    quantize and an int32→f32 dequantize — the f32 activations written and
    re-read between layers cost more HBM traffic than the double-rate int8
    MXU saves. Here each conv's epilogue (rescale + bias + relu + requantize
    to the NEXT site's calibrated scale) emits int8 directly, so the tensor
    materialized between layers is 1 byte/element instead of 4 — the
    standard fully-integer inference pipeline, laid out so XLA can fuse the
    whole epilogue into the convolution.

    Numerics: intermediate activations take ONE extra round/clip vs 'int8'
    (which keeps exact f32 between convs); residual adds and the final
    global-average-pool stay f32. Scales reuse the same per-site calibration
    (a site's input scale IS its producer's output scale, by construction of
    `calibrate`). impl='int8c' runs true int8 convs; 'simc' is the f32-accum
    twin (identical rounding, portable) the equivalence test pins against.
    """
    if impl not in ("int8c", "simc"):
        raise ValueError(f"impl must be 'int8c' or 'simc', got {impl!r}")
    int8_convs = impl == "int8c"
    blocks = enc._STAGE_BLOCKS[cfg.depth]
    bottleneck = cfg.depth >= 50

    # Activations are carried as (tensor, real): real=True means true f32
    # values (feeding a bf16-kept site — no rounding), real=False means
    # int8-valued at the CONSUMER site's act_scale. `requant` picks the
    # format its consumer wants; `conv` accepts either.

    def requant(y_f32, site):
        if "w_bf16" in qparams[site]:
            return y_f32, True
        q = jnp.clip(jnp.round(y_f32 / qparams[site]["act_scale"]), -_QMAX, _QMAX)
        return (q.astype(jnp.int8) if int8_convs else q), False

    def conv(x, real, site, stride, padding):
        q = qparams[site]
        if "w_bf16" in q:  # bf16-kept site
            xf = x if real else (
                x.astype(jnp.float32) * q["act_scale"]
                if int8_convs
                else x * q["act_scale"]
            )
            y = _conv_nhwc(
                xf.astype(jnp.bfloat16), q["w_bf16"], stride, padding
            ).astype(jnp.float32)
            return y + q["bias"]
        if real:
            x = jnp.clip(jnp.round(x / q["act_scale"]), -_QMAX, _QMAX)
            if int8_convs:
                x = x.astype(jnp.int8)
        if int8_convs:
            acc = _conv_nhwc(x, q["w"], stride, padding)
            y = acc.astype(jnp.float32) * (q["act_scale"] * q["w_scale"])
        else:
            w_dq = q["w"].astype(jnp.float32) * q["w_scale"]
            y = _conv_nhwc(x * q["act_scale"], w_dq, stride, padding)
        return y + q["bias"]

    x = images.astype(jnp.float32)
    if x.shape[1] % 2 or x.shape[2] % 2:
        raise ValueError(
            "int8 serving path requires even input H, W "
            f"(got {x.shape[1]}x{x.shape[2]})"
        )
    # Block order, so each block knows its successor's input scale.
    names = [f"s{s}b{b}" for s, n in enumerate(blocks) for b in range(n)]

    y = jax.nn.relu(conv(_s2d_input(x), True, "stem", 1, "VALID"))
    xq, real = requant(y, f"{names[0]}/conv1")
    xq = _max_pool_int8(xq)

    for i, name in enumerate(names):
        stage, b = int(name[1]), int(name[3:].split("b")[-1])
        stride = 2 if (b == 0 and stage > 0) else 1
        s_in = qparams[f"{name}/conv1"]["act_scale"]
        if f"{name}/proj" in qparams:
            # proj's calibrated input scale equals conv1's (same tensor).
            shortcut = conv(xq, real, f"{name}/proj", stride, _sym_pad(qparams[f"{name}/proj"]["w"].shape[0]))
        else:
            shortcut = xq if real else xq.astype(jnp.float32) * s_in
        pad = lambda site: _sym_pad(qparams[site]["w"].shape[0])
        if bottleneck:
            h = jax.nn.relu(conv(xq, real, f"{name}/conv1", 1, pad(f"{name}/conv1")))
            h, hr = requant(h, f"{name}/conv2")
            h = jax.nn.relu(conv(h, hr, f"{name}/conv2", stride, pad(f"{name}/conv2")))
            h, hr = requant(h, f"{name}/conv3")
            yb = conv(h, hr, f"{name}/conv3", 1, pad(f"{name}/conv3"))
        else:
            h = jax.nn.relu(conv(xq, real, f"{name}/conv1", stride, pad(f"{name}/conv1")))
            h, hr = requant(h, f"{name}/conv2")
            yb = conv(h, hr, f"{name}/conv2", 1, pad(f"{name}/conv2"))
        out = jax.nn.relu(yb + shortcut)
        if i + 1 < len(names):
            xq, real = requant(out, f"{names[i + 1]}/conv1")
        else:
            return jnp.mean(out, axis=(1, 2))


def save_qparams(path: str, qparams: dict) -> None:
    """Serialize a quantized-encoder pytree to one .npz (quantize once,
    deploy many — predict/eval hosts then skip calibration entirely)."""
    import numpy as np

    flat = {}
    for site, q in qparams.items():
        for field, v in q.items():
            if field == "w_bf16":  # npz has no bfloat16; round-trip via f32
                v = jnp.asarray(v, jnp.float32)
            flat[f"{site}::{field}"] = np.asarray(v)
    np.savez(path, **flat)


def load_qparams(path: str) -> dict:
    """Inverse of save_qparams. Validates dtypes (w must be int8)."""
    import numpy as np

    qparams: dict = {}
    with np.load(path) as z:
        for key in z.files:
            site, field = key.split("::", 1)
            v = jnp.asarray(z[key])
            if field == "w_bf16":
                v = v.astype(jnp.bfloat16)
            qparams.setdefault(site, {})[field] = v
    for site, q in qparams.items():
        missing = {"w", "w_scale", "bias", "act_scale"} - set(q)
        if missing:
            raise ValueError(f"qparams site {site!r} missing fields {sorted(missing)}")
        if q["w"].dtype != jnp.int8:
            raise ValueError(f"qparams site {site!r} weight dtype {q['w'].dtype}, want int8")
    return qparams


def quantized_forward(
    qparams: dict,
    ief_params: dict,
    consts: net.ModelConsts,
    images: jax.Array,
    cfg: net.ModelConfig,
    impl: str = "int8",
) -> dict:
    """Full int8-encoder inference: images -> the forward() outputs dict.

    The head (IEF -> SMPL -> projection) is the unmodified f32 path via
    network.head_from_features.
    """
    with jax.named_scope("encoder_int8"):
        feat = quantized_encoder_apply(qparams, images, cfg.encoder, impl=impl)
    return net.head_from_features(ief_params, consts, feat, cfg)
