"""CNN image encoder (SURVEY.md §2.4): functional ResNet in plain pytrees.

The reference uses a Keras ResNet-style conv stack ([R-low] on the exact
backbone; SURVEY.md §0.1 item 4). The rebuild provides ResNet-18 and
ResNet-50 as pure functions over explicit parameter/state pytrees — no layer
objects — so the whole network jits, vmaps, shards, and checkpoints as data.

TPU-first choices:
- NHWC layout throughout (XLA:TPU's native conv layout).
- Optional bfloat16 compute: weights/activations cast to bf16 inside the
  conv stack (MXU native dtype), batch-norm statistics and parameter storage
  stay float32. Controlled by `compute_dtype`.
- BatchNorm is per-device (local batch stats) in training, running stats at
  eval — the standard data-parallel recipe; stats live in an explicit
  `state` pytree threaded through the step (no mutation).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    depth: int = 18  # 18 or 50
    width: int = 64  # stem channels
    compute_dtype: Any = jnp.bfloat16
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    # Max-pool backward: 'xla' = plain autodiff of reduce_window
    # (select_and_scatter), 'mask' = nine shifted equality-mask passes
    # (_max_pool_mask; even spatial sizes only, odd falls back to 'xla').
    # MEASURED: the mask form is SLOWER on the profiled chip — 12.97 →
    # 14.47 ms/step (b32, 256² config-4) and 36.7 → 40.1 (b128) — the
    # nine dense passes + parity reassembly cost more HBM traffic than
    # the 0.54 ms select_and_scatter they replace. Default stays 'xla';
    # the mask path remains as the measured-and-rejected alternative
    # (gradient-equivalent on tie-free input, tested).
    maxpool_grad: str = "xla"
    # Block stride-2 convs: 'strided' = plain strided conv (XLA lowers the
    # backward-wrt-input to an input-dilated transposed conv), 's2d' = the
    # stem's space-to-depth trick generalised: 3x3/2 becomes pad + 2x2-block
    # s2d + 2x2/1 conv over 4x channels, 1x1/2 becomes strided-slice + 1x1/1
    # (whose backward is a dense pad, not a dilated conv). Identical math —
    # weights stay in their logical [k,k,Cin,Cout] layout and are rearranged
    # inside the forward, so checkpoints/pretrained imports are unaffected
    # (equivalence tested in test_network.py). Odd spatial sizes fall back
    # to 'strided' per conv, like the stem does.
    # MEASURED: unlike the 3-channel stem (where s2d is the encoder's
    # single biggest win), s2d on the wide block convs is SLOWER on the
    # profiled chip — config-4 step 12.34 → 13.26 ms (b32), 35.75 → 38.00
    # (b128), flagship 21.62 → 23.21: at 64+ input channels the MXU is
    # already occupancy-saturated and the rewrite only adds the s2d
    # reshuffle traffic. Default stays 'strided'; the s2d form remains the
    # measured-and-rejected alternative (see maxpool_grad for the pattern).
    stride2_impl: str = "strided"
    # Block 1x1 convs: 'conv' = lax.conv_general_dilated, 'dot' = rank-4
    # dot_general over the channel dim (stride 2 slices the input grid
    # first — same pixels, padding is 0 for k=1 either way). Identical math;
    # the difference is the BACKWARD: a dot transposes into two dots, so the
    # wgrad is one [Cin, B·H·W]×[B·H·W, Cout] MXU matmul instead of XLA's
    # conv-wgrad path. Targets the R50 bottleneck blocks, where 1x1s carry
    # 51% of the conv FLOPs (177 of 345 GFLOP fwd at b32/256²) and the
    # round-3 audit measured backward convs at ~16% of bf16 peak
    # (docs/DESIGN.md round-4 R50 audit).
    conv1x1: str = "conv"
    # Eval-path conv+BN folding: at inference BN is a per-channel affine of
    # frozen running stats, so it folds into the preceding conv's weights
    # (w *= scale/sqrt(var+eps), plus a bias term) — one fewer full
    # elementwise pass over every activation tensor, exactly torch/cuDNN's
    # deploy-time fusion. Off by default so golden/parity tests measure the
    # unfused reference path; presets turn it on (bit-differences are bf16
    # rounding only, tested in test_network.py).
    fold_bn_eval: bool = False

    @property
    def feature_dim(self) -> int:
        return self.width * 8 * (4 if self.depth >= 50 else 1)


_STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _bn_state_init(c):
    return {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}


def _conv(x, w, stride=1):
    # Explicit symmetric padding (k-1)//2 — torch's Conv2d alignment. For
    # stride 1 and odd k this equals XLA SAME; for stride 2 on even inputs
    # SAME pads asymmetrically (lo=(k-1)//2-?, hi more), shifting the grid
    # one pixel vs torch. Symmetric padding keeps shapes identical AND makes
    # imported torchvision weights bit-comparable (tools/import_resnet_weights).
    p = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((p[0], p[0]), (p[1], p[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_s2d_3x3_s2(x, w):
    """3x3/2 conv (symmetric pad 1) as s2d + 2x2/1 conv — identical math.

    y[i,j] = Σ_{u,v∈0..2} w[u,v]·x[2i+u−1, 2j+v−1]. Zero-pad the kernel
    3→4 at the front (w4[u4]=w[u4−1]) and split by parity, u4=2u'+a:
    y[i] = Σ_{u',a} w4[2u'+a]·x[2(i+u'−1)+a], so with X[i',(a,·)] =
    xp[2i'+a] over xp = x padded (lo=2, hi=0) this is a 2x2 VALID conv
    over 4·Cin channels. Same motivation as the stem rewrite above: the
    strided form's backward-wrt-input is an input-dilated conv that the
    MXU runs at a fraction of peak; this form's backward is two dense
    stride-1 convs. Requires even H, W (caller falls back otherwise).
    """
    B, H, W, Cin = x.shape
    C = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (2, 0), (2, 0), (0, 0)))
    Hp, Wp = xp.shape[1] // 2, xp.shape[2] // 2
    X = (
        xp.reshape(B, Hp, 2, Wp, 2, Cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, Hp, Wp, 4 * Cin)
    )
    w4 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    W4 = (
        w4.reshape(2, 2, 2, 2, Cin, C)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(2, 2, 4 * Cin, C)
    )
    return jax.lax.conv_general_dilated(
        X,
        W4.astype(X.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_1x1_dot(x, w, stride):
    """1x1 conv as a rank-4 dot_general (stride 2 = every-other-pixel slice).

    Identical math to `_conv` for k=1 (padding is 0 either way; the stride-2
    grid starts at pixel 0 in both forms, odd or even H/W). The point is the
    BACKWARD: XLA transposes a dot into two dots — wgrad becomes one
    [Cin, B·H·W]×[B·H·W, Cout] matmul on the MXU — whereas the conv form's
    wgrad goes through the conv-backward path the R50 audit measured at ~16%
    of bf16 peak on the 1x1-heavy bottleneck blocks (docs/DESIGN.md round-4
    audit; EncoderConfig.conv1x1).
    """
    if stride == 2:
        x = x[:, ::2, ::2, :]
    return jax.lax.dot_general(
        x, w[0, 0].astype(x.dtype), (((3,), (0,)), ((), ()))
    )


def _conv2(x, w, stride: int, impl: str, conv1x1: str = "conv"):
    """Stride-dispatching conv: the s2d rewrites apply only where they help.

    1x1/2 under 's2d' drops the dead input rows/cols BEFORE the matmul
    (y[i,j] = w·x[2i,2j] exactly); its backward is a dense zero-pad.
    """
    if w.shape[0] == 1 and w.shape[1] == 1 and conv1x1 == "dot":
        return _conv_1x1_dot(x, w, stride)
    if stride == 2 and impl == "s2d" and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        if w.shape[0] == 3:
            return _conv_s2d_3x3_s2(x, w)
        if w.shape[0] == 1:
            return jax.lax.conv_general_dilated(
                x[:, ::2, ::2, :],
                w.astype(x.dtype),
                window_strides=(1, 1),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
    return _conv(x, w, stride)


def _stem_conv_s2d(x, w):
    """7x7/2 stem conv as a space-to-depth 4x4/1 conv — identical math.

    A stride-2 conv with 3 input channels runs the MXU at ~3/128 lane
    occupancy (the dominant cost of the whole encoder: 7.4 of 9.2 ms
    fwd+bwd at B=32, 256²). Packing 2x2 pixel quads into channels turns it
    into a stride-1 4x4 conv over 12 channels — 4x the occupancy, same
    result: with the kernel zero-padded 7->8 and split by parity,
        y[i,j] = Σ_{u,v} w[u,v]·x[2i+u−3, 2j+v−3]
               = Σ_{u',v',a,b} w8[2u'+a, 2v'+b]·X[i+u', j+v', (a,b,:)]
    where X is the padded input with 2x2 blocks moved into channels. The
    padding (lo=4, hi=2) with the kernel zero-padded at the FRONT (7->8)
    reproduces torch's symmetric pad=3 alignment for k=7, s=2 on even sizes
    (y[i] = Σ_u w[u]·x[2i+u-3] = Σ_{u8} w8[u8]·x[2(i+u'-2)+a] with
    u8=u+1=2u'+a); the extra rows/columns fall outside every kernel window.
    Gradients flow through the rearrangement as plain autodiff.
    """
    B, H, W, Cin = x.shape
    C = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
    Hp, Wp = xp.shape[1] // 2, xp.shape[2] // 2
    X = (
        xp.reshape(B, Hp, 2, Wp, 2, Cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, Hp, Wp, 4 * Cin)
    )
    w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w4 = (
        w8.reshape(4, 2, 4, 2, Cin, C)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * Cin, C)
    )
    return jax.lax.conv_general_dilated(
        X,
        w4.astype(X.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _max_pool_ref(x):
    """3x3/2 max-pool, symmetric pad 1 (torch alignment; see encoder_apply)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@jax.custom_vjp
def _max_pool_mask(x):
    """_max_pool_ref with a mask-form backward.

    Autodiff of reduce_window lowers the backward to `select_and_scatter`
    — 0.54 ms/step at B=32/256², the encoder's single most expensive
    non-conv op on the profiled chip. The gradient is instead computed as
    nine shifted equality-mask passes (one per 3x3 window offset), grouped
    by output parity so every slice is static — all dense elementwise ops
    that XLA fuses; no scatter. Semantics difference: where a window's max
    is TIED, select_and_scatter routes the cotangent to the first max in
    scan order while the mask form sends it to every tied position (the
    symmetric subgradient). Post-ReLU all-zero windows — the common tie —
    are unaffected downstream because ReLU's own backward zeroes those
    positions. Identical on tie-free inputs (tested).
    """
    return _max_pool_ref(x)


def _max_pool_mask_fwd(x):
    y = _max_pool_ref(x)
    return y, (x, y)


def _max_pool_mask_bwd(res, g):
    x, y = res
    B, H, W, C = x.shape
    Ho, Wo = y.shape[1], y.shape[2]
    # +inf padding makes out-of-range window slots fail the equality test;
    # 0 padding drops their cotangent.
    yp = jnp.pad(
        y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=jnp.inf
    )
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def contrib(x_sub, rows, cols):
        # Input position (2i+pr, 2j+pc) lies in window (i', j') iff
        # 2i'-1 <= 2i+pr <= 2i'+1: one window per axis at even parity
        # (padded offset 1), two at odd (offsets 1 and 2).
        acc = jnp.zeros_like(x_sub)
        for u in rows:
            for v in cols:
                ys = jax.lax.slice(yp, (0, u, v, 0), (B, u + Ho, v + Wo, C))
                gs = jax.lax.slice(gp, (0, u, v, 0), (B, u + Ho, v + Wo, C))
                acc = acc + jnp.where(x_sub == ys, gs, jnp.zeros_like(gs))
        return acc

    sub = {
        (pr, pc): contrib(
            x[:, pr::2, pc::2, :],
            (1,) if pr == 0 else (1, 2),
            (1,) if pc == 0 else (1, 2),
        )
        for pr in (0, 1)
        for pc in (0, 1)
    }
    top = jnp.stack([sub[(0, 0)], sub[(0, 1)]], axis=3).reshape(B, Ho, W, C)
    bot = jnp.stack([sub[(1, 0)], sub[(1, 1)]], axis=3).reshape(B, Ho, W, C)
    dx = jnp.stack([top, bot], axis=2).reshape(B, H, W, C)
    return (dx.astype(x.dtype),)


_max_pool_mask.defvjp(_max_pool_mask_fwd, _max_pool_mask_bwd)


def _batch_norm(x, p, s, train: bool, momentum: float, eps: float):
    """Returns (y, new_state). Stats computed/stored in f32.

    Single-pass statistics (E[x], E[x²] in one fused read of x, var by the
    Steiner shift) rather than mean-then-var: the BN stats pass is pure HBM
    bandwidth on TPU, and the two-reduction form made XLA read the (bf16)
    activation twice. f32 accumulation keeps the E[x²]−E[x]² cancellation at
    ~1e-7·mean²/var relative — far below the eps=1e-5 floor for conv
    activations. The normalize itself is a per-channel affine computed in
    f32 and applied in the compute dtype, so the elementwise pass stays
    bf16-wide and fuses into the surrounding conv/ReLU.
    """
    if train:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        meansq = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        new_s = {
            "mean": momentum * s["mean"] + (1 - momentum) * mean,
            "var": momentum * s["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + eps) * p["scale"]
    shift = p["bias"] - mean * inv
    y = x * inv.astype(x.dtype) + shift.astype(x.dtype)
    return y, new_s


def _conv_bn(x, w, bnp, bns, cfg: EncoderConfig, train: bool, conv_fn):
    """conv → BatchNorm, folded into one conv at eval when cfg.fold_bn_eval.

    The fold scales the conv weights per output channel in f32 (a
    [kh,kw,cin,cout] elementwise op — trivial next to the conv itself) and
    adds the affine shift to the conv output, eliminating the separate
    normalize pass over the activation tensor. Mathematically identical to
    conv+BN with running stats; numerically bf16-rounding-close (tested).
    """
    if not train and cfg.fold_bn_eval:
        inv = jax.lax.rsqrt(bns["var"] + cfg.bn_eps) * bnp["scale"]
        shift = bnp["bias"] - bns["mean"] * inv
        y = conv_fn(x, w * inv)
        return y + shift.astype(y.dtype), bns
    y = conv_fn(x, w)
    return _batch_norm(y, bnp, bns, train, cfg.bn_momentum, cfg.bn_eps)


def _block_init(key, cin, cout, bottleneck: bool, stride: int):
    ks = jax.random.split(key, 4)
    if bottleneck:
        mid = cout // 4
        p = {
            "conv1": _conv_init(ks[0], 1, 1, cin, mid),
            "bn1": _bn_init(mid),
            "conv2": _conv_init(ks[1], 3, 3, mid, mid),
            "bn2": _bn_init(mid),
            "conv3": _conv_init(ks[2], 1, 1, mid, cout),
            "bn3": _bn_init(cout),
        }
        s = {"bn1": _bn_state_init(mid), "bn2": _bn_state_init(mid), "bn3": _bn_state_init(cout)}
    else:
        p = {
            "conv1": _conv_init(ks[0], 3, 3, cin, cout),
            "bn1": _bn_init(cout),
            "conv2": _conv_init(ks[1], 3, 3, cout, cout),
            "bn2": _bn_init(cout),
        }
        s = {"bn1": _bn_state_init(cout), "bn2": _bn_state_init(cout)}
    if stride != 1 or cin != cout:
        p["proj"] = _conv_init(ks[3], 1, 1, cin, cout)
        p["bn_proj"] = _bn_init(cout)
        s["bn_proj"] = _bn_state_init(cout)
    return p, s


def _block_apply(x, p, s, cfg: EncoderConfig, stride: int, train: bool):
    bottleneck = "conv3" in p
    new_s = {}
    shortcut = x

    def cb(x, wname, bnname, st):
        return _conv_bn(
            x, p[wname], p[bnname], s[bnname], cfg, train,
            lambda x, w: _conv2(x, w, st, cfg.stride2_impl, cfg.conv1x1),
        )

    if "proj" in p:
        shortcut, new_s["bn_proj"] = cb(x, "proj", "bn_proj", stride)
    if bottleneck:
        y, new_s["bn1"] = cb(x, "conv1", "bn1", 1)
        y = jax.nn.relu(y)
        y, new_s["bn2"] = cb(y, "conv2", "bn2", stride)
        y = jax.nn.relu(y)
        y, new_s["bn3"] = cb(y, "conv3", "bn3", 1)
    else:
        y, new_s["bn1"] = cb(x, "conv1", "bn1", stride)
        y = jax.nn.relu(y)
        y, new_s["bn2"] = cb(y, "conv2", "bn2", 1)
    return jax.nn.relu(y + shortcut), new_s


def encoder_init(key, cfg: EncoderConfig) -> tuple[dict, dict]:
    """Returns (params, state) pytrees for the full encoder."""
    if cfg.depth not in _STAGE_BLOCKS:
        raise ValueError(f"unsupported depth {cfg.depth}")
    blocks = _STAGE_BLOCKS[cfg.depth]
    bottleneck = cfg.depth >= 50
    expansion = 4 if bottleneck else 1
    keys = jax.random.split(key, 2 + sum(blocks))

    params = {"stem": _conv_init(keys[0], 7, 7, 3, cfg.width), "bn_stem": _bn_init(cfg.width)}
    state = {"bn_stem": _bn_state_init(cfg.width)}

    cin = cfg.width
    ki = 1
    for stage, n in enumerate(blocks):
        cout = cfg.width * (2**stage) * expansion
        for b in range(n):
            stride = 2 if (b == 0 and stage > 0) else 1
            p, s = _block_init(keys[ki], cin, cout, bottleneck, stride)
            params[f"s{stage}b{b}"] = p
            state[f"s{stage}b{b}"] = s
            cin = cout
            ki += 1
    return params, state


def encoder_apply(
    params: dict, state: dict, images: jax.Array, cfg: EncoderConfig, train: bool
) -> tuple[jax.Array, dict]:
    """images [B, H, W, 3] float32 in [-1, 1] -> (features [B, D], new_state)."""
    blocks = _STAGE_BLOCKS[cfg.depth]
    x = images.astype(cfg.compute_dtype)
    new_state = {}
    if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        stem_fn = _stem_conv_s2d
    else:
        stem_fn = lambda x, w: _conv(x, w, stride=2)  # noqa: E731
    x, new_state["bn_stem"] = _conv_bn(
        x, params["stem"], params["bn_stem"], state["bn_stem"], cfg, train, stem_fn
    )
    x = jax.nn.relu(x)
    # Max-pool k=3 s=2 with symmetric pad 1 (torch alignment; SAME would pad
    # lo=0/hi=1 on even inputs — same shape, one-pixel shift).
    if (
        cfg.maxpool_grad == "mask"
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
    ):
        x = _max_pool_mask(x)
    else:
        x = _max_pool_ref(x)
    for stage, n in enumerate(blocks):
        for b in range(n):
            stride = 2 if (b == 0 and stage > 0) else 1
            name = f"s{stage}b{b}"
            x, new_state[name] = _block_apply(
                x, params[name], state[name], cfg, stride, train
            )
    feat = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global average pool
    return feat, new_state
