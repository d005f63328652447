"""Pretrained-backbone import parity (SURVEY.md §2.4; VERDICT r1 missing #3).

The golden reference is torch itself: a torchvision-shaped random state dict
is executed once by a torch.nn.functional re-implementation of torchvision's
ResNet forward (exact same op semantics torchvision uses) and once by our
encoder after `map_state_dict` — features must agree to conv-rounding
tolerance. This proves both the key/layout mapping AND the one-pixel
padding-alignment contract of models/encoder.py without any downloads.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indirect_learning_pose_shape_tpu.models import pretrained as pt
from indirect_learning_pose_shape_tpu.models.encoder import (
    EncoderConfig,
    encoder_apply,
)

_BLOCKS = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3)}


def _fake_torchvision_sd(depth: int, seed: int = 0) -> dict:
    """Random state dict with torchvision ResNet-{18,50} key names/shapes."""
    rng = np.random.RandomState(seed)
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = (
            rng.randn(cout, cin, k, k) / np.sqrt(cin * k * k)
        ).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    bottleneck = depth >= 50
    expansion = 4 if bottleneck else 1
    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for li, n in enumerate(_BLOCKS[depth], start=1):
        cout = 64 * 2 ** (li - 1) * expansion
        for b in range(n):
            pre = f"layer{li}.{b}"
            if bottleneck:
                mid = cout // 4
                conv(f"{pre}.conv1", mid, cin, 1)
                bn(f"{pre}.bn1", mid)
                conv(f"{pre}.conv2", mid, mid, 3)
                bn(f"{pre}.bn2", mid)
                conv(f"{pre}.conv3", cout, mid, 1)
                bn(f"{pre}.bn3", cout)
            else:
                conv(f"{pre}.conv1", cout, cin, 3)
                bn(f"{pre}.bn1", cout)
                conv(f"{pre}.conv2", cout, cout, 3)
                bn(f"{pre}.bn2", cout)
            if b == 0 and (li > 1 or cin != cout):
                conv(f"{pre}.downsample.0", cout, cin, 1)
                bn(f"{pre}.downsample.1", cout)
            cin = cout
    return sd


def _torch_resnet_features(sd: dict, x_nhwc: np.ndarray, depth: int) -> np.ndarray:
    """torchvision ResNet forward (eval mode, fc dropped) via functional ops."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    def bnorm(x, pre):
        return F.batch_norm(
            x,
            t[f"{pre}.running_mean"],
            t[f"{pre}.running_var"],
            t[f"{pre}.weight"],
            t[f"{pre}.bias"],
            training=False,
            eps=1e-5,
        )

    x = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    x = F.relu(bnorm(F.conv2d(x, t["conv1.weight"], stride=2, padding=3), "bn1"))
    x = F.max_pool2d(x, 3, 2, 1)
    bottleneck = depth >= 50
    for li, n in enumerate(_BLOCKS[depth], start=1):
        for b in range(n):
            pre = f"layer{li}.{b}"
            stride = 2 if (b == 0 and li > 1) else 1
            idn = x
            if f"{pre}.downsample.0.weight" in t:
                idn = bnorm(
                    F.conv2d(x, t[f"{pre}.downsample.0.weight"], stride=stride),
                    f"{pre}.downsample.1",
                )
            if bottleneck:
                y = F.relu(bnorm(F.conv2d(x, t[f"{pre}.conv1.weight"]), f"{pre}.bn1"))
                y = F.relu(
                    bnorm(
                        F.conv2d(y, t[f"{pre}.conv2.weight"], stride=stride, padding=1),
                        f"{pre}.bn2",
                    )
                )
                y = bnorm(F.conv2d(y, t[f"{pre}.conv3.weight"]), f"{pre}.bn3")
            else:
                y = F.relu(
                    bnorm(
                        F.conv2d(x, t[f"{pre}.conv1.weight"], stride=stride, padding=1),
                        f"{pre}.bn1",
                    )
                )
                y = bnorm(F.conv2d(y, t[f"{pre}.conv2.weight"], padding=1), f"{pre}.bn2")
            x = F.relu(y + idn)
    return x.mean(dim=(2, 3)).numpy()


@pytest.mark.parametrize(
    "depth",
    [18, pytest.param(50, marks=pytest.mark.slow)],  # -50 is the 45 s variant
)
def test_imported_features_match_torch(depth):
    sd = _fake_torchvision_sd(depth)
    params, state = pt.map_state_dict(sd, depth)
    pt.verify_against_init(params, state, depth)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    want = _torch_resnet_features(sd, x, depth)

    cfg = EncoderConfig(depth=depth, compute_dtype=jnp.float32)
    got, _ = encoder_apply(
        jax.tree.map(jnp.asarray, params),
        jax.tree.map(jnp.asarray, state),
        jnp.asarray(x),
        cfg,
        train=False,
    )
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_npz_roundtrip_and_init_state(tmp_path):
    sd = _fake_torchvision_sd(18, seed=3)
    params, state = pt.map_state_dict(sd, 18)
    path = str(tmp_path / "enc18.npz")
    pt.save_encoder_npz(path, params, state, 18)
    p2, s2, depth = pt.load_encoder_npz(path)
    assert depth == 18
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)

    # init_state applies the pretrained encoder verbatim.
    from indirect_learning_pose_shape_tpu import configs, train
    from indirect_learning_pose_shape_tpu.utils import assets

    cfg = dataclasses.replace(configs.CONFIG4_FULL, pretrained=path)
    ts, _ = train.init_state(cfg, assets.synthetic_asset(num_verts=864, seed=1))
    np.testing.assert_array_equal(
        np.asarray(ts.params["encoder"]["stem"]), params["stem"]
    )
    np.testing.assert_array_equal(
        np.asarray(ts.model_state["encoder"]["bn_stem"]["mean"]),
        state["bn_stem"]["mean"],
    )

    # Depth mismatch is rejected loudly.
    cfg50 = dataclasses.replace(
        configs.CONFIG4_LARGE, pretrained=path
    )
    with pytest.raises(ValueError, match="ResNet-18"):
        train.init_state(cfg50, assets.synthetic_asset(num_verts=864, seed=1))
