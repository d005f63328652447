"""Pretrained-backbone import (SURVEY.md §2.4).

The reference initializes its conv backbone from ImageNet weights
(`keras.applications.ResNet50`-style [R-low]); the rebuild maps a
torchvision-format ResNet state dict (`resnet18`/`resnet50`) onto
`encoder_init`'s (params, state) pytree layout. models/encoder.py uses
torch's symmetric-padding alignment for the stride-2 stem/pool/convs, so the
imported backbone's features match torchvision's forward bit-for-bit up to
conv-algorithm rounding (tests/test_pretrained.py re-executes the same state
dict with torch.nn.functional and compares).

CLI front-end: tools/import_resnet_weights.py (pth -> npz, offline).
"""

from __future__ import annotations

import numpy as np

# Single source of truth for the architecture contract the import maps onto.
from indirect_learning_pose_shape_tpu.models.encoder import _STAGE_BLOCKS


def _conv_w(sd, key):
    # torch conv weight [out, in, kh, kw] -> our HWIO [kh, kw, in, out]
    return np.ascontiguousarray(np.asarray(sd[key], np.float32).transpose(2, 3, 1, 0))


def _bn(sd, prefix):
    p = {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }
    s = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }
    return p, s


def map_state_dict(sd: dict, depth: int) -> tuple[dict, dict]:
    """torchvision ResNet state dict -> (encoder params, encoder state).

    Layout contract is models/encoder.py's: stem/bn_stem at the top,
    blocks named s{stage}b{block} with conv1/bn1/conv2/bn2(/conv3/bn3) and
    proj/bn_proj for the downsample branch. torchvision's layer{1..4}.{b}
    maps to stage {0..3}; `downsample.0/.1` maps to proj/bn_proj.
    """
    if depth not in _STAGE_BLOCKS:
        raise ValueError(f"unsupported depth {depth}")
    blocks = _STAGE_BLOCKS[depth]
    bottleneck = depth >= 50
    params = {"stem": _conv_w(sd, "conv1.weight")}
    bn_p, bn_s = _bn(sd, "bn1")
    params["bn_stem"] = bn_p
    state = {"bn_stem": bn_s}
    for stage, n in enumerate(blocks):
        for b in range(n):
            src = f"layer{stage + 1}.{b}"
            p: dict = {}
            s: dict = {}
            n_convs = 3 if bottleneck else 2
            for c in range(1, n_convs + 1):
                p[f"conv{c}"] = _conv_w(sd, f"{src}.conv{c}.weight")
                p[f"bn{c}"], s[f"bn{c}"] = _bn(sd, f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in sd:
                p["proj"] = _conv_w(sd, f"{src}.downsample.0.weight")
                p["bn_proj"], s["bn_proj"] = _bn(sd, f"{src}.downsample.1")
            params[f"s{stage}b{b}"] = p
            state[f"s{stage}b{b}"] = s
    return params, state


# --- flat npz (de)serialization of the nested pytrees -----------------------


def _flatten(tree: dict, prefix: str, out: dict) -> None:
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            _flatten(v, key, out)
        else:
            out[key] = np.asarray(v)


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_encoder_npz(path: str, params: dict, state: dict, depth: int) -> None:
    flat: dict = {"__depth__": np.asarray(depth)}
    _flatten(params, "params", flat)
    _flatten(state, "state", flat)
    np.savez_compressed(path, **flat)


def load_encoder_npz(path: str) -> tuple[dict, dict, int]:
    """Returns (encoder params, encoder state, depth) as host numpy trees."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    depth = int(flat.pop("__depth__"))
    tree = _unflatten(flat)
    return tree["params"], tree["state"], depth


def verify_against_init(params: dict, state: dict, depth: int) -> None:
    """Shape-check the imported trees against a fresh encoder_init."""
    import jax

    from indirect_learning_pose_shape_tpu.models.encoder import (
        EncoderConfig,
        encoder_init,
    )

    ref_p, ref_s = encoder_init(jax.random.PRNGKey(0), EncoderConfig(depth=depth))
    for name, (got, ref) in (("params", (params, ref_p)), ("state", (state, ref_s))):
        flat_got: dict = {}
        flat_ref: dict = {}
        _flatten(got, name, flat_got)
        _flatten(jax.tree.map(np.asarray, ref), name, flat_ref)
        if set(flat_got) != set(flat_ref):
            missing = set(flat_ref) - set(flat_got)
            extra = set(flat_got) - set(flat_ref)
            raise ValueError(f"{name} tree mismatch: missing={missing} extra={extra}")
        for k in flat_ref:
            if flat_got[k].shape != flat_ref[k].shape:
                raise ValueError(
                    f"{k}: shape {flat_got[k].shape} != expected {flat_ref[k].shape}"
                )


