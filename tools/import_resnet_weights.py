"""Convert a torchvision ResNet checkpoint to a `--pretrained` npz.

Thin CLI over indirect_learning_pose_shape_tpu/models/pretrained.py (the
mapping + npz format live in the library; see its docstring for the
exactness guarantee). No network access is needed at any point: download
the .pth elsewhere, convert once, ship the npz.

Usage:
    python tools/import_resnet_weights.py resnet18.pth enc18.npz --depth 18
    python -m indirect_learning_pose_shape_tpu.train --pretrained enc18.npz
"""

from __future__ import annotations

import argparse

import numpy as np

from indirect_learning_pose_shape_tpu.models.pretrained import (
    map_state_dict,
    save_encoder_npz,
    verify_against_init,
)


def load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in obj.items()}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="torchvision ResNet checkpoint (.pth) or .npz state dict")
    ap.add_argument("out", help="output .npz consumed by --pretrained")
    ap.add_argument("--depth", type=int, default=18, choices=(18, 34, 50))
    args = ap.parse_args()

    if args.src.endswith(".npz"):
        with np.load(args.src) as z:
            sd = {k: z[k] for k in z.files}
    else:
        sd = load_torch_state_dict(args.src)
    params, state = map_state_dict(sd, args.depth)
    verify_against_init(params, state, args.depth)
    save_encoder_npz(args.out, params, state, args.depth)
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"wrote {args.out}: depth {args.depth}, {n:,} source params mapped")


if __name__ == "__main__":
    main()
