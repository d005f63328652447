#!/usr/bin/env python
"""One-time SMPL asset conversion: chumpy-era .pkl -> .npz (SURVEY.md §3.5).

The original `neutral_smpl_with_cocoplus_reg.pkl` pickles chumpy/scipy
objects; utils/assets.py unpickles it without chumpy installed (a
find_class shim) and this tool writes the plain-numpy .npz the framework
loads at startup.

    python tools/convert_smpl_pkl.py in.pkl assets/smpl_neutral.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from indirect_learning_pose_shape_tpu.utils import assets  # noqa: E402


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pkl_path")
    ap.add_argument("npz_path")
    args = ap.parse_args()
    asset = assets.load_pkl(args.pkl_path)
    asset.validate()
    os.makedirs(os.path.dirname(os.path.abspath(args.npz_path)), exist_ok=True)
    assets.save_npz(asset, args.npz_path)
    print(
        f"converted {args.pkl_path} -> {args.npz_path}: "
        f"V={asset.num_verts} J={asset.num_joints} betas={asset.num_betas}"
    )


if __name__ == "__main__":
    main()
