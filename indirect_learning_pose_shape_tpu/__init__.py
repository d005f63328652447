"""TPU-native rebuild of the indirect-learning pose & shape estimation pipeline.

A from-scratch JAX/XLA/Pallas framework with the capability surface of
``akashsengupta1997/indirect_learning_pose-shape`` (see /root/repo/SURVEY.md):

- batched SMPL body model (shape/pose blendshapes, joint regressor, LBS)
- weak-perspective camera projection
- differentiable soft silhouette / body-part rasterizer
- CNN encoder + iterative-error-feedback (IEF) SMPL parameter regressor
- indirect-supervision losses (render loss + 2D keypoint reprojection)
- single-jit train step, data-parallel over a `jax.sharding.Mesh`
- Pallas TPU kernels for the hot ops (fused LBS, tiled soft rasterizer)

Provenance note: the reference snapshot was empty at build time (SURVEY.md §0),
so component parity is anchored on SURVEY.md §2's inventory and BASELINE.json's
north-star spec; numerical goldens come from the in-repo numpy oracle
(`utils/oracle.py`) until the reference becomes available.
"""

__version__ = "0.1.0"

from indirect_learning_pose_shape_tpu.utils.assets import (  # noqa: F401
    SMPLAsset,
    load_asset,
    synthetic_asset,
)
