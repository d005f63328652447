"""Batched SMPL body model in JAX (SURVEY.md §2.1, §3.3).

Design (TPU-first, not a port):

- The whole forward is a pure function of `(params, consts)`; it vmaps and
  jits cleanly and is differentiable end to end — that differentiability is
  the point of indirect learning (gradient flows loss → verts → θ/β).
- Blendshapes are expressed as two large matmuls ([V*3, 10]·β and
  [V*3, 207]·pose_feat) so XLA tiles them onto the MXU; per SURVEY.md §3.1
  these plus LBS dominate the SMPL cost.
- The 24-step kinematic chain is statically unrolled: parent indices are
  compile-time constants (SMPL's tree is topologically ordered), so XLA sees
  24 tiny dependent (B,3,3)x(B,3,?) contractions — cheap, and keeping it in
  XLA rather than inside a Pallas kernel avoids serializing the big matmuls
  (SURVEY.md §7 "hard parts").
- LBS uses the [V,J]·[B,J,12] matmul-then-affine form: one MXU matmul plus a
  12-FMA vector epilogue, instead of materializing [B,V,4,4] transforms.
- `impl='pallas'` routes the blendshape+LBS hot path through the fused Pallas
  kernel (ops/kernels/lbs_pallas.py) behind the same interface and goldens.

Numerics: float32 throughout (matching the reference-era default); Rodrigues
uses the taylor-safe `angle ≥ eps` guard so zero pose is exactly identity.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from indirect_learning_pose_shape_tpu.utils.assets import SMPLAsset

# Geometry-critical contractions request full f32 MXU precision explicitly:
# default matmul precision is bf16-class on accelerator backends, which is
# fine for the encoder but breaks SMPL numerical fidelity (BASELINE.json:5).
_HI = jax.lax.Precision.HIGHEST


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "v_template",
        "shapedirs_flat",
        "posedirs_flat",
        "J_regressor",
        "cocoplus_regressor",
        "weights",
        "v_template_p",
        "shapedirs_p",
        "posedirs_p",
        "weights_p",
    ],
    meta_fields=["parents"],
)
@dataclasses.dataclass(frozen=True)
class SMPLConsts:
    """SMPL asset tensors as device arrays, pre-laid-out for the hot path.

    Registered as a pytree (parents is static metadata) so it can be passed
    through jit/sharding APIs directly. The `_p` fields are planar
    (channel-major, vertex-minor) copies padded to a 128-multiple vertex
    count — the layout the fused Pallas LBS kernel tiles over (vertex dim on
    lanes); the flat fields serve the pure-XLA path.
    """

    v_template: jax.Array  # [V, 3]
    shapedirs_flat: jax.Array  # [num_betas, V*3]   (transposed for β @ S)
    posedirs_flat: jax.Array  # [207, V*3]
    J_regressor: jax.Array  # [J, V]
    cocoplus_regressor: jax.Array  # [19, V]
    weights: jax.Array  # [V, J]
    v_template_p: jax.Array  # [3, Vp]
    shapedirs_p: jax.Array  # [3*Kb_pad, Vp]  rows c*Kb_pad+k (component-grouped)
    posedirs_p: jax.Array  # [3*Kp_pad, Vp]  rows c*Kp_pad+k
    weights_p: jax.Array  # [J, Vp]
    parents: tuple  # static python ints, parents[0] == -1

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_verts_padded(self) -> int:
        return self.v_template_p.shape[1]

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs_flat.shape[0]


def smpl_consts(asset: SMPLAsset, dtype: Any = jnp.float32) -> SMPLConsts:
    v = asset.num_verts
    vp = -(-v // 128) * 128  # lane-aligned padded vertex count

    def planar(x_vc):  # [V, C] -> [C, Vp]
        x = np.asarray(x_vc).T
        out = np.zeros((x.shape[0], vp), x.dtype)
        out[:, :v] = x
        return jnp.asarray(out, dtype)

    def planar_dirs(x_v3k):  # [V, 3, K] -> [3*K_pad, Vp], rows c*K_pad+k
        x = np.asarray(x_v3k)
        k = x.shape[2]
        k_pad = -(-k // 8) * 8  # sublane-aligned per-component row groups
        out = np.zeros((3 * k_pad, vp), x.dtype)
        for c in range(3):
            out[c * k_pad : c * k_pad + k, :v] = x[:, c, :].T
        return jnp.asarray(out, dtype)

    return SMPLConsts(
        v_template=jnp.asarray(asset.v_template, dtype),
        shapedirs_flat=jnp.asarray(
            asset.shapedirs.reshape(v * 3, -1).T.copy(), dtype
        ),
        posedirs_flat=jnp.asarray(asset.posedirs.reshape(v * 3, -1).T.copy(), dtype),
        J_regressor=jnp.asarray(asset.J_regressor, dtype),
        cocoplus_regressor=jnp.asarray(asset.cocoplus_regressor, dtype),
        weights=jnp.asarray(asset.weights, dtype),
        v_template_p=planar(asset.v_template),
        shapedirs_p=planar_dirs(asset.shapedirs),
        posedirs_p=planar_dirs(asset.posedirs),
        weights_p=planar(asset.weights),
        parents=tuple(int(p) for p in asset.parents),
    )


def batch_rodrigues(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3].

    Closed form R = cos·I + sin·K + (1−cos)·aaᵀ, fully elementwise (VPU) —
    deliberately avoids a 3x3 matmul both for speed and because default
    matmul precision may be reduced (bf16-class) on accelerator backends.
    Numerically safe at θ→0: guarded norm so zero pose is exact identity
    with finite gradients.
    """
    eps = 1e-12
    angle = jnp.sqrt(jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True) + eps)
    axis = axis_angle / angle
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(axis_angle.shape[:-1] + (3, 3))
    outer = axis[..., :, None] * axis[..., None, :]
    eye = jnp.eye(3, dtype=axis_angle.dtype)
    return c * eye + s * K + (1.0 - c) * outer


def rot6d_to_rotmat(x: jax.Array) -> jax.Array:
    """Continuous 6D rotation representation [..., 6] -> [..., 3, 3].

    Gram-Schmidt on the two encoded columns (Zhou et al.'s continuity
    representation — an alternative to the reference's axis-angle,
    selectable via IEFConfig.rotation_format). Identity is encoded as
    (1,0,0, 0,1,0).
    """
    a1 = x[..., 0:3]
    a2 = x[..., 3:6]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-8)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / (jnp.linalg.norm(a2p, axis=-1, keepdims=True) + 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)  # columns


def rigid_transform_chain(
    rotmats: jax.Array, joints_rest: jax.Array, parents: tuple
) -> tuple[jax.Array, jax.Array]:
    """Forward-kinematics over the (statically known) kinematic tree.

    rotmats [B, J, 3, 3], joints_rest [B, J, 3] ->
      joints_posed [B, J, 3],
      rel [B, J, 12]: rows of A_k = G_k − [0 | G_k[:3,:3]·J_k], laid out as
      the first 3 rows of the 4x4 (rotation 9 + translation 3) ready for the
      LBS matmul. Unrolled python loop: J is 24 and parents are static.
    """
    num_joints = len(parents)
    rot_g = [None] * num_joints  # global rotations [B, 3, 3]
    pos_g = [None] * num_joints  # global joint positions [B, 3]
    rot_g[0] = rotmats[:, 0]
    pos_g[0] = joints_rest[:, 0]
    for k in range(1, num_joints):
        p = parents[k]
        bone = joints_rest[:, k] - joints_rest[:, p]
        rot_g[k] = jnp.einsum("bij,bjk->bik", rot_g[p], rotmats[:, k], precision=_HI)
        pos_g[k] = pos_g[p] + jnp.einsum("bij,bj->bi", rot_g[p], bone, precision=_HI)

    rot_g = jnp.stack(rot_g, axis=1)  # [B, J, 3, 3]
    pos_g = jnp.stack(pos_g, axis=1)  # [B, J, 3]
    # A_k translation = pos_g − R_g · J_rest (remove rest-pose offset).
    trans = pos_g - jnp.einsum("bkij,bkj->bki", rot_g, joints_rest, precision=_HI)
    rel = jnp.concatenate(
        [rot_g.reshape(rot_g.shape[0], num_joints, 9), trans], axis=-1
    )  # [B, J, 12]
    return pos_g, rel


def _lbs_xla(
    consts: SMPLConsts, betas: jax.Array, pose_feat: jax.Array, rel: jax.Array
) -> jax.Array:
    """Pure-XLA fused blendshape + skinning path. Returns verts [B, V, 3]."""
    B = betas.shape[0]
    V = consts.num_verts
    # Shape + pose blendshapes: two MXU matmuls over the flattened vertex dim.
    offsets = jnp.einsum("bk,kn->bn", betas, consts.shapedirs_flat, precision=_HI) + jnp.einsum("bk,kn->bn", pose_feat, consts.posedirs_flat, precision=_HI)
    v_posed = consts.v_template.reshape(1, V * 3) + offsets
    v_posed = v_posed.reshape(B, V, 3)
    # Per-vertex skinning transform rows: [V, J] @ [B, J, 12] -> [B, V, 12].
    T = jnp.einsum("vk,bkr->bvr", consts.weights, rel, precision=_HI)
    R = T[..., :9].reshape(B, V, 3, 3)
    t = T[..., 9:]
    return jnp.einsum("bvij,bvj->bvi", R, v_posed, precision=_HI) + t


def smpl_forward(
    consts: SMPLConsts,
    pose: jax.Array,
    betas: jax.Array,
    impl: str = "auto",
) -> dict[str, jax.Array]:
    """Batched SMPL forward.

    Args:
      pose  [B, J*3] axis-angle per joint (joint 0 = global orientation).
      betas [B, num_betas].
      impl  'xla' | 'pallas' (fused TPU kernel for the blendshape+LBS hot
            path; identical numerics per tests) | 'auto' (pallas on TPU).

    Returns dict with verts [B,V,3], joints [B,J,3], kp3d [B,19,3].
    """
    B = pose.shape[0]
    rotmats = batch_rodrigues(pose.reshape(B, consts.num_joints, 3))
    return smpl_forward_rotmats(consts, rotmats, betas, impl=impl)


def smpl_forward_rotmats(
    consts: SMPLConsts,
    rotmats: jax.Array,
    betas: jax.Array,
    impl: str = "auto",
) -> dict[str, jax.Array]:
    """SMPL forward from per-joint rotation matrices [B, J, 3, 3].

    The rotation-representation-agnostic core: axis-angle (batch_rodrigues)
    and 6D (rot6d_to_rotmat) parameterizations both land here.
    """
    if impl == "auto":
        # 'auto' = 'xla' since late round 3: the fused Pallas blendshape+LBS
        # kernel — a round-1 win when measured against the then-current XLA
        # formulation — is now SLOWER than plain XLA einsums everywhere it
        # was re-measured on the v5e (standalone fwd+proj b64: 0.79 vs
        # 0.25 ms; fused config-4 step b128: 30.9 vs 28.4 ms; flagship b32:
        # 19.95 vs 19.50): the geometry contractions live on the MXU in the
        # XLA path but on the VPU in the kernel. The kernel stays available
        # (impl='pallas'), golden-tested, as the recorded alternative.
        impl = "xla"
    B = rotmats.shape[0]
    J = consts.num_joints
    eye = jnp.eye(3, dtype=rotmats.dtype)
    pose_feat = (rotmats[:, 1:] - eye).reshape(B, (J - 1) * 9)

    # Rest joints depend on shaped verts: J_reg @ (template + shape offsets).
    shape_off = jnp.einsum(
        "bk,kn->bn", betas, consts.shapedirs_flat, precision=_HI
    ).reshape(B, consts.num_verts, 3)
    v_shaped = consts.v_template[None] + shape_off
    joints_rest = jnp.einsum("jv,bvi->bji", consts.J_regressor, v_shaped, precision=_HI)

    joints_posed, rel = rigid_transform_chain(rotmats, joints_rest, consts.parents)

    if impl == "pallas":
        from indirect_learning_pose_shape_tpu.ops.kernels.lbs_pallas import (
            fused_blend_lbs,
        )

        verts = fused_blend_lbs(consts, betas, pose_feat, rel)
    else:
        verts = _lbs_xla(consts, betas, pose_feat, rel)

    kp3d = jnp.einsum("kv,bvi->bki", consts.cocoplus_regressor, verts, precision=_HI)
    return {"verts": verts, "joints": joints_posed, "kp3d": kp3d}


def mean_params(
    consts: SMPLConsts, num_cam: int = 3, rotation_format: str = "axis_angle"
) -> np.ndarray:
    """Initial Θ₀ for IEF (SURVEY.md §2.5): neutral pose/shape, unit-ish camera.

    Layout: [pose | betas | cam (s, tx, ty)]. The reference initialises from
    a mean-parameter file; with none available the neutral pose with a
    framing scale is the canonical stand-in. Neutral pose is zeros for
    axis-angle, the identity encoding (1,0,0,0,1,0) per joint for rot6d.
    """
    J = consts.num_joints
    if rotation_format == "rot6d":
        pose0 = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), J)
    else:
        pose0 = np.zeros(J * 3, np.float32)
    theta = np.concatenate(
        [pose0, np.zeros(consts.num_betas, np.float32), np.zeros(num_cam, np.float32)]
    )
    theta[-num_cam] = 0.9  # scale: body roughly fills the crop
    return theta
