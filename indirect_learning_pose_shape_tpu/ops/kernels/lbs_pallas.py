"""Fused SMPL blendshape + LBS Pallas kernel (SURVEY.md §7 step 8a; the
"fused Pallas kernel" mandated by BASELINE.json:5).

One kernel pass per (batch item, vertex tile) computes, entirely in VMEM:

    v_posed = v_template + Σ_k β_k·shapedirs_k + Σ_k pf_k·posedirs_k
    T       = Σ_k rel[k]·w_k                 (per-vertex [12] skinning rows)
    verts   = R(T)·v_posed + t(T)

so none of the [B, V, ...] intermediates (shape offsets, pose offsets,
v_posed, the [B, V, 12] transforms) ever round-trips through HBM — the XLA
path materializes several of them. Everything is laid out planar
(channel-major, lane-aligned padded vertex dim, see SMPLConsts `_p` fields);
the per-batch scalars (β, pose features) come in via SMEM and the [24, 12]
rigid transforms via a small VMEM block.

The rigid-transform chain itself stays in XLA (24 tiny sequential matmuls —
fusing it here would serialize the vertex tiles; SURVEY.md §7 "hard parts"),
as does the custom-VJP backward (pure einsums: MXU work with no fusion
opportunity comparable to the forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VT = 256  # vertices per tile: empirically the Mosaic compile-time sweet spot
#            (256 -> ~30s, 768 -> ~80s, 128 -> ~200s) at identical runtime
_HI = jax.lax.Precision.HIGHEST


def _kernel(betas_ref, pf_ref, relt_ref, vt_ref, sd_ref, pd_ref, w_ref, out_ref, vp_ref, t_ref):
    """betas [1,Kbp,1] VMEM; pf [1,Kpp,1] VMEM; relt [1,12,J] VMEM (rigid
    rows transposed); vt [3,VT], sd [3*Kbp,VT], pd [3*Kpp,VT], w [J,VT] VMEM;
    out [1,3,VT]. All sublane offsets are static and 8-aligned (the _p
    layouts pad each component group).
    """
    kbp = sd_ref.shape[0] // 3
    kpp = pd_ref.shape[0] // 3
    beta = betas_ref[0]  # [Kbp, 1]
    pf = pf_ref[0]  # [Kpp, 1]

    # v_posed, one component at a time: weighted sublane reduction of the
    # component-grouped direction rows (static aligned slices).
    comps = []
    for c in range(3):
        off = jnp.sum(beta * sd_ref[c * kbp : (c + 1) * kbp, :], axis=0, keepdims=True)
        off += jnp.sum(pf * pd_ref[c * kpp : (c + 1) * kpp, :], axis=0, keepdims=True)
        comps.append(vt_ref[c : c + 1, :] + off)  # [1, VT]
    x, y, z = comps

    # Skinning rows on the MXU: [12, J] @ [J, VT] -> [12, VT], full f32.
    t = jax.lax.dot_general(
        relt_ref[0],
        w_ref[...],
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    xo = t[0:1] * x + t[1:2] * y + t[2:3] * z + t[9:10]
    yo = t[3:4] * x + t[4:5] * y + t[5:6] * z + t[10:11]
    zo = t[6:7] * x + t[7:8] * y + t[8:9] * z + t[11:12]
    out_ref[0] = jnp.concatenate([xo, yo, zo], axis=0)
    # Residuals for the custom VJP (skips recomputing both blends + skinning).
    vp_ref[0] = jnp.concatenate([x, y, z], axis=0)
    t_ref[0] = t


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_planar(consts, betas, pose_feat, rel):
    """Returns planar verts [B, 3, Vp]."""
    B = betas.shape[0]
    Vp = consts.num_verts_padded
    # Largest lane-aligned tile <= _VT that divides the padded vertex count.
    vt = 128
    for cand in range(_VT, 127, -128):
        if Vp % cand == 0:
            vt = cand
            break
    nt = Vp // vt
    kbp = consts.shapedirs_p.shape[0] // 3
    kpp = consts.posedirs_p.shape[0] // 3
    J = consts.num_joints
    # Zero-pad coefficient vectors to the padded group sizes; transpose the
    # rigid rows so the skinning contraction is a plain [12, J] x [J, VT].
    beta_pad = jnp.zeros((B, kbp, 1), betas.dtype).at[:, : betas.shape[1], 0].set(betas)
    pf_pad = (
        jnp.zeros((B, kpp, 1), pose_feat.dtype)
        .at[:, : pose_feat.shape[1], 0]
        .set(pose_feat)
    )
    rel_t = jnp.swapaxes(rel.reshape(B, J, 12), 1, 2)  # [B, 12, J]
    return pl.pallas_call(
        _kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, kbp, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kpp, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, J), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, vt), lambda b, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * kbp, vt), lambda b, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * kpp, vt), lambda b, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, vt), lambda b, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, vt), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, vt), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, vt), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 3, Vp), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, Vp), jnp.float32),
            jax.ShapeDtypeStruct((B, 12, Vp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(
        beta_pad,
        pf_pad,
        rel_t,
        consts.v_template_p,
        consts.shapedirs_p,
        consts.posedirs_p,
        consts.weights_p,
    )


# `consts` is a regular (differentiable) argument with an explicit zero
# cotangent — NOT nondiff_argnums: array-valued nondiff args break the
# moment a caller passes consts through a jit boundary (tracers are
# forbidden in nondiff positions), e.g. evaluate.py's cached eval graphs.
@jax.custom_vjp
def _lbs(consts, betas, pose_feat, rel):
    return _fwd_planar(consts, betas, pose_feat, rel)[0]


def _lbs_fwd(consts, betas, pose_feat, rel):
    verts, v_posed, t = _fwd_planar(consts, betas, pose_feat, rel)
    return verts, (consts, rel.shape, v_posed, t)


def _lbs_bwd(res, g):
    """XLA backward from kernel residuals (v_posed, T) — pure einsums."""
    consts, rel_shape, v_posed, t = res
    B = v_posed.shape[0]
    Kb = consts.num_betas
    Kp = consts.posedirs_flat.shape[0]
    J = consts.num_joints
    Vp = consts.num_verts_padded
    kbp = consts.shapedirs_p.shape[0] // 3
    kpp = consts.posedirs_p.shape[0] // 3
    # [3*K_pad, Vp] component-grouped -> [K, 3, Vp] (drop the row padding).
    sd = consts.shapedirs_p.reshape(3, kbp, Vp)[:, :Kb].transpose(1, 0, 2)
    pd = consts.posedirs_p.reshape(3, kpp, Vp)[:, :Kp].transpose(1, 0, 2)
    wp = consts.weights_p  # [J, Vp]
    rot = t[:, :9].reshape(B, 3, 3, Vp)

    # g [B, 3, Vp]: dT rows — rotation part g_c·v_j, translation part g_c.
    d_rot = jnp.einsum("bcv,bjv->bcjv", g, v_posed).reshape(B, 9, Vp)
    d_t = jnp.concatenate([d_rot, g], axis=1)  # [B, 12, Vp]
    d_rel = jnp.einsum("brv,kv->bkr", d_t, wp, precision=_HI).reshape(rel_shape)
    d_vposed = jnp.einsum("bcjv,bcv->bjv", rot, g, precision=_HI)
    d_betas = jnp.einsum("bcv,kcv->bk", d_vposed, sd, precision=_HI)
    d_pf = jnp.einsum("bcv,kcv->bk", d_vposed, pd, precision=_HI)
    # Asset tensors are constants in every caller; zero cotangents are
    # constant-folded (and discarded) by XLA.
    d_consts = jax.tree.map(jnp.zeros_like, consts)
    return d_consts, d_betas, d_pf, d_rel


_lbs.defvjp(_lbs_fwd, _lbs_bwd)


def fused_blend_lbs(consts, betas, pose_feat, rel) -> jax.Array:
    """Fused shape/pose blendshapes + skinning. Returns verts [B, V, 3].

    Same interface/semantics as models.smpl._lbs_xla (golden-tested
    equivalent); `rel` is [B, J, 12] from rigid_transform_chain.
    """
    planar = _lbs(consts, betas, pose_feat, rel)  # [B, 3, Vp]
    return jnp.swapaxes(planar[:, :, : consts.num_verts], 1, 2)
