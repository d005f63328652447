"""Golden-value tests for the JAX SMPL model vs the numpy oracle (SURVEY §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from indirect_learning_pose_shape_tpu.models import smpl
from indirect_learning_pose_shape_tpu.utils import oracle


def _random_params(rng, asset, batch):
    pose = rng.randn(batch, asset.num_joints * 3).astype(np.float32) * 0.4
    betas = rng.randn(batch, asset.num_betas).astype(np.float32)
    return pose, betas


def test_rodrigues_matches_oracle(rng):
    aa = rng.randn(17, 3).astype(np.float32)
    got = np.asarray(smpl.batch_rodrigues(jnp.asarray(aa)))
    want = oracle.rodrigues(aa)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_rodrigues_zero_pose_is_identity():
    got = np.asarray(smpl.batch_rodrigues(jnp.zeros((4, 3))))
    np.testing.assert_allclose(got, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)


def test_rodrigues_gradient_finite_at_zero():
    g = jax.grad(lambda aa: jnp.sum(smpl.batch_rodrigues(aa)))(jnp.zeros((3,)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_smpl_forward_matches_oracle(tiny_asset, rng):
    consts = smpl.smpl_consts(tiny_asset)
    pose, betas = _random_params(rng, tiny_asset, batch=3)
    out = jax.jit(lambda p, b: smpl.smpl_forward(consts, p, b))(pose, betas)
    for i in range(3):
        want = oracle.smpl_forward(tiny_asset, pose[i], betas[i])
        np.testing.assert_allclose(
            np.asarray(out["verts"][i]), want["verts"], atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["joints"][i]), want["joints"], atol=2e-4
        )
        np.testing.assert_allclose(np.asarray(out["kp3d"][i]), want["kp3d"], atol=2e-4)


def test_smpl_zero_pose_zero_shape_is_template(tiny_asset):
    consts = smpl.smpl_consts(tiny_asset)
    out = smpl.smpl_forward(
        consts,
        jnp.zeros((1, tiny_asset.num_joints * 3)),
        jnp.zeros((1, tiny_asset.num_betas)),
    )
    np.testing.assert_allclose(
        np.asarray(out["verts"][0]), tiny_asset.v_template, atol=1e-5
    )


def test_smpl_full_size_shapes(full_asset, rng):
    consts = smpl.smpl_consts(full_asset)
    pose, betas = _random_params(rng, full_asset, batch=2)
    out = smpl.smpl_forward(consts, pose, betas)
    assert out["verts"].shape == (2, 6890, 3)
    assert out["joints"].shape == (2, 24, 3)
    assert out["kp3d"].shape == (2, 19, 3)


def test_smpl_differentiable(tiny_asset, rng):
    consts = smpl.smpl_consts(tiny_asset)
    pose, betas = _random_params(rng, tiny_asset, batch=2)

    def f(p, b):
        return jnp.sum(smpl.smpl_forward(consts, p, b)["verts"] ** 2)

    gp, gb = jax.grad(f, argnums=(0, 1))(jnp.asarray(pose), jnp.asarray(betas))
    assert np.all(np.isfinite(np.asarray(gp))) and float(jnp.abs(gp).max()) > 0
    assert np.all(np.isfinite(np.asarray(gb))) and float(jnp.abs(gb).max()) > 0


def test_smpl_pose_grad_finite_difference(tiny_asset, rng):
    """Spot finite-difference check through rodrigues+chain+LBS (SURVEY §4.2)."""
    consts = smpl.smpl_consts(tiny_asset)
    pose, betas = _random_params(rng, tiny_asset, batch=1)
    pose64, betas64 = pose.astype(np.float64), betas.astype(np.float64)

    def f_np(p):
        return float(
            np.sum(oracle.smpl_forward(tiny_asset, p[0], betas64[0])["verts"] ** 2)
        )

    def f_jax(p):
        return jnp.sum(smpl.smpl_forward(consts, p, jnp.asarray(betas))["verts"] ** 2)

    g = np.asarray(jax.grad(f_jax)(jnp.asarray(pose)))
    eps = 1e-4
    for idx in [0, 5, 23, 47, 71]:
        dp = np.zeros_like(pose64)
        dp[0, idx] = eps
        fd = (f_np(pose64 + dp) - f_np(pose64 - dp)) / (2 * eps)
        np.testing.assert_allclose(g[0, idx], fd, rtol=2e-2, atol=1e-3)
