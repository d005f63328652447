"""Iterative-error-feedback SMPL parameter regressor (SURVEY.md §2.5).

Θ₀ = mean parameters; for T iterations a shared FC stack maps
concat(features, Θ_t) → ΔΘ and Θ_{t+1} = Θ_t + ΔΘ. T is small and static, so
the loop is unrolled at trace time (T sequential matmuls; SURVEY.md §3.1
notes the dependency chain is inherent). Parameter layout follows
models/smpl.py `mean_params`: [pose 72 | betas 10 | cam 3].
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class IEFConfig:
    num_iterations: int = 3
    hidden_dims: tuple = (1024, 1024)
    num_joints: int = 24
    num_betas: int = 10
    num_cam: int = 3
    # 'axis_angle' (faithful to the reference, 3/joint) or 'rot6d'
    # (Zhou et al. continuity representation, 6/joint).
    rotation_format: str = "axis_angle"

    @property
    def num_pose(self) -> int:
        return self.num_joints * (6 if self.rotation_format == "rot6d" else 3)

    @property
    def theta_dim(self) -> int:
        return self.num_pose + self.num_betas + self.num_cam


def ief_init(key, cfg: IEFConfig, feature_dim: int, mean_theta) -> dict:
    dims = [feature_dim + cfg.theta_dim, *cfg.hidden_dims, cfg.theta_dim]
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i, k in enumerate(keys):
        fan_in = dims[i]
        # Final layer near-zero so iteration 1 starts from the mean params.
        std = 1e-3 if i == len(keys) - 1 else math.sqrt(2.0 / fan_in)
        layers.append(
            {
                "w": jax.random.normal(k, (dims[i], dims[i + 1]), jnp.float32) * std,
                "b": jnp.zeros((dims[i + 1],), jnp.float32),
            }
        )
    return {"layers": layers, "mean_theta": jnp.asarray(mean_theta, jnp.float32)}


def _mlp(layers, x):
    for i, layer in enumerate(layers):
        x = x @ layer["w"] + layer["b"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def ief_apply(params: dict, features: jax.Array, cfg: IEFConfig) -> jax.Array:
    """features [B, D] -> Θ [B, theta_dim] after T feedback iterations."""
    B = features.shape[0]
    theta = jnp.tile(params["mean_theta"][None, :], (B, 1))
    for _ in range(cfg.num_iterations):
        delta = _mlp(params["layers"], jnp.concatenate([features, theta], axis=1))
        theta = theta + delta
    return theta


def split_theta(theta: jax.Array, cfg: IEFConfig):
    """Θ -> (pose [B,72], betas [B,10], cam [B,3])."""
    p = cfg.num_pose
    b = cfg.num_betas
    return theta[:, :p], theta[:, p : p + b], theta[:, p + b :]
