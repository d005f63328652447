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


def load_mean_theta(path: str, cfg: IEFConfig) -> jnp.ndarray:
    """Load a mean-parameter file for IEF's Θ₀ (SURVEY.md §2.5: the reference
    initialises from a mean-params file; models/smpl.py mean_params is the
    synthetic stand-in used when none is given).

    Accepts .npz with a 'mean_theta' key (preferred; tools can add more
    arrays later) or a bare .npy array. Shape-validated against the
    configured layout [pose | betas | cam] — the same loud contract as
    --pretrained — so a file for the wrong rotation format or camera
    dimensionality cannot load silently.
    """
    import numpy as np

    arr = np.load(path)
    if hasattr(arr, "files"):  # npz
        if "mean_theta" not in arr.files:
            raise ValueError(
                f"mean-params npz {path!r} has keys {arr.files}; expected "
                "'mean_theta'"
            )
        arr = arr["mean_theta"]
    arr = np.asarray(arr, np.float32).reshape(-1)
    if arr.shape[0] != cfg.theta_dim:
        raise ValueError(
            f"mean-params file {path!r} holds {arr.shape[0]} values; the "
            f"configured layout needs theta_dim={cfg.theta_dim} "
            f"(pose {cfg.num_pose} [{cfg.rotation_format}] + betas "
            f"{cfg.num_betas} + cam {cfg.num_cam})"
        )
    return jnp.asarray(arr)


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
