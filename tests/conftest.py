"""Test harness: CPU backend with 8 fake devices (SURVEY.md §4.4).

Must set env vars before the first `import jax` anywhere in the test
process so the v4-8-style data-parallel mesh is testable without TPUs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Force CPU at the config level too: this machine's sitecustomize registers a
# TPU plugin and overrides jax_platforms at interpreter start, so the env var
# alone is not enough. Must happen before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from indirect_learning_pose_shape_tpu.utils import assets  # noqa: E402


@pytest.fixture(scope="session")
def tiny_asset() -> assets.SMPLAsset:
    """Small but full-topology asset (real 24-joint SMPL tree, 864 verts)."""
    return assets.synthetic_asset(num_verts=864, seed=1)


@pytest.fixture(scope="session")
def full_asset() -> assets.SMPLAsset:
    """Full-size synthetic asset (V=6890) for shape-faithful tests."""
    return assets.synthetic_asset(seed=0)


@pytest.fixture()
def rng() -> np.random.RandomState:
    return np.random.RandomState(42)
