"""Test harness: CPU backend with 8 fake devices (SURVEY.md §4.4).

Must set env vars before the first `import jax` anywhere in the test
process so the v4-8-style data-parallel mesh is testable without TPUs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in _flags:
    # Serialize LLVM codegen: the host has one core (threads only contend),
    # and the XLA:CPU backend has segfaulted in parallel codegen when the
    # suite's largest multi-device program compiled late in the process
    # (see _fresh_compiler_state below).
    _flags = (_flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = _flags

# Force CPU at the config level too: this machine's sitecustomize registers a
# TPU plugin and overrides jax_platforms at interpreter start, so the env var
# alone is not enough. Must happen before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated on this
# 1-core host (~32 min cold, most of it LLVM codegen of ~100 distinct
# graphs), and XLA:CPU AOT results reload from disk ~9× faster than they
# compile (34 s → 4 s measured on the fused train step). Repeat runs —
# the common case for a test suite — drop to the execution floor. The
# cache is keyed on HLO+flags, so code changes miss cleanly. Opt out
# with ILPS_TEST_COMPILE_CACHE=0 (e.g. to time true cold compiles).
# Note: loading logs a benign machine-feature E-line (XLA's synthetic
# prefer-no-gather/scatter hints aren't host CPUID features).
_cache_dir = os.environ.get(
    "ILPS_TEST_COMPILE_CACHE",
    os.path.expanduser("~/.cache/ilps_test_jax_cache"),
)
if _cache_dir and _cache_dir != "0":
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# The XLA:CPU backend has segfaulted in native compilation
# (jax/_src/compiler.py backend_compile_and_load, i.e. LLVM JIT) when the
# big 8-device fused train step compiled on top of ~70 earlier tests' still
# -resident executables (observed at test_sharding::test_fused_step_sharded;
# order-dependent, passes in isolation). The module-level jit entry points in
# train.py deliberately retain executables across tests — that is the
# suite's main speedup — so instead of disabling the cache, drop it right
# before the two modules that compile large multi-device programs. The small
# shared-config caches they evict rebuild in seconds.
_HEAVY_COMPILE_MODULES = ("test_render_sp", "test_sharding")


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state(request):
    # No tests/__init__.py → pytest imports modules top-level ("test_x"),
    # but match the package-qualified form too.
    if request.module.__name__.rpartition(".")[2] in _HEAVY_COMPILE_MODULES:
        jax.clear_caches()
    yield

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
