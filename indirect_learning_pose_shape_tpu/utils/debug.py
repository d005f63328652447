"""Numerics debugging utilities (SURVEY.md §5 "race detection / sanitizers").

The reference has no sanitizers (single-threaded TF). The JAX-native
equivalents are NaN detection and functional error checking:

- `enable_nan_checks()`: global `jax_debug_nans` — re-runs the failing op
  un-jitted and raises at the exact primitive that produced the NaN.
- `checked(fn)`: wraps a jitted function with `checkify` so NaN/OOB errors
  become returned, raisable error values without disabling jit.
- `assert_finite(tree)`: host-side assertion for tests and debugging loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def checked(fn):
    """checkify-wrapped callable: returns value, raises collected errors."""
    cfn = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(tree, name: str = "tree") -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise FloatingPointError(f"non-finite values in {name}{path}")
