"""Persistent XLA compilation cache for CLI entry points.

The test suite's conftest proved the value on this host: XLA:CPU AOT
results reload ~9x faster than they compile (34 s -> 4 s for the fused
train step; full suite 26 min cold -> 9 min warm). The same jax config
knob serves every entry point — and on the tunneled-TPU backend, where a
fresh process pays a WILDLY variable 1-10 min remote compile for the same
graphs, a client-side hit would be the single biggest latency fix (whether
the axon plugin supports executable serialization is measured, not
assumed: utils/cache.py logs nothing either way; compare second-process
compile times).

Opt out with ILPS_COMPILE_CACHE=0; redirect with ILPS_COMPILE_CACHE=path.
"""

from __future__ import annotations

import os


_DEFAULT_DIR = "~/.cache/ilps_jax_cache"

# Tokens users plausibly mean as booleans, not directory names. "1"/"on"
# etc. once created a literal ./1/ directory full of binary jit blobs that
# got committed; treat them as "use the default dir" instead.
_TRUTHY = {"1", "true", "on", "yes"}
_FALSY = {"", "0", "false", "off", "no"}


def resolve_cache_dir(raw: str) -> str | None:
    """Map the env token to a cache directory (None = disabled)."""
    token = raw.strip()
    if token.lower() in _FALSY:
        return None
    if token.lower() in _TRUTHY:
        return os.path.expanduser(_DEFAULT_DIR)
    return os.path.expanduser(token)


def enable_compile_cache() -> str | None:
    """Idempotent; call before the first jit. Returns the cache dir or None."""
    cache_dir = resolve_cache_dir(os.environ.get("ILPS_COMPILE_CACHE", _DEFAULT_DIR))
    if cache_dir is None:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
