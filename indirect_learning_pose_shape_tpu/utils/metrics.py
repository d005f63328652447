"""Structured metrics/observability (SURVEY.md §5).

The reference logs via `print` and the Keras progress bar; the rebuild emits
per-step scalars as JSONL (machine-readable for the benchmark driver) plus a
human-readable console line, and exposes `jax.profiler` trace capture for
Perfetto/XProf.
"""

from __future__ import annotations

import json
import time
from typing import IO, Optional

import jax


class MetricsWriter:
    """JSONL scalar writer with wall-clock step timing."""

    def __init__(self, path: Optional[str] = None, print_every: int = 50):
        self._file: Optional[IO] = open(path, "a") if path else None
        self._print_every = print_every
        self._last_time = time.perf_counter()

    def write(self, step: int, scalars: dict) -> None:
        now = time.perf_counter()
        record = {"step": step, "wall_dt": now - self._last_time}
        self._last_time = now
        for k, v in scalars.items():
            record[k] = float(v)
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._print_every and step % self._print_every == 0:
            parts = " ".join(f"{k}={record[k]:.4g}" for k in scalars)
            print(f"step {step}: {parts} ({record['wall_dt']*1e3:.1f} ms)")

    def close(self) -> None:
        if self._file:
            self._file.close()


def profile_trace(path: str):
    """Context manager capturing a jax.profiler trace (view in XProf/Perfetto)."""
    return jax.profiler.trace(path)
