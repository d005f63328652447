"""Structured metrics/observability (SURVEY.md §5).

The reference logs via `print` and the Keras progress bar; the rebuild emits
per-step scalars as JSONL (machine-readable for the benchmark driver) plus a
human-readable console line, writes TensorBoard-compatible event files for
humans (hand-rolled TFRecord/Event encoding — zero heavyweight imports in
the training path), and exposes `jax.profiler` trace capture for
Perfetto/XProf.
"""

from __future__ import annotations

import json
import os
import socket
import struct
import time
from typing import IO, Optional

import jax
import jax.numpy as jnp


def fetch_fence(x) -> float:
    """Synchronize with the device by FETCHING one scalar element of `x`.

    Through a remote-chip tunnel, `jax.block_until_ready` has been
    observed to return WITHOUT fencing (benchmark readings at the ~1 ms
    dispatch floor, 11× too fast); a value fetch always round-trips the
    real result. Shared by bench.py and benchmarks/run_configs.py so the
    workaround lives in one place. Returns the fetched element.
    """
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])

# --- TensorBoard event-file encoding ----------------------------------------
# A TB scalar log is a TFRecord stream of serialized `Event` protos. Both
# layers are simple enough to emit directly:
#   TFRecord frame: u64 len (LE) | u32 masked-crc32c(len bytes) | payload
#                   | u32 masked-crc32c(payload)
#   Event proto:    1: wall_time (double), 2: step (int64),
#                   3: file_version (string, first record only),
#                   5: summary { repeated 1: value { 1: tag (string),
#                                                    2: simple_value (float) } }

_CRC_TABLE = []


def _crc32c(data: bytes) -> int:
    global _CRC_TABLE
    if not _CRC_TABLE:
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint(num << 3 | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _event(wall_time: float, step: int = 0, scalars: Optional[dict] = None,
           file_version: Optional[str] = None) -> bytes:
    msg = _field(1, 1) + struct.pack("<d", wall_time)
    if step:
        msg += _field(2, 0) + _varint(step)
    if file_version is not None:
        msg += _len_field(3, file_version.encode())
    if scalars:
        summary = b"".join(
            _len_field(
                1,
                _len_field(1, tag.encode())
                + _field(2, 5)
                + struct.pack("<f", float(v)),
            )
            for tag, v in scalars.items()
        )
        msg += _len_field(5, summary)
    return msg


def _tfrecord(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (
        header
        + struct.pack("<I", _masked_crc(header))
        + payload
        + struct.pack("<I", _masked_crc(payload))
    )


class TensorBoardWriter:
    """Scalar event-file writer readable by TensorBoard / tbparse."""

    _seq = 0  # uniquifier: same-second starts in one process stay distinct

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        TensorBoardWriter._seq += 1
        # pid + per-process counter: two runs started within the same second
        # (tests, sweep scripts) must not interleave into one event file.
        self.path = os.path.join(
            logdir,
            f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
            f".{os.getpid()}.{TensorBoardWriter._seq}",
        )
        self._file: IO = open(self.path, "wb")
        self._file.write(_tfrecord(_event(time.time(), file_version="brain.Event:2")))

    def write(self, step: int, scalars: dict) -> None:
        self._file.write(_tfrecord(_event(time.time(), step, scalars)))
        self._file.flush()

    def close(self) -> None:
        self._file.close()


class MetricsWriter:
    """JSONL scalar writer with wall-clock step timing (+ optional TB)."""

    def __init__(
        self,
        path: Optional[str] = None,
        print_every: int = 50,
        tensorboard_dir: Optional[str] = None,
    ):
        self._file: Optional[IO] = open(path, "a") if path else None
        self._tb = TensorBoardWriter(tensorboard_dir) if tensorboard_dir else None
        self._print_every = print_every
        self._last_time = time.perf_counter()

    def write(self, step: int, scalars: dict) -> None:
        # ONE batched D2H transfer for the whole dict: device_get starts
        # async copies for every leaf before blocking, so the fetch costs
        # ~1 host↔device round trip total. The previous per-key float(v)
        # paid a FULL round trip PER SCALAR — measured 397 ms vs 38 ms
        # for a 12-scalar dict through the remote-chip tunnel, i.e.
        # ~+36 ms/step amortized at the 10-step logging cadence, on par
        # with the 36 ms b128 train step itself.
        scalars = jax.device_get(scalars)
        now = time.perf_counter()
        record = {"step": step, "wall_dt": now - self._last_time}
        self._last_time = now
        for k, v in scalars.items():
            record[k] = float(v)
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._tb:
            self._tb.write(step, {k: record[k] for k in scalars})
        if self._print_every and step % self._print_every == 0:
            parts = " ".join(f"{k}={record[k]:.4g}" for k in scalars)
            print(f"step {step}: {parts} ({record['wall_dt']*1e3:.1f} ms)")

    def close(self) -> None:
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()


def profile_trace(path: str):
    """Context manager capturing a jax.profiler trace (view in XProf/Perfetto)."""
    return jax.profiler.trace(path)
