"""ctypes binding for the native host-side preprocessor (native/preprocess.cc).

Handles the ragged→fixed step real datasets need before tensors can go on
device (variably-sized source images can't be jitted with static shapes).
Auto-builds the shared library with `make` on first use; everything degrades
to a numpy fallback with identical semantics if no C++ toolchain is present,
so the framework never hard-depends on the native tier. `USE_NATIVE`
mirrors which path is active (tests assert both agree).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
# Search order: explicit override -> the .so packaged next to this module
# (wheels / installed trees; see setup.py's build_py hook) -> the dev
# checkout's native/ (auto-built with make below).
_LIB_CANDIDATES = [
    os.environ.get("ILPS_NATIVE_LIB") or "",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "libilps_preprocess.so"),
    os.path.join(_NATIVE_DIR, "libilps_preprocess.so"),
]

_lib: Optional[ctypes.CDLL] = None
USE_NATIVE = False


def _find_lib() -> Optional[str]:
    for p in _LIB_CANDIDATES:
        if p and os.path.exists(p):
            return p
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, USE_NATIVE
    if _lib is not None:
        return _lib
    if os.environ.get("ILPS_DISABLE_NATIVE"):
        return None
    path = _find_lib()
    if path is None and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
        path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ilps_crop_resize_normalize.argtypes = [
        u8p, i64p, i32p, i32p, f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
    ]
    lib.ilps_crop_resize_mask.argtypes = [
        u8p, i64p, i32p, i32p, f32p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
    ]
    lib.ilps_bbox_from_mask.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_float, f32p,
    ]
    _lib = lib
    USE_NATIVE = True
    return lib


def _pack(images: Sequence[np.ndarray], channels: int):
    """Ragged image list -> (flat buffer, offsets, heights, widths)."""
    offsets = np.zeros(len(images), np.int64)
    heights = np.zeros(len(images), np.int32)
    widths = np.zeros(len(images), np.int32)
    total = 0
    for i, im in enumerate(images):
        offsets[i] = total
        heights[i] = im.shape[0]
        widths[i] = im.shape[1]
        total += im.size
    flat = np.empty(total, np.uint8)
    for i, im in enumerate(images):
        flat[offsets[i] : offsets[i] + im.size] = np.ascontiguousarray(
            im, np.uint8
        ).reshape(-1)
    return flat, offsets, heights, widths


def _np_crop_resize(img, bbox, out_size, nearest=False):
    """Reference implementation; zero outside the source (background fill).

    Coordinates are computed in float32 with half-up rounding, matching the
    C++ path bit-for-bit — with a zero-filled (discontinuous) border, f32
    vs f64 drift at the boundary would otherwise flip border pixels.
    """
    cy, cx, size = [np.float32(v) for v in bbox]
    step = size / np.float32(out_size)
    o = np.arange(out_size, dtype=np.float32)
    ys = (cy - size * np.float32(0.5)) + (o + np.float32(0.5)) * step - np.float32(0.5)
    xs = (cx - size * np.float32(0.5)) + (o + np.float32(0.5)) * step - np.float32(0.5)
    h, w = img.shape[:2]
    if nearest:
        yr = np.floor(ys + np.float32(0.5)).astype(int)
        xr = np.floor(xs + np.float32(0.5)).astype(int)
        yi = np.clip(yr, 0, h - 1)
        xi = np.clip(xr, 0, w - 1)
        out = img[yi[:, None], xi[None, :]]
        inside = ((yr >= 0) & (yr < h))[:, None] & ((xr >= 0) & (xr < w))[None, :]
        if out.ndim == 3:
            inside = inside[..., None]
        return np.where(inside, out, np.zeros_like(out))
    inside = ((ys >= 0) & (ys <= h - 1))[:, None] & (
        (xs >= 0) & (xs <= w - 1)
    )[None, :]
    ysc = np.clip(ys, 0, h - 1)
    xsc = np.clip(xs, 0, w - 1)
    y0 = np.floor(ysc).astype(int)
    x0 = np.floor(xsc).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    ty = (ysc - y0)[:, None, None]
    tx = (xsc - x0)[None, :, None]
    im = img.astype(np.float32)
    top = im[y0[:, None], x0[None, :]] * (1 - tx) + im[y0[:, None], x1[None, :]] * tx
    bot = im[y1[:, None], x0[None, :]] * (1 - tx) + im[y1[:, None], x1[None, :]] * tx
    out = top * (1 - ty) + bot * ty
    return np.where(inside[..., None] if out.ndim == 3 else inside, out, 0.0)


def crop_resize_normalize(
    images: Sequence[np.ndarray], bboxes: np.ndarray, out_size: int,
    num_threads: int = 0,
) -> np.ndarray:
    """Ragged uint8 HWC images + (cy,cx,size) boxes -> [B,S,S,3] f32 [-1,1]."""
    bboxes = np.ascontiguousarray(bboxes, np.float32)
    lib = _load()
    if lib is None:
        out = np.stack(
            [_np_crop_resize(im, bb, out_size) for im, bb in zip(images, bboxes)]
        )
        return out.astype(np.float32) / 127.5 - 1.0
    flat, offsets, heights, widths = _pack(images, 3)
    out = np.empty((len(images), out_size, out_size, 3), np.float32)
    nt = num_threads or (os.cpu_count() or 1)
    lib.ilps_crop_resize_normalize(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(images), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nt,
    )
    return out


def crop_resize_mask(
    masks: Sequence[np.ndarray], bboxes: np.ndarray, out_size: int,
    num_threads: int = 0,
) -> np.ndarray:
    """Ragged uint8 label masks -> [B,S,S] uint8 (nearest neighbor)."""
    bboxes = np.ascontiguousarray(bboxes, np.float32)
    lib = _load()
    if lib is None:
        return np.stack(
            [
                _np_crop_resize(m, bb, out_size, nearest=True)
                for m, bb in zip(masks, bboxes)
            ]
        ).astype(np.uint8)
    flat, offsets, heights, widths = _pack(masks, 1)
    out = np.empty((len(masks), out_size, out_size), np.uint8)
    nt = num_threads or (os.cpu_count() or 1)
    lib.ilps_crop_resize_mask(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(masks), out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nt,
    )
    return out


def bbox_from_mask(mask: np.ndarray, pad: float = 1.15) -> np.ndarray:
    """(cy, cx, size) around nonzero pixels of a uint8 [H, W] mask."""
    lib = _load()
    mask = np.ascontiguousarray(mask, np.uint8)
    if lib is None:
        ys, xs = np.nonzero(mask)
        h, w = mask.shape
        if len(ys) == 0:
            return np.array([h / 2, w / 2, float(max(h, w))], np.float32)
        size = max(8.0, max(ys.max() - ys.min() + 1, xs.max() - xs.min() + 1) * pad)
        return np.array(
            [(ys.max() + ys.min() + 1) / 2, (xs.max() + xs.min() + 1) / 2, size],
            np.float32,
        )
    out = np.empty(3, np.float32)
    lib.ilps_bbox_from_mask(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.shape[0], mask.shape[1], ctypes.c_float(pad),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
