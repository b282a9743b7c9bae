"""Native (C++) host-path kernels with build-on-first-use + numpy fallback.

The compute path is jax/XLA; the host runtime around it uses C++ where the
reference's does (its data workers ride torch's C++ tensor ops). `g++ -O3`
compiles `patchops.cpp` into a cached shared library on first import; any
failure (no toolchain, readonly fs) silently falls back to numpy so behavior
is identical everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).parent
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _HERE / "_patchops.so"
        src = _HERE / "patchops.cpp"
        try:
            if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(src), "-o", str(so)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(str(so))
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
            c64 = ctypes.c_int64
            lib.extract_patches_u8.argtypes = [u8p, c64, c64, c64, i64p, i64p, i64p, c64, c64, f32p]
            lib.extract_patches_f32.argtypes = [f32p, c64, c64, c64, i64p, i64p, i64p, c64, c64, f32p]
            lib.bin_points.argtypes = [f32p, c64, f32p, c64, ctypes.c_float, c64, u8p, i32p, i32p]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def extract_patches(
    images: np.ndarray, cam_idx: np.ndarray, r0: np.ndarray, c0: np.ndarray, gt: int
) -> np.ndarray:
    """Gather [B, gt, gt, 3] float32 patches (normalized) from [N, H, W, 3]."""
    lib = _load()
    b = len(cam_idx)
    if lib is not None and images.flags["C_CONTIGUOUS"]:
        out = np.empty((b, gt, gt, 3), np.float32)
        ci = np.ascontiguousarray(cam_idx, np.int64)
        rr = np.ascontiguousarray(r0, np.int64)
        cc = np.ascontiguousarray(c0, np.int64)
        n, h, w = images.shape[:3]
        if images.dtype == np.uint8:
            lib.extract_patches_u8(images, n, h, w, ci, rr, cc, b, gt, out)
            return out
        if images.dtype == np.float32:
            lib.extract_patches_f32(images, n, h, w, ci, rr, cc, b, gt, out)
            return out
    # numpy fallback
    scale = 1.0 / 255.0 if images.dtype == np.uint8 else 1.0
    return np.stack(
        [images[ci, r : r + gt, c : c + gt] for ci, r, c in zip(cam_idx, r0, c0)]
    ).astype(np.float32) * scale


def bin_points(
    points: np.ndarray, elevations: np.ndarray, azim_res_deg: float, n_azim: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(occupied [C, A] bool, channel [N], azim_bin [N]) for sensor-frame xyz."""
    lib = _load()
    n_chan = len(elevations)
    if lib is not None:
        pts = np.ascontiguousarray(points[:, :3], np.float32)
        occ = np.zeros((n_chan, n_azim), np.uint8)
        ch = np.empty(points.shape[0], np.int32)
        ab = np.empty(points.shape[0], np.int32)
        lib.bin_points(
            pts, pts.shape[0], np.ascontiguousarray(elevations, np.float32), n_chan,
            ctypes.c_float(azim_res_deg), n_azim, occ, ch, ab,
        )
        return occ.astype(bool), ch.astype(np.int64), ab.astype(np.int64)
    # numpy fallback
    r2d = np.linalg.norm(points[:, :2], axis=-1)
    elev = np.rad2deg(np.arctan2(points[:, 2], np.clip(r2d, 1e-9, None)))
    ch = np.abs(elev[:, None] - elevations[None, :]).argmin(-1)
    azim = np.rad2deg(np.arctan2(points[:, 1], points[:, 0]))
    ab = np.clip(((azim + 180.0) / azim_res_deg).astype(np.int64), 0, n_azim - 1)
    occ = np.zeros((n_chan, n_azim), bool)
    occ[ch, ab] = True
    return occ, ch, ab
