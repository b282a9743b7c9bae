"""Lidar sensor models and point-cloud ray generation.

TPU-native counterpart of `nerfstudio/cameras/lidars.py` (Lidars 74, LidarType 50,
generate_rays 272, _generate_rays_from_points 399). Pure functions over a
flax.struct pytree; all shapes static (point clouds are padded + masked upstream).
"""

from __future__ import annotations

import enum
from typing import Optional

import jax.numpy as jnp
from flax import struct

from neurad_tpu.core import poses as pose_utils
from neurad_tpu.core.structs import RayBundle

# Beam divergences in radians (`lidars.py:46-47`).
HORIZONTAL_BEAM_DIVERGENCE = 3.0e-3
VERTICAL_BEAM_DIVERGENCE = 1.5e-3


class LidarType(enum.IntEnum):
    """Supported lidar sensors (`lidars.py:50-71`)."""

    VELODYNE16 = 1
    VELODYNE_HDL32E = 2
    VELODYNE64E = 3
    VELODYNE128 = 4
    PANDAR64 = 5
    WOD64 = 6
    WOD_TOP = 7


@struct.dataclass
class Lidars:
    """A batch of lidar sensors (`lidars.py:74-270`). Per-scan fields are [N, ...].

    `metadata` keys used by AD models: `velocities` [N,3] (sensor linear velocity in
    world frame), `sensor_idxs` [N,1]. Point columns follow the reference layout:
    (x, y, z, intensity, timediff[, channel]).
    """

    lidar_to_worlds: jnp.ndarray  # [N, 3, 4]
    lidar_type: jnp.ndarray  # [N, 1] int32 (LidarType)
    times: Optional[jnp.ndarray] = None  # [N, 1]
    horizontal_beam_divergence: Optional[jnp.ndarray] = None  # [N, 1] rad
    vertical_beam_divergence: Optional[jnp.ndarray] = None  # [N, 1] rad
    valid_lidar_distance_threshold: float = struct.field(pytree_node=False, default=1e3)
    assume_ego_compensated: bool = struct.field(pytree_node=False, default=True)
    metadata: dict = struct.field(default_factory=dict)

    def __len__(self) -> int:
        return self.lidar_to_worlds.shape[0]


def generate_lidar_rays_from_points(
    lidars: Lidars,
    lidar_indices: jnp.ndarray,
    points: jnp.ndarray,
    lidar_opt_to_lidar: Optional[jnp.ndarray] = None,
) -> RayBundle:
    """Build a RayBundle whose rays go from each sensor origin through its points.

    Pure-function equivalent of `Lidars._generate_rays_from_points`
    (`lidars.py:399-470`): per-point ego-motion correction of origins by
    timediff * sensor velocity, `directions_norm` = point range, `is_lidar` /
    `did_return` metadata flags.

    Args:
        lidar_indices: [R] int32 indices into the lidar batch (one per point).
        points: [R, >=5] columns (x, y, z, intensity, timediff) in sensor frame.
        lidar_opt_to_lidar: optional [R, 3, 4] pose correction.
    """
    idx = lidar_indices.reshape(-1).astype(jnp.int32)
    l2w = lidars.lidar_to_worlds[idx]  # [R, 3, 4]
    if lidar_opt_to_lidar is not None:
        l2w = pose_utils.multiply(l2w, lidar_opt_to_lidar)

    xyz = points[..., :3]
    points_world = jnp.einsum("rij,rj->ri", l2w[..., :3, :3], xyz) + l2w[..., :3, 3]
    origins = l2w[..., :3, 3]

    has_velocities = "velocities" in lidars.metadata
    if points.shape[-1] >= 5 and has_velocities:
        vel = lidars.metadata["velocities"][idx]  # [R, 3]
        timediff = points[..., 4:5]
        origins = origins + timediff * vel
        if not lidars.assume_ego_compensated:
            points_world = points_world + timediff * vel

    directions = points_world - origins
    distance = jnp.linalg.norm(directions, axis=-1, keepdims=True)
    directions = directions / jnp.clip(distance, 1e-12, None)

    if lidars.horizontal_beam_divergence is not None:
        dx = lidars.horizontal_beam_divergence[idx]
    else:
        dx = jnp.full((idx.shape[0], 1), HORIZONTAL_BEAM_DIVERGENCE)
    if lidars.vertical_beam_divergence is not None:
        dy = lidars.vertical_beam_divergence[idx]
    else:
        dy = jnp.full((idx.shape[0], 1), VERTICAL_BEAM_DIVERGENCE)
    pixel_area = dx * dy

    metadata = {k: v[idx] for k, v in lidars.metadata.items()}
    metadata["directions_norm"] = jnp.asarray(distance)
    metadata["is_lidar"] = jnp.ones_like(distance, dtype=bool)
    metadata["did_return"] = distance < lidars.valid_lidar_distance_threshold

    times = lidars.times[idx] if lidars.times is not None else jnp.zeros_like(distance)
    if points.shape[-1] >= 5:
        times = times + points[..., 4:5]

    return RayBundle(
        origins=origins,
        directions=directions,
        pixel_area=pixel_area,
        camera_indices=idx[:, None],
        times=times,
        fars=jnp.full_like(pixel_area, 1_000_000.0),
        metadata=metadata,
    )


def transform_points(points: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Apply one [3,4] pose to [N,3] points (`lidars.py:540-548`)."""
    return points @ pose[:3, :3].T + pose[:3, 3]


def transform_points_pairwise(points: jnp.ndarray, poses: jnp.ndarray) -> jnp.ndarray:
    """Apply per-point [N,3,4] poses to [N,3] points (`lidars.py:551-564`)."""
    return jnp.einsum("nij,nj->ni", poses[..., :3, :3], points) + poses[..., :3, 3]
