"""Ray generators: index batches -> RayBundles.

TPU-native counterpart of `nerfstudio/model_components/ray_generators.py`
(RayGenerator 27, LidarRayGenerator 60). Thin functional wrappers over the
camera/lidar ray generation with optional pose-optimizer correction.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from neurad_tpu.cameras.cameras import Cameras, generate_rays
from neurad_tpu.cameras.lidars import Lidars, generate_lidar_rays_from_points
from neurad_tpu.core.structs import RayBundle


def ray_generator(
    cameras: Cameras,
    ray_indices: jnp.ndarray,
    camera_opt_to_camera: Optional[jnp.ndarray] = None,
) -> RayBundle:
    """indices [R, 3] (camera, row, col) -> rays (`ray_generators.py:27-57`)."""
    cam_idx = ray_indices[:, 0].astype(jnp.int32)
    coords = ray_indices[:, 1:].astype(jnp.float32) + 0.5
    return generate_rays(cameras, cam_idx, coords, camera_opt_to_camera=camera_opt_to_camera)


def lidar_ray_generator(
    lidars: Lidars,
    scan_indices: jnp.ndarray,
    points: jnp.ndarray,
    lidar_opt_to_lidar: Optional[jnp.ndarray] = None,
) -> RayBundle:
    """per-point scan indices [R] + points [R, >=5] -> rays
    (`ray_generators.py:60-93`)."""
    return generate_lidar_rays_from_points(
        lidars, scan_indices.astype(jnp.int32), points, lidar_opt_to_lidar=lidar_opt_to_lidar
    )
