"""3D gaussian math: covariance build, camera EWA projection, spherical (lidar)
projection, rolling-shutter velocity compensation.

TPU-native replacement for the projection stages of the gsplat fork
(`carlinds/splatad`, called at `nerfstudio/models/splatad.py:977-1003` for
cameras and 1135-1166 for lidar). Everything is batched pure-jnp and
differentiable end-to-end; the tile rasterization on top lives in
`ops/gaussian_rasterize.py`.

Conventions: viewmat = world->camera [4,4] with OpenCV camera axes (x right,
y down, z forward), like gsplat. Quats are (w, x, y, z) normalized.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def quat_scale_to_covariance(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """[N,4] wxyz quats + [N,3] scales -> [N,3,3] covariance R S S R^T."""
    w, x, y, z = (quats[..., i] for i in range(4))
    n = jnp.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(quats.shape[:-1] + (3, 3))
    m = r * scales[..., None, :]  # R @ diag(s)
    return m @ jnp.swapaxes(m, -1, -2)


class Projected(NamedTuple):
    """Per-gaussian screen-space quantities."""

    means2d: jnp.ndarray  # [N, 2] pixel coords
    depths: jnp.ndarray  # [N]
    conics: jnp.ndarray  # [N, 3] upper-tri of inv 2D cov (a, b, c): [[a,b],[b,c]]
    radii: jnp.ndarray  # [N] screen radius (pixels), 0 = culled
    compensations: jnp.ndarray  # [N] antialiasing opacity compensation
    vel2d: jnp.ndarray  # [N, 2] pixel-space velocity (for rolling shutter)
    depth_vel: jnp.ndarray  # [N] range rate (for lidar RS; 0 for camera)


def project_gaussians_camera(
    means: jnp.ndarray,
    covars: jnp.ndarray,
    viewmat: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    velocities: Optional[jnp.ndarray] = None,
    camera_linear_velocity: Optional[jnp.ndarray] = None,
    camera_angular_velocity: Optional[jnp.ndarray] = None,
    near_plane: float = 0.5,
    far_plane: float = 1e10,
    eps2d: float = 0.3,
    radius_clip: float = 0.0,
    antialiased: bool = True,
) -> Projected:
    """EWA perspective projection of 3D gaussians (gsplat `fully_fused_projection`
    semantics as invoked at `splatad.py:977-1003`).

    velocities: per-gaussian world-frame velocity [N,3]. Camera velocities are in
    the camera frame (already y/z-flipped by the caller, `splatad.py:958-962`).
    Returns pixel-space velocity of each gaussian for per-pixel-time RS warping.
    """
    r_wc = viewmat[:3, :3]
    t_wc = viewmat[:3, 3]
    p_cam = means @ r_wc.T + t_wc  # [N, 3]
    depths = p_cam[..., 2]

    # Behind-camera gaussians are culled below, but their huge projected values
    # would overflow fp32 in the BACKWARD pass (det^2 -> inf -> NaN via 0*inf).
    # Replace them with a safe dummy before any division so the garbage path
    # never enters the gradient graph.
    safe = depths > near_plane
    p_cam = jnp.where(safe[:, None], p_cam, jnp.array([0.0, 0.0, 1.0]))

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z = jnp.clip(p_cam[..., 2], 1e-6, None)
    x_ndc = p_cam[..., 0] / z
    y_ndc = p_cam[..., 1] / z
    means2d = jnp.stack([fx * x_ndc + cx, fy * y_ndc + cy], axis=-1)

    # cov in camera frame
    cov_cam = jnp.einsum("ij,njk,lk->nil", r_wc, covars, r_wc)
    # EWA Jacobian
    zero = jnp.zeros_like(z)
    j = jnp.stack(
        [
            jnp.stack([fx / z, zero, -fx * x_ndc / z], axis=-1),
            jnp.stack([zero, fy / z, -fy * y_ndc / z], axis=-1),
        ],
        axis=-2,
    )  # [N, 2, 3]
    cov2d = jnp.einsum("nij,njk,nlk->nil", j, cov_cam, j)  # [N, 2, 2]

    det_orig = cov2d[..., 0, 0] * cov2d[..., 1, 1] - cov2d[..., 0, 1] ** 2
    cov2d = cov2d + eps2d * jnp.eye(2)
    det = cov2d[..., 0, 0] * cov2d[..., 1, 1] - cov2d[..., 0, 1] ** 2
    compensations = jnp.sqrt(jnp.clip(det_orig / jnp.clip(det, 1e-12, None), 1e-12, None))
    if not antialiased:
        compensations = jnp.ones_like(compensations)

    det_safe = jnp.clip(det, 1e-12, None)
    conics = jnp.stack(
        [cov2d[..., 1, 1] / det_safe, -cov2d[..., 0, 1] / det_safe, cov2d[..., 0, 0] / det_safe],
        axis=-1,
    )

    # 3-sigma screen radius
    b = 0.5 * (cov2d[..., 0, 0] + cov2d[..., 1, 1])
    v1 = b + jnp.sqrt(jnp.clip(b * b - det, 0.01, None))
    radius = jnp.ceil(3.0 * jnp.sqrt(v1))

    in_frustum = (depths > near_plane) & (depths < far_plane)
    on_screen = (
        (means2d[..., 0] + radius > 0)
        & (means2d[..., 0] - radius < width)
        & (means2d[..., 1] + radius > 0)
        & (means2d[..., 1] - radius < height)
    )
    big_enough = radius > radius_clip
    valid = in_frustum & on_screen & big_enough
    radii = jnp.where(valid, radius, 0.0)

    # pixel-space velocity for rolling shutter: relative velocity in camera frame
    # (gaussian world vel rotated + camera linear/angular motion), projected.
    vel_cam = jnp.zeros_like(p_cam)
    if velocities is not None:
        vel_cam = vel_cam + velocities @ r_wc.T
    if camera_linear_velocity is not None:
        vel_cam = vel_cam - camera_linear_velocity[None, :]
    if camera_angular_velocity is not None:
        vel_cam = vel_cam - jnp.cross(jnp.broadcast_to(camera_angular_velocity, p_cam.shape), p_cam)
    vel2d = jnp.stack(
        [
            fx * (vel_cam[..., 0] / z - x_ndc * vel_cam[..., 2] / z),
            fy * (vel_cam[..., 1] / z - y_ndc * vel_cam[..., 2] / z),
        ],
        axis=-1,
    )

    return Projected(
        means2d=means2d,
        depths=depths,
        conics=conics,
        radii=radii,
        compensations=compensations,
        vel2d=vel2d,
        depth_vel=jnp.zeros_like(depths),
    )


def project_gaussians_lidar(
    means: jnp.ndarray,
    covars: jnp.ndarray,
    viewmat: jnp.ndarray,
    velocities: Optional[jnp.ndarray] = None,
    lidar_linear_velocity: Optional[jnp.ndarray] = None,
    lidar_angular_velocity: Optional[jnp.ndarray] = None,
    min_range: float = 0.2,
    max_range: float = 300.0,
    eps2d_deg: float = 0.02,
) -> Projected:
    """Project gaussians into spherical (azimuth, elevation) coordinates for
    lidar rasterization (gsplat fork `lidar_rasterization` projection stage,
    `splatad.py:1135-1166`).

    means2d = (azimuth_deg, elevation_deg); depths = range (m); conics are the
    inverse covariance in degrees^2. depth_vel is the range rate used to
    rolling-shutter-correct the per-point expected depth.
    """
    r_wl = viewmat[:3, :3]
    t_wl = viewmat[:3, 3]
    p = means @ r_wl.T + t_wl  # sensor frame [N, 3]
    true_rng = jnp.linalg.norm(p, axis=-1)
    # same fp32-overflow guard as the camera path: too-close gaussians are culled,
    # swap them to a safe dummy before the 1/r^2 Jacobian chain
    safe = true_rng > min_range
    p = jnp.where(safe[:, None], p, jnp.array([1.0, 0.0, 0.0]))
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    r2d = jnp.sqrt(jnp.clip(x * x + y * y, 1e-12, None))
    rng = jnp.sqrt(jnp.clip(x * x + y * y + z * z, 1e-12, None))
    azim = jnp.rad2deg(jnp.arctan2(y, x))
    elev = jnp.rad2deg(jnp.arctan2(z, jnp.clip(r2d, 1e-9, None)))
    means2d = jnp.stack([azim, elev], axis=-1)

    cov_l = jnp.einsum("ij,njk,lk->nil", r_wl, covars, r_wl)
    # Jacobian of (azim_deg, elev_deg, range) wrt xyz; keep the angular 2x3 block
    rad2deg = 180.0 / jnp.pi
    r2d_s = jnp.clip(r2d, 1e-9, None)
    rng_s = jnp.clip(rng, 1e-9, None)
    j = jnp.stack(
        [
            jnp.stack([-y / (r2d_s**2), x / (r2d_s**2), jnp.zeros_like(x)], axis=-1) * rad2deg,
            jnp.stack(
                [-x * z / (r2d_s * rng_s**2), -y * z / (r2d_s * rng_s**2), r2d_s / rng_s**2], axis=-1
            )
            * rad2deg,
        ],
        axis=-2,
    )  # [N, 2, 3]
    cov2d = jnp.einsum("nij,njk,nlk->nil", j, cov_l, j)
    det_orig = cov2d[..., 0, 0] * cov2d[..., 1, 1] - cov2d[..., 0, 1] ** 2
    cov2d = cov2d + (eps2d_deg**2) * jnp.eye(2)
    det = cov2d[..., 0, 0] * cov2d[..., 1, 1] - cov2d[..., 0, 1] ** 2
    compensations = jnp.sqrt(jnp.clip(det_orig / jnp.clip(det, 1e-12, None), 1e-12, None))
    det_safe = jnp.clip(det, 1e-12, None)
    conics = jnp.stack(
        [cov2d[..., 1, 1] / det_safe, -cov2d[..., 0, 1] / det_safe, cov2d[..., 0, 0] / det_safe],
        axis=-1,
    )
    b = 0.5 * (cov2d[..., 0, 0] + cov2d[..., 1, 1])
    v1 = b + jnp.sqrt(jnp.clip(b * b - det, 1e-6, None))
    radius = 3.0 * jnp.sqrt(v1)  # degrees

    valid = safe & (true_rng < max_range)
    radii = jnp.where(valid, radius, 0.0)

    # angular + range velocities for rolling shutter
    vel_l = jnp.zeros_like(p)
    if velocities is not None:
        vel_l = vel_l + velocities @ r_wl.T
    if lidar_linear_velocity is not None:
        vel_l = vel_l - lidar_linear_velocity[None, :]
    if lidar_angular_velocity is not None:
        vel_l = vel_l - jnp.cross(jnp.broadcast_to(lidar_angular_velocity, p.shape), p)
    vel2d = jnp.einsum("nij,nj->ni", j, vel_l)  # deg/s in (azim, elev)
    depth_vel = jnp.sum(p * vel_l, axis=-1) / rng_s  # range rate m/s

    return Projected(
        means2d=means2d,
        depths=rng,
        conics=conics,
        radii=radii,
        compensations=compensations,
        vel2d=vel2d,
        depth_vel=depth_vel,
    )
