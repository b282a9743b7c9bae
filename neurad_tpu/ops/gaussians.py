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


def quat_scale_to_covar6(quats: jnp.ndarray, scales: jnp.ndarray):
    """[N,4] wxyz quats + [N,3] scales -> 6 separate [N] covariance entries
    (xx, xy, xz, yy, yz, zz) of R S S R^T.

    Structure-of-arrays twin of `quat_scale_to_covariance`: [N,3,3] arrays get
    T(4,128) tilings on TPU whose relayouts dominate the projection cost
    (measured ~18 ms/frame at 500k gaussians on v5e); keeping every quantity a
    flat [N] f32 array stays in fast elementwise land."""
    w, x, y, z = (quats[..., i] for i in range(4))
    n = jnp.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    r = (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )
    s0, s1, s2 = scales[..., 0] ** 2, scales[..., 1] ** 2, scales[..., 2] ** 2

    def entry(i, j):
        return r[3 * i] * r[3 * j] * s0 + r[3 * i + 1] * r[3 * j + 1] * s1 + r[3 * i + 2] * r[3 * j + 2] * s2

    return (entry(0, 0), entry(0, 1), entry(0, 2), entry(1, 1), entry(1, 2), entry(2, 2))


def _rotate_covar6(R: jnp.ndarray, c6):
    """Σ' = R Σ R^T with R a [3,3] matrix of (traced) scalars and Σ six [N]
    entries; returns six [N] entries."""
    S = ((c6[0], c6[1], c6[2]), (c6[1], c6[3], c6[4]), (c6[2], c6[4], c6[5]))
    # t[j][k] = (Σ R^T)_{k j} = sum_l Σ_kl R_jl
    t = [[sum(S[k][l] * R[j, l] for l in range(3)) for k in range(3)] for j in range(3)]
    out = {}
    for i in range(3):
        for j in range(i, 3):
            out[(i, j)] = sum(R[i, k] * t[j][k] for k in range(3))
    return (out[(0, 0)], out[(0, 1)], out[(0, 2)], out[(1, 1)], out[(1, 2)], out[(2, 2)])


def _bilinear6(j0, j1, c6):
    """j0 Σ j1^T for per-row 3-vectors j0/j1 (tuples of [N]) and Σ six [N] entries."""
    S00, S01, S02, S11, S12, S22 = c6
    t0 = S00 * j1[0] + S01 * j1[1] + S02 * j1[2]
    t1 = S01 * j1[0] + S11 * j1[1] + S12 * j1[2]
    t2 = S02 * j1[0] + S12 * j1[1] + S22 * j1[2]
    return j0[0] * t0 + j0[1] * t1 + j0[2] * t2


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
    covars: Optional[jnp.ndarray] = None,
    viewmat: jnp.ndarray = None,
    K: jnp.ndarray = None,
    width: int = 0,
    height: int = 0,
    velocities: Optional[jnp.ndarray] = None,
    camera_linear_velocity: Optional[jnp.ndarray] = None,
    camera_angular_velocity: Optional[jnp.ndarray] = None,
    near_plane: float = 0.5,
    far_plane: float = 1e10,
    eps2d: float = 0.3,
    radius_clip: float = 0.0,
    antialiased: bool = True,
    covar6: Optional[Tuple[jnp.ndarray, ...]] = None,
) -> Projected:
    """EWA perspective projection of 3D gaussians (gsplat `fully_fused_projection`
    semantics as invoked at `splatad.py:977-1003`).

    velocities: per-gaussian world-frame velocity [N,3]. Camera velocities are in
    the camera frame (already y/z-flipped by the caller, `splatad.py:958-962`).
    Returns pixel-space velocity of each gaussian for per-pixel-time RS warping.

    Covariance input: either `covars` [N,3,3] (einsum path) or `covar6`
    (six [N] entries from `quat_scale_to_covar6`). The covar6 path is the fast
    one on TPU: no [N,3,3]/[N,2,2] intermediates, whose tiled-layout relayouts
    measured ~18 ms/frame at 500k gaussians — the whole quadratic-form chain
    stays flat [N] arrays.
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

    if covar6 is not None:
        c6_cam = _rotate_covar6(r_wc, covar6)
        zero = jnp.zeros_like(z)
        j0 = (fx / z, zero, -fx * x_ndc / z)
        j1 = (zero, fy / z, -fy * y_ndc / z)
        cov_a = _bilinear6(j0, j0, c6_cam)
        cov_b = _bilinear6(j0, j1, c6_cam)
        cov_c = _bilinear6(j1, j1, c6_cam)
    else:
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
        cov_a, cov_b, cov_c = cov2d[..., 0, 0], cov2d[..., 0, 1], cov2d[..., 1, 1]

    det_orig = cov_a * cov_c - cov_b**2
    cov_a = cov_a + eps2d
    cov_c = cov_c + eps2d
    det = cov_a * cov_c - cov_b**2
    compensations = jnp.sqrt(jnp.clip(det_orig / jnp.clip(det, 1e-12, None), 1e-12, None))
    if not antialiased:
        compensations = jnp.ones_like(compensations)

    det_safe = jnp.clip(det, 1e-12, None)
    conics = jnp.stack([cov_c / det_safe, -cov_b / det_safe, cov_a / det_safe], axis=-1)

    # 3-sigma screen radius
    b = 0.5 * (cov_a + cov_c)
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
    covars: Optional[jnp.ndarray] = None,
    viewmat: jnp.ndarray = None,
    velocities: Optional[jnp.ndarray] = None,
    lidar_linear_velocity: Optional[jnp.ndarray] = None,
    lidar_angular_velocity: Optional[jnp.ndarray] = None,
    min_range: float = 0.2,
    max_range: float = 300.0,
    eps2d_deg: float = 0.02,
    covar6: Optional[Tuple[jnp.ndarray, ...]] = None,
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

    # Jacobian of (azim_deg, elev_deg, range) wrt xyz; keep the angular 2x3 block
    rad2deg = 180.0 / jnp.pi
    r2d_s = jnp.clip(r2d, 1e-9, None)
    rng_s = jnp.clip(rng, 1e-9, None)
    j00 = -y / (r2d_s**2) * rad2deg
    j01 = x / (r2d_s**2) * rad2deg
    j02 = jnp.zeros_like(x)
    j10 = -x * z / (r2d_s * rng_s**2) * rad2deg
    j11 = -y * z / (r2d_s * rng_s**2) * rad2deg
    j12 = r2d_s / rng_s**2 * rad2deg
    if covar6 is not None:
        c6_l = _rotate_covar6(r_wl, covar6)
        cov_a = _bilinear6((j00, j01, j02), (j00, j01, j02), c6_l)
        cov_b = _bilinear6((j00, j01, j02), (j10, j11, j12), c6_l)
        cov_c = _bilinear6((j10, j11, j12), (j10, j11, j12), c6_l)
    else:
        cov_l = jnp.einsum("ij,njk,lk->nil", r_wl, covars, r_wl)
        j = jnp.stack(
            [
                jnp.stack([j00, j01, j02], axis=-1),
                jnp.stack([j10, j11, j12], axis=-1),
            ],
            axis=-2,
        )  # [N, 2, 3]
        cov2d = jnp.einsum("nij,njk,nlk->nil", j, cov_l, j)
        cov_a, cov_b, cov_c = cov2d[..., 0, 0], cov2d[..., 0, 1], cov2d[..., 1, 1]
    det_orig = cov_a * cov_c - cov_b**2
    cov_a = cov_a + eps2d_deg**2
    cov_c = cov_c + eps2d_deg**2
    det = cov_a * cov_c - cov_b**2
    compensations = jnp.sqrt(jnp.clip(det_orig / jnp.clip(det, 1e-12, None), 1e-12, None))
    det_safe = jnp.clip(det, 1e-12, None)
    conics = jnp.stack([cov_c / det_safe, -cov_b / det_safe, cov_a / det_safe], axis=-1)
    b = 0.5 * (cov_a + cov_c)
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
    v0, v1_, v2 = vel_l[..., 0], vel_l[..., 1], vel_l[..., 2]
    vel2d = jnp.stack([j00 * v0 + j01 * v1_ + j02 * v2, j10 * v0 + j11 * v1_ + j12 * v2], axis=-1)
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
