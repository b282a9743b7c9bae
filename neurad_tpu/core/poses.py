"""Pose algebra and trajectory interpolation (pure jnp).

Counterpart of `nerfstudio/utils/poses.py` and the rotation helpers in
`nerfstudio/cameras/camera_utils.py` (quat/rotmat/6D conversions). All functions are
batched, differentiable, and static-shape: the reference's flattened (`torch.where`
-indexed) trajectory interpolation variants become dense masked variants so they jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def to4x4(pose: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 4] -> [..., 4, 4] homogeneous (`poses.py:24-35`)."""
    bottom = jnp.zeros_like(pose[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([pose, bottom], axis=-2)


def inverse(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert [..., 3, 4] rigid poses (`poses.py:38-52`): R^T, -R^T t."""
    r_inv = jnp.swapaxes(pose[..., :3, :3], -1, -2)
    t_inv = -(r_inv @ pose[..., :3, 3:])
    return jnp.concatenate([r_inv, t_inv], axis=-1)


def multiply(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """Compose [..., 3, 4] poses a∘b (`poses.py:55-68`)."""
    r = pose_a[..., :3, :3] @ pose_b[..., :3, :3]
    t = pose_a[..., :3, :3] @ pose_b[..., :3, 3:] + pose_a[..., :3, 3:]
    return jnp.concatenate([r, t], axis=-1)


def normalize(poses: jnp.ndarray) -> jnp.ndarray:
    """Scale translations into [-1, 1] (`poses.py:71-87`)."""
    scale = jnp.max(jnp.abs(poses[..., :3, 3]))
    return poses.at[..., :3, 3].divide(scale)


def transform_points(points: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Apply a [..., 3, 4] pose to [..., N, 3] points."""
    return points @ jnp.swapaxes(pose[..., :3, :3], -1, -2) + pose[..., None, :3, 3]


# ---------------------------------------------------------------------------
# Rotation representations
# ---------------------------------------------------------------------------


def rotmat_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (xyzw).

    Branchless Shepperd-style conversion (reference uses roma's
    `rotmat_to_unitquat`, `cameras/camera_utils.py`): compute all four candidate
    quaternions and pick the numerically best by largest pivot.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, 1e-12, None)) / 2.0
    q0 = jnp.stack([(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0), qw0], axis=-1)

    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-12, None)) / 2.0
    q1 = jnp.stack([qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1), (m21 - m12) / (4 * qx1)], axis=-1)

    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-12, None)) / 2.0
    q2 = jnp.stack([(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2), (m02 - m20) / (4 * qy2)], axis=-1)

    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-12, None)) / 2.0
    q3 = jnp.stack([(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3, (m10 - m01) / (4 * qz3)], axis=-1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 > m11) & (m00 > m22))[..., None]
    cond2 = (m11 > m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (xyzw) -> rotation matrix [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, frac: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation between unit quaternions (shortest arc)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    frac = jnp.asarray(frac)
    if frac.ndim == q0.ndim - 1:
        frac = frac[..., None]  # broadcast over the quaternion components
    # fall back to lerp for nearly-parallel quats
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - frac, jnp.sin((1.0 - frac) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, frac, jnp.sin(frac * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotmat_to_6d(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> 6D rep (first two ROWS, as in the reference's
    `rotation_matrix_to_6d`, used by DynamicActors)."""
    return jnp.concatenate([r[..., 0, :], r[..., 1, :]], axis=-1)


def rot6d_to_rotmat(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rep -> rotation matrix via Gram-Schmidt (Zhou et al. 2019)."""
    a1 = d6[..., :3]
    a2 = d6[..., 3:6]
    b1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8, None)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / jnp.clip(jnp.linalg.norm(a2, axis=-1, keepdims=True), 1e-8, None)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


# ---------------------------------------------------------------------------
# Trajectory interpolation
# ---------------------------------------------------------------------------


def _interp_indices(pose_times: jnp.ndarray, query_times: jnp.ndarray, clamp_frac: bool):
    """Shared left/right index + fraction computation (`poses.py:170-186`)."""
    qt = query_times.reshape(-1)
    right_idx = jnp.searchsorted(pose_times, qt)
    right_idx = jnp.clip(right_idx, 1, len(pose_times) - 1)
    left_idx = right_idx - 1
    right_time = pose_times[right_idx]
    left_time = pose_times[left_idx]
    frac = (qt - left_time) / (right_time - left_time + 1e-6)
    if clamp_frac:
        frac = jnp.clip(frac, 0.0, 1.0)
    return left_idx, right_idx, frac


def interpolate_trajectories(
    poses: jnp.ndarray,
    pose_times: jnp.ndarray,
    query_times: jnp.ndarray,
    pose_valid_mask: Optional[jnp.ndarray] = None,
    clamp_frac: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slerp-interpolate actor poses at query times (`poses.py:153-198`), dense variant.

    Args:
        poses: [num_times, num_actors, 3, 4]
        pose_times: [num_times] sorted
        query_times: [num_queries] (or [num_queries, 1])
        pose_valid_mask: [num_times, num_actors] bool

    Returns:
        interp: [num_queries, num_actors, 3, 4]
        valid: [num_queries, num_actors] bool (left OR right pose valid — the
            reference's `trajs_to_sample`; callers mask instead of gathering so
            shapes stay static for jit)
    """
    left_idx, right_idx, frac = _interp_indices(pose_times, query_times, clamp_frac)
    if pose_valid_mask is None:
        pose_valid_mask = jnp.ones(poses.shape[:2], dtype=bool)
    valid = pose_valid_mask[left_idx] | pose_valid_mask[right_idx]  # [Q, A]

    quat = rotmat_to_quat(poses[..., :3, :3])  # [T, A, 4]
    q0 = quat[left_idx]  # [Q, A, 4]
    q1 = quat[right_idx]
    q = quat_slerp(q0, q1, jnp.broadcast_to(frac[:, None], q0.shape[:-1]))
    rot = quat_to_rotmat(q)

    p0 = poses[left_idx][..., :3, 3]
    p1 = poses[right_idx][..., :3, 3]
    pos = p0 + (p1 - p0) * frac[:, None, None]
    interp = jnp.concatenate([rot, pos[..., None]], axis=-1)
    return interp, valid


def interpolate_trajectories_6d(
    poses9d: jnp.ndarray,
    pose_times: jnp.ndarray,
    query_times: jnp.ndarray,
    pose_valid_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable 9D (6d rot + 3 pos) trajectory interpolation (`poses.py:90-150`),
    dense/masked variant (the reference's `flatten=False` path).

    Args:
        poses9d: [num_actors, num_times, 9]  (matches reference layout)
        pose_times: [num_times]
        query_times: [num_queries] or [num_queries, 1]
        pose_valid_mask: [num_times, num_actors] bool

    Returns:
        interp: [num_queries, num_actors, 9] (orthogonalized 6d + lerped position)
        valid:  [num_queries, num_actors] bool
    """
    # Orthogonalize the first two axes (reference lines 115-121).
    a1 = poses9d[..., :3]
    a1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8, None)
    a2 = poses9d[..., 3:6]
    a2 = a2 - jnp.sum(a1 * a2, axis=-1, keepdims=True) * a1
    a2 = a2 / jnp.clip(jnp.linalg.norm(a2, axis=-1, keepdims=True), 1e-8, None)
    poses = jnp.concatenate([a1, a2, poses9d[..., 6:9]], axis=-1)  # [A, T, 9]

    qt = query_times.reshape(-1)
    right_idx = jnp.clip(jnp.searchsorted(pose_times, qt), 0, len(pose_times) - 1)
    left_idx = jnp.clip(right_idx - 1, 0, None)
    frac = (qt - pose_times[left_idx]) / (pose_times[right_idx] - pose_times[left_idx] + 1e-6)
    frac = jnp.clip(frac, 0.0, 1.0)

    poses_t_first = jnp.swapaxes(poses, 0, 1)  # [T, A, 9]
    pl_ = poses_t_first[left_idx]  # [Q, A, 9]
    pr_ = poses_t_first[right_idx]
    interp = pl_ + (pr_ - pl_) * frac[:, None, None]

    if pose_valid_mask is None:
        valid = jnp.ones((len(qt), poses.shape[0]), dtype=bool)
    else:
        valid = pose_valid_mask[left_idx] | pose_valid_mask[right_idx]
    return interp, valid


def interpolate_velocities(
    velocities: jnp.ndarray, pose_times: jnp.ndarray, query_times: jnp.ndarray, clamp_frac: bool = False
) -> jnp.ndarray:
    """Lerp velocities at query times (`poses.py:202-218`)."""
    left_idx, right_idx, frac = _interp_indices(pose_times, query_times, clamp_frac)
    v0 = velocities[left_idx]
    v1 = velocities[right_idx]
    frac = frac.reshape(frac.shape + (1,) * (v0.ndim - 1))
    return v0 + (v1 - v0) * frac


def rotation_difference(rot1: jnp.ndarray, rot2: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle of rot1->rot2 (`poses.py:221-249`)."""
    r_rel = jnp.swapaxes(rot1, -2, -1) @ rot2
    trace = r_rel[..., 0, 0] + r_rel[..., 1, 1] + r_rel[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
    axis = jnp.stack(
        [
            r_rel[..., 2, 1] - r_rel[..., 1, 2],
            r_rel[..., 0, 2] - r_rel[..., 2, 0],
            r_rel[..., 1, 0] - r_rel[..., 0, 1],
        ],
        axis=-1,
    )
    axis = axis / jnp.clip(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-8, None)
    return theta[..., None] * axis
