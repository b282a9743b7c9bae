"""Pose algebra tests (mirrors reference tests/utils/test_poses.py coverage)."""

import jax.numpy as jnp
import numpy as np
import pytest

from neurad_tpu.core import poses as pose_utils


def random_pose(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.normal(size=(3, 1))
    return jnp.asarray(np.concatenate([q, t], axis=1), dtype=jnp.float32)


def test_inverse_multiply_identity():
    rng = np.random.default_rng(0)
    pose = random_pose(rng)
    ident = pose_utils.multiply(pose, pose_utils.inverse(pose))
    np.testing.assert_allclose(ident[:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(ident[:3, 3], 0.0, atol=1e-5)


def test_to4x4():
    rng = np.random.default_rng(1)
    pose = random_pose(rng)
    h = pose_utils.to4x4(pose)
    assert h.shape == (4, 4)
    np.testing.assert_allclose(h[3], [0, 0, 0, 1])


def test_quat_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        r = random_pose(rng)[:3, :3]
        q = pose_utils.rotmat_to_quat(r)
        r2 = pose_utils.quat_to_rotmat(q)
        np.testing.assert_allclose(r, r2, atol=1e-5)


def test_rot6d_roundtrip():
    rng = np.random.default_rng(3)
    r = random_pose(rng)[:3, :3]
    d6 = pose_utils.rotmat_to_6d(r)
    r2 = pose_utils.rot6d_to_rotmat(d6)
    np.testing.assert_allclose(r, r2, atol=1e-5)


def test_slerp_endpoints():
    rng = np.random.default_rng(4)
    r0 = random_pose(rng)[:3, :3]
    r1 = random_pose(rng)[:3, :3]
    q0 = pose_utils.rotmat_to_quat(r0)
    q1 = pose_utils.rotmat_to_quat(r1)
    q_start = pose_utils.quat_slerp(q0, q1, jnp.array(0.0))
    q_end = pose_utils.quat_slerp(q0, q1, jnp.array(1.0))
    np.testing.assert_allclose(pose_utils.quat_to_rotmat(q_start), r0, atol=1e-5)
    np.testing.assert_allclose(pose_utils.quat_to_rotmat(q_end), r1, atol=1e-5)


def test_interpolate_trajectories_midpoint_translation():
    # Two actors, two timestamps, pure-translation trajectories.
    t0 = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    t1 = t0.copy()
    t1[:, :3, 3] = [[2, 0, 0], [0, 4, 0]]
    poses = jnp.asarray(np.stack([t0, t1]))  # [T=2, A=2, 3, 4]
    times = jnp.array([0.0, 1.0])
    interp, valid = pose_utils.interpolate_trajectories(poses, times, jnp.array([0.5]))
    assert interp.shape == (1, 2, 3, 4)
    assert valid.all()
    np.testing.assert_allclose(interp[0, 0, :3, 3], [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(interp[0, 1, :3, 3], [0, 2, 0], atol=1e-5)


def test_interpolate_trajectories_rotation_slerp():
    # 90-degree z rotation interpolated at 0.5 should be 45 degrees.
    r0 = np.eye(3, 4, dtype=np.float32)
    theta = np.pi / 2
    r1 = np.array(
        [[np.cos(theta), -np.sin(theta), 0, 0], [np.sin(theta), np.cos(theta), 0, 0], [0, 0, 1, 0]], dtype=np.float32
    )
    poses = jnp.asarray(np.stack([r0, r1])[:, None])  # [2, 1, 3, 4]
    interp, _ = pose_utils.interpolate_trajectories(poses, jnp.array([0.0, 1.0]), jnp.array([0.5]))
    expected = np.array(
        [[np.cos(theta / 2), -np.sin(theta / 2), 0], [np.sin(theta / 2), np.cos(theta / 2), 0], [0, 0, 1]]
    )
    np.testing.assert_allclose(interp[0, 0, :3, :3], expected, atol=1e-5)


def test_interpolate_trajectories_6d_is_differentiable():
    import jax

    poses9d = jnp.zeros((2, 3, 9)).at[..., 0].set(1.0).at[..., 4].set(1.0)  # identity 6d
    poses9d = poses9d.at[..., 6].set(jnp.arange(3.0))  # x moves over time
    times = jnp.array([0.0, 1.0, 2.0])

    def loss(p):
        interp, _ = pose_utils.interpolate_trajectories_6d(p, times, jnp.array([0.5, 1.5]))
        return jnp.sum(interp[..., 6])

    g = jax.grad(loss)(poses9d)
    assert jnp.isfinite(g).all()
    assert (jnp.abs(g) > 0).any()


def test_interpolate_velocities():
    vels = jnp.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    out = pose_utils.interpolate_velocities(vels, jnp.array([0.0, 1.0]), jnp.array([0.25]))
    np.testing.assert_allclose(out[0], [0.5, 0, 0], atol=1e-6)


def test_rotation_difference():
    rng = np.random.default_rng(5)
    r1 = random_pose(rng)[:3, :3]
    theta = 0.3
    rz = jnp.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], dtype=jnp.float32
    )
    r2 = r1 @ rz
    aa = pose_utils.rotation_difference(r1, r2)
    np.testing.assert_allclose(np.linalg.norm(aa), theta, atol=1e-4)
