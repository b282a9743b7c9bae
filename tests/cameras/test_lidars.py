"""Lidar ray-generation tests (`nerfstudio/cameras/lidars.py:399-470` semantics)."""

import jax.numpy as jnp
import numpy as np

from neurad_tpu.cameras.lidars import (
    LidarType,
    Lidars,
    generate_lidar_rays_from_points,
    transform_points,
    transform_points_pairwise,
)


def _make_lidars(n=2, velocities=None):
    l2w = jnp.stack([jnp.eye(4)[:3, :4] for _ in range(n)])
    l2w = l2w.at[1, :3, 3].set(jnp.array([10.0, 0.0, 0.0]))
    metadata = {}
    if velocities is not None:
        metadata["velocities"] = velocities
    return Lidars(
        lidar_to_worlds=l2w,
        lidar_type=jnp.full((n, 1), int(LidarType.PANDAR64), dtype=jnp.int32),
        times=jnp.array([[100.0], [101.0]]),
        metadata=metadata,
    )


def test_rays_through_points():
    lidars = _make_lidars()
    pts = jnp.array([[3.0, 0.0, 0.0, 0.5, 0.0], [0.0, 4.0, 0.0, 0.2, 0.0]])
    bundle = generate_lidar_rays_from_points(lidars, jnp.array([0, 0]), pts)
    np.testing.assert_allclose(np.asarray(bundle.directions[0]), [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(bundle.directions[1]), [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(bundle.metadata["directions_norm"][:, 0]), [3.0, 4.0], atol=1e-6)
    assert bool(bundle.metadata["is_lidar"].all())
    assert bool(bundle.metadata["did_return"].all())


def test_sensor_offset_and_times():
    lidars = _make_lidars()
    pts = jnp.array([[5.0, 0.0, 0.0, 0.1, 0.02]])
    bundle = generate_lidar_rays_from_points(lidars, jnp.array([1]), pts)
    np.testing.assert_allclose(np.asarray(bundle.origins[0]), [10.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(float(bundle.times[0, 0]), 101.02, atol=1e-6)


def test_ego_motion_origin_correction():
    vel = jnp.array([[2.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    lidars = _make_lidars(velocities=vel)
    # timediff 0.5s, velocity 2 m/s -> origin shifted 1m in x
    pts = jnp.array([[5.0, 0.0, 0.0, 0.1, 0.5]])
    bundle = generate_lidar_rays_from_points(lidars, jnp.array([0]), pts)
    np.testing.assert_allclose(float(bundle.origins[0, 0]), 1.0, atol=1e-6)


def test_non_return_threshold():
    lidars = _make_lidars()
    pts = jnp.array([[2e3, 0.0, 0.0, 0.0, 0.0]])  # DUMMY_DISTANCE missing point
    bundle = generate_lidar_rays_from_points(lidars, jnp.array([0]), pts)
    assert not bool(bundle.metadata["did_return"][0, 0])


def test_transform_points_helpers():
    pose = jnp.concatenate([jnp.eye(3), jnp.array([[1.0], [0.0], [0.0]])], axis=-1)
    pts = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(transform_points(pts, pose)), [[1.0, 1.0, 0.0]], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(transform_points_pairwise(pts, pose[None])), [[1.0, 1.0, 0.0]], atol=1e-6
    )
