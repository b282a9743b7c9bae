"""Camera ray-generation tests (counterpart of reference tests/cameras/test_cameras.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurad_tpu.cameras.cameras import (
    CameraType,
    Cameras,
    RollingShutterDirection,
    full_image_coords,
    generate_rays,
    radial_and_tangential_undistort,
)


def _make_cameras(n=2, h=8, w=10, cam_type=CameraType.PERSPECTIVE, distortion=None, metadata=None, times=None):
    c2w = jnp.broadcast_to(jnp.eye(4)[:3, :4], (n, 3, 4))
    return Cameras(
        camera_to_worlds=c2w,
        fx=jnp.full((n, 1), 10.0),
        fy=jnp.full((n, 1), 10.0),
        cx=jnp.full((n, 1), w / 2.0),
        cy=jnp.full((n, 1), h / 2.0),
        width=jnp.full((n, 1), w, dtype=jnp.int32),
        height=jnp.full((n, 1), h, dtype=jnp.int32),
        camera_type=jnp.full((n, 1), int(cam_type), dtype=jnp.int32),
        distortion_params=distortion,
        times=times,
        metadata=metadata or {},
    )


def test_perspective_center_ray_points_forward():
    cams = _make_cameras()
    coords = jnp.array([[4.0, 5.0]])  # (row=cy, col=cx)
    bundle = generate_rays(cams, jnp.array([0]), coords)
    # OpenGL convention: center pixel looks along -z
    np.testing.assert_allclose(np.asarray(bundle.directions[0]), [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(bundle.origins[0]), [0.0, 0.0, 0.0], atol=1e-6)
    assert bundle.pixel_area.shape == (1, 1)
    assert float(bundle.pixel_area[0, 0]) > 0


def test_ray_shapes_and_unit_norm():
    cams = _make_cameras(n=3)
    coords = full_image_coords(8, 10)
    idx = jnp.zeros(coords.shape[0], dtype=jnp.int32)
    bundle = generate_rays(cams, idx, coords)
    assert bundle.origins.shape == (80, 3)
    assert bundle.directions.shape == (80, 3)
    norms = jnp.linalg.norm(bundle.directions, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-6)


def test_offset_pixel_direction_sign():
    cams = _make_cameras()
    # one pixel right of center: +x direction; one pixel down: -y (OpenGL y up)
    bundle = generate_rays(cams, jnp.array([0, 0]), jnp.array([[4.0, 6.0], [5.0, 5.0]]))
    assert float(bundle.directions[0, 0]) > 0
    assert float(bundle.directions[1, 1]) < 0


def test_undistort_roundtrip():
    # distort a point with the forward model, then undo with the Newton solver
    params = jnp.array([0.01, -0.002, 0.0, 0.0, 0.001, -0.0005])
    x, y = 0.3, -0.2
    k1, k2, k3, k4, p1, p2 = (float(v) for v in params)
    r = x * x + y * y
    d = 1 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
    xd = x * d + 2 * p1 * x * y + p2 * (r + 2 * x * x)
    yd = y * d + 2 * p2 * x * y + p1 * (r + 2 * y * y)
    und = radial_and_tangential_undistort(jnp.array([[xd, yd]]), params[None])
    np.testing.assert_allclose(np.asarray(und[0]), [x, y], atol=1e-6)


def test_fisheye_and_equirect_run():
    for ct in (CameraType.FISHEYE, CameraType.EQUIRECTANGULAR):
        cams = _make_cameras(cam_type=ct)
        bundle = generate_rays(cams, jnp.array([0]), jnp.array([[4.0, 5.0]]))
        norms = jnp.linalg.norm(bundle.directions, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)


def test_equirect_center_looks_minus_z():
    cams = _make_cameras(h=8, w=16, cam_type=CameraType.EQUIRECTANGULAR)
    bundle = generate_rays(cams, jnp.array([0]), jnp.array([[4.0, 8.0]]))
    np.testing.assert_allclose(np.asarray(bundle.directions[0]), [0.0, 0.0, -1.0], atol=1e-5)


def test_rolling_shutter_shifts_origin_and_time():
    n, h, w = 2, 8, 10
    metadata = {
        "velocities": jnp.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]]),
        "rolling_shutter_time": jnp.full((n, 1), 0.03),
        "time_to_center_pixel": jnp.full((n, 1), -0.01),
        "rs_direction": jnp.full((n, 1), int(RollingShutterDirection.TOP_TO_BOTTOM), dtype=jnp.int32),
    }
    times = jnp.array([[10.0], [20.0]])
    cams = _make_cameras(n=n, h=h, w=w, metadata=metadata, times=times)
    # top row vs bottom row: different time offsets
    bundle = generate_rays(cams, jnp.array([0, 0]), jnp.array([[0.0, 5.0], [8.0, 5.0]]))
    t_top = (0.0 / h - 0.5) * 0.03 - 0.01
    t_bot = (8.0 / h - 0.5) * 0.03 - 0.01
    np.testing.assert_allclose(float(bundle.times[0, 0]), 10.0 + t_top, atol=1e-6)
    np.testing.assert_allclose(float(bundle.times[1, 0]), 10.0 + t_bot, atol=1e-6)
    # origin shifted by velocity * time offset along +x
    np.testing.assert_allclose(float(bundle.origins[0, 0]), 1.0 * t_top, atol=1e-6)
    # rs keys consumed, not forwarded per-ray
    assert "rolling_shutter_time" not in bundle.metadata
    assert "directions_norm" in bundle.metadata


def test_generate_rays_jits():
    cams = _make_cameras()
    coords = full_image_coords(8, 10)
    idx = jnp.zeros(coords.shape[0], dtype=jnp.int32)
    f = jax.jit(lambda c, i, x: generate_rays(c, i, x))
    bundle = f(cams, idx, coords)
    assert bundle.origins.shape == (80, 3)


def test_camera_opt_to_camera_applied():
    cams = _make_cameras()
    shift = jnp.concatenate([jnp.eye(3), jnp.array([[1.0], [2.0], [3.0]])], axis=-1)[None]
    bundle = generate_rays(cams, jnp.array([0]), jnp.array([[4.0, 5.0]]), camera_opt_to_camera=shift)
    np.testing.assert_allclose(np.asarray(bundle.origins[0]), [1.0, 2.0, 3.0], atol=1e-6)
