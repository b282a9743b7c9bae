"""Camera utility tests."""

import numpy as np

from neurad_tpu.cameras.camera_utils import (
    auto_orient_and_center_poses,
    get_distortion_params,
    get_interpolated_poses,
    rotation_matrix_between,
    viewmatrix,
)


def test_rotation_matrix_between():
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    r = rotation_matrix_between(a, b)
    np.testing.assert_allclose(r @ a, b, atol=1e-7)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-7)


def test_viewmatrix_looks_at():
    m = viewmatrix(np.array([0.0, 0.0, -1.0]), np.array([0.0, 1.0, 0.0]), np.zeros(3))
    np.testing.assert_allclose(-m[:3, 2], [0, 0, -1], atol=1e-7)  # forward = -z col


def test_auto_orient_centers():
    poses = np.tile(np.eye(4)[:3], (4, 1, 1)).astype(np.float32)
    poses[:, 0, 3] = np.arange(4)
    oriented, transform = auto_orient_and_center_poses(poses)
    np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0.0, atol=1e-5)


def test_interpolated_poses():
    a = np.eye(4)[:3]
    b = np.eye(4)[:3].copy()
    b[:3, 3] = [2.0, 0.0, 0.0]
    path = get_interpolated_poses(a, b, steps=5)
    assert path.shape == (5, 3, 4)
    np.testing.assert_allclose(path[2][:3, 3], [1.0, 0.0, 0.0], atol=1e-6)
    assert get_distortion_params(k1=0.1)[0] == np.float32(0.1)
