"""Pixel/point sampler tests."""

import numpy as np

from neurad_tpu.data.pixel_samplers import (
    sample_lidar_points,
    sample_pair_pixels,
    sample_patch_pixels,
    sample_scaled_patches,
    sample_uniform_pixels,
)


def test_uniform_pixels_bounds():
    rng = np.random.default_rng(0)
    idx = sample_uniform_pixels(rng, 100, 4, 20, 30)
    assert idx.shape == (100, 3)
    assert idx[:, 0].max() < 4 and idx[:, 1].max() < 20 and idx[:, 2].max() < 30


def test_patch_pixels_contiguous():
    rng = np.random.default_rng(0)
    idx = sample_patch_pixels(rng, 2, 4, 3, 20, 30)
    assert idx.shape == (32, 3)
    first = idx[:16]
    assert (first[:, 0] == first[0, 0]).all()  # same image
    rows = first[:, 1].reshape(4, 4)
    assert (rows[1] - rows[0] == 1).all()  # contiguous patch


def test_scaled_patches_stride_centers():
    rng = np.random.default_rng(0)
    coords, origins = sample_scaled_patches(rng, 1, ray_patch_size=2, scale=3, num_images=1, height=30, width=30)
    assert coords.shape == (4, 3)
    # ray coords at centers of 3x3 blocks: offsets 1.5 and 4.5 from patch origin
    r0 = origins[0, 1]
    np.testing.assert_allclose(sorted(set(coords[:, 1])), [r0 + 1.5, r0 + 4.5])


def test_lidar_point_sampler_distribution():
    rng = np.random.default_rng(0)
    scans = np.array([100, 300])
    scan_idx, point_idx = sample_lidar_points(rng, 4000, scans)
    assert (point_idx[scan_idx == 0] < 100).all()
    assert (point_idx[scan_idx == 1] < 300).all()
    # roughly proportional to scan sizes
    frac = (scan_idx == 1).mean()
    assert 0.6 < frac < 0.9


def test_pair_pixels_adjacent():
    rng = np.random.default_rng(0)
    idx = sample_pair_pixels(rng, 10, 2, 20, 20, radius=2)
    assert idx.shape == (20, 3)
    d = np.abs(idx[0::2] - idx[1::2])
    assert (d[:, 1:] <= 2).all()
    assert (idx[0::2, 0] == idx[1::2, 0]).all()
