"""Native C++ host-path kernels: correctness vs the numpy fallback."""

import numpy as np

import neurad_tpu.native as native
from neurad_tpu.native import bin_points, extract_patches


def test_extract_patches_matches_numpy():
    rng = np.random.default_rng(0)
    for dtype in (np.uint8, np.float32):
        if dtype == np.uint8:
            images = rng.integers(0, 255, size=(5, 64, 96, 3), dtype=np.uint8)
        else:
            images = rng.uniform(size=(5, 64, 96, 3)).astype(np.float32)
        ci = rng.integers(0, 5, 8)
        r0 = rng.integers(0, 64 - 24, 8)
        c0 = rng.integers(0, 96 - 24, 8)
        out = extract_patches(images, ci, r0, c0, 24)
        scale = 1.0 / 255.0 if dtype == np.uint8 else 1.0
        ref = np.stack(
            [images[c_, r_:r_ + 24, cc_:cc_ + 24] for c_, r_, cc_ in zip(ci, r0, c0)]
        ).astype(np.float32) * scale
        np.testing.assert_allclose(out, ref)


def test_bin_points_matches_numpy():
    rng = np.random.default_rng(1)
    pts = (rng.normal(size=(20000, 3)) * 20).astype(np.float32)
    elevs = np.linspace(-25, 15, 64).astype(np.float32)
    occ_n, ch_n, ab_n = bin_points(pts, elevs, 0.5, 720)
    lib = native._LIB
    try:
        native._LIB = None  # force numpy path
        occ_f, ch_f, ab_f = bin_points(pts, elevs, 0.5, 720)
    finally:
        native._LIB = lib
    np.testing.assert_array_equal(ch_n, ch_f)
    # f32-vs-f64 atan2 can flip a boundary azimuth bin on a handful of points
    assert (ab_n != ab_f).mean() < 1e-3
    assert (occ_n != occ_f).mean() < 1e-3
