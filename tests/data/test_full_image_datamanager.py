"""Full-image/lidar datamanager tests (SplatAD data path)."""

import numpy as np

from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
from neurad_tpu.data.full_image_datamanager import (
    CameraSample,
    FullImageLidarDataManager,
    FullImageLidarDataManagerConfig,
    LidarSample,
    scan_to_raster_pts,
)


def test_scan_to_raster_pts_spherical():
    pts = np.array([
        [10.0, 0.0, 0.0, 0.5, 0.01],   # straight ahead
        [0.0, 5.0, 0.0, 0.3, 0.02],    # left
        [3.0, 0.0, 3.0, 0.2, 0.0],     # up 45deg
        [2e3, 0.0, 0.0, 0.0, 0.0],     # missing-point dummy
    ], dtype=np.float32)
    raster, did_return, valid = scan_to_raster_pts(pts, max_points=8)
    assert raster.shape == (8, 5)
    np.testing.assert_allclose(raster[0, :3], [0.0, 0.0, 10.0], atol=1e-4)
    np.testing.assert_allclose(raster[1, 0], 90.0, atol=1e-4)
    np.testing.assert_allclose(raster[2, 1], 45.0, atol=1e-3)
    assert did_return[:3].all() and not did_return[3]
    assert valid[:4].all() and not valid[4:].any()
    np.testing.assert_allclose(raster[0, 4], 0.5)  # intensity carried


def test_datamanager_samples_both_modalities():
    outputs = SyntheticDataParserConfig(num_frames=4, image_height=24, image_width=36,
                                        lidar_channels=8, lidar_azimuths=60).setup().get_dataparser_outputs()
    dm = FullImageLidarDataManager(outputs, FullImageLidarDataManagerConfig(max_lidar_points=256), seed=0)
    kinds = set()
    for _ in range(20):
        s = dm.next_train()
        kinds.add(type(s).__name__)
        if isinstance(s, CameraSample):
            assert s.image.shape[2] == 3 and 0 <= s.image.max() <= 1.0
        else:
            assert s.raster_pts.shape == (256, 5)
            assert s.valid.any()
    assert kinds == {"CameraSample", "LidarSample"}


def test_seed_points_world_frame():
    outputs = SyntheticDataParserConfig(num_frames=4, image_height=24, image_width=36,
                                        lidar_channels=8, lidar_azimuths=60).setup().get_dataparser_outputs()
    dm = FullImageLidarDataManager(outputs, FullImageLidarDataManagerConfig(max_lidar_points=256))
    pts = dm.all_seed_points()
    # [N, 8]: xyz, intensity, painted rgb, time
    assert pts.shape[1] == 8
    assert pts.shape[0] > 200
    # all within scene bounds-ish
    assert np.abs(pts[:, :3]).max() < 200
    # painting: rgb in [0,1]; at least some points got real camera colors
    assert 0.0 <= pts[:, 4:7].min() and pts[:, 4:7].max() <= 1.0
    # times span the sequence
    assert pts[:, 7].max() > pts[:, 7].min()
