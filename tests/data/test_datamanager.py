"""Datamanager tests: batch shapes, modality layout, synthetic parser sanity."""

import numpy as np
import jax.numpy as jnp

from neurad_tpu.data.datamanager import ADDataManager, ADDataManagerConfig
from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig


def _outputs():
    return SyntheticDataParserConfig(num_frames=4, image_height=24, image_width=36).setup().get_dataparser_outputs()


def test_synthetic_parser_contract():
    out = _outputs()
    assert len(out.images) == 4
    assert out.images[0].shape == (24, 36, 3)
    assert len(out.point_clouds) == 4
    assert out.point_clouds[0].shape[1] == 5
    assert out.point_clouds[0].shape[0] > 100  # ground + objects return points
    assert len(out.trajectories) == 1
    assert len(out.eval_camera_indices) >= 1


def test_batch_shapes_static():
    out = _outputs()
    cfg = ADDataManagerConfig(num_cam_patches=3, patch_size=4, num_lidar_rays=32)
    dm = ADDataManager(out, cfg)
    for _ in range(3):
        bundle, batch = dm.next_train()
        n_cam = 3 * 16
        assert bundle.origins.shape == (n_cam + 32, 3)
        assert batch["image"].shape == (3, 12, 12, 3)
        assert batch["distance"].shape == (32, 1)
        assert batch["intensity"].shape == (32, 1)
        # camera rays first, not lidar; lidar rays flagged
        assert not bool(bundle.metadata["is_lidar"][:n_cam].any())
        assert bool(bundle.metadata["is_lidar"][n_cam:].all())


def test_eval_bundles():
    out = _outputs()
    dm = ADDataManager(out, ADDataManagerConfig(num_cam_patches=2, patch_size=4, num_lidar_rays=16))
    bundle, gt, (hs, ws) = dm.eval_camera_bundle(3)
    assert bundle.origins.shape[0] == hs * ws
    assert gt.shape == (hs * 3, ws * 3, 3)
    lbundle, pts = dm.eval_lidar_bundle(3)
    assert lbundle.origins.shape[0] == pts.shape[0]


def test_eval_cameras_excluded_from_train():
    out = _outputs()
    dm = ADDataManager(out, ADDataManagerConfig(num_cam_patches=8, patch_size=2, num_lidar_rays=4))
    eval_set = set(out.eval_camera_indices)
    for _ in range(5):
        bundle, _ = dm.next_train()
        cams = set(np.asarray(bundle.camera_indices[: 8 * 4, 0]).tolist())
        assert not (cams & eval_set)


def test_measured_elevation_tables():
    """Measured per-sensor beam tables (hardware calibration constants,
    `lidar_elevation_mappings.py`): spot-check values + channel assignment."""
    import numpy as np

    from neurad_tpu.data.lidar_elevation_mappings import (
        ELEVATION_MAPPINGS,
        PANDAR64_ELEVATIONS,
        WOD64_ELEVATIONS,
        assign_channels,
    )

    assert len(PANDAR64_ELEVATIONS) == 64
    assert abs(float(PANDAR64_ELEVATIONS[0]) - 14.882) < 1e-4
    assert abs(float(PANDAR64_ELEVATIONS[17]) - 0.0) < 1e-6
    assert len(WOD64_ELEVATIONS) == 64
    assert len(ELEVATION_MAPPINGS["VELODYNE128"]) == 128
    assert len(ELEVATION_MAPPINGS["ARGOVERSE2_VLP32C"]) == 32

    # a point at exactly channel 5's elevation maps to channel 5
    elev = np.deg2rad(float(PANDAR64_ELEVATIONS[5]))
    pt = np.array([[10 * np.cos(elev), 0.0, 10 * np.sin(elev)]])
    assert assign_channels(pt, PANDAR64_ELEVATIONS)[0] == 5
