"""nuScenes parser test against fabricated raw JSON tables."""

import json

import numpy as np
import pytest

from neurad_tpu.data.dataparsers.nuscenes import NuScenesDataParserConfig

N = 4


@pytest.fixture(scope="module")
def fake_nuscenes(tmp_path_factory):
    root = tmp_path_factory.mktemp("nuscenes")
    tdir = root / "v1.0-mini"
    tdir.mkdir()
    t0 = 1_500_000_000_000_000  # microseconds

    scene = [{"token": "sc0", "name": "scene-0001", "first_sample_token": "s0",
              "last_sample_token": f"s{N-1}", "nbr_samples": N, "log_token": "l0", "description": ""}]
    samples, sample_data, ego_poses = [], [], []
    for i in range(N):
        samples.append({"token": f"s{i}", "timestamp": t0 + i * 500_000, "scene_token": "sc0",
                        "prev": f"s{i-1}" if i else "", "next": f"s{i+1}" if i < N - 1 else ""})
        ego_poses.append({"token": f"ep_cam{i}", "translation": [2.0 * i, 0.0, 0.0],
                          "rotation": [1.0, 0.0, 0.0, 0.0], "timestamp": t0 + i * 500_000})
        ego_poses.append({"token": f"ep_lid{i}", "translation": [2.0 * i, 0.0, 0.0],
                          "rotation": [1.0, 0.0, 0.0, 0.0], "timestamp": t0 + i * 500_000})
        sample_data.append({"token": f"sd_cam{i}", "sample_token": f"s{i}", "ego_pose_token": f"ep_cam{i}",
                            "calibrated_sensor_token": "cs_cam", "timestamp": t0 + i * 500_000,
                            "fileformat": "jpg", "is_key_frame": True, "height": 24, "width": 32,
                            "filename": f"samples/CAM_FRONT/{i}.jpg", "prev": "", "next": ""})
        sample_data.append({"token": f"sd_lid{i}", "sample_token": f"s{i}", "ego_pose_token": f"ep_lid{i}",
                            "calibrated_sensor_token": "cs_lid", "timestamp": t0 + i * 500_000,
                            "fileformat": "pcd", "is_key_frame": True, "height": 0, "width": 0,
                            "filename": f"samples/LIDAR_TOP/{i}.pcd.bin", "prev": "", "next": ""})

    calibrated = [
        {"token": "cs_cam", "sensor_token": "sens_cam", "translation": [1.5, 0.0, 1.5],
         "rotation": [0.5, -0.5, 0.5, -0.5], "camera_intrinsic": [[100.0, 0, 16.0], [0, 100.0, 12.0], [0, 0, 1]]},
        {"token": "cs_lid", "sensor_token": "sens_lid", "translation": [0.9, 0.0, 1.8],
         "rotation": [1.0, 0.0, 0.0, 0.0], "camera_intrinsic": []},
    ]
    sensors = [{"token": "sens_cam", "channel": "CAM_FRONT", "modality": "camera"},
               {"token": "sens_lid", "channel": "LIDAR_TOP", "modality": "lidar"}]
    categories = [{"token": "cat_car", "name": "vehicle.car", "description": ""},
                  {"token": "cat_ped", "name": "human.pedestrian.adult", "description": ""}]
    instances = [{"token": "inst0", "category_token": "cat_car", "nbr_annotations": N,
                  "first_annotation_token": "a0", "last_annotation_token": f"a{N-1}"}]
    annotations = []
    for i in range(N):
        annotations.append({"token": f"a{i}", "sample_token": f"s{i}", "instance_token": "inst0",
                            "translation": [10.0 + i, 2.0, 1.0], "size": [2.0, 4.5, 1.6],
                            "rotation": [1.0, 0.0, 0.0, 0.0], "prev": "", "next": "",
                            "visibility_token": "4", "attribute_tokens": [], "num_lidar_pts": 50,
                            "num_radar_pts": 0})

    for name, rows in [("scene", scene), ("sample", samples), ("sample_data", sample_data),
                       ("ego_pose", ego_poses), ("calibrated_sensor", calibrated), ("sensor", sensors),
                       ("instance", instances), ("sample_annotation", annotations), ("category", categories)]:
        (tdir / f"{name}.json").write_text(json.dumps(rows))

    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    (root / "samples" / "CAM_FRONT").mkdir(parents=True)
    (root / "samples" / "LIDAR_TOP").mkdir(parents=True)
    for i in range(N):
        imageio.imwrite(root / "samples" / "CAM_FRONT" / f"{i}.jpg",
                        rng.integers(0, 255, (24, 32, 3), dtype=np.uint8))
        pts = rng.normal(size=(200, 3)).astype(np.float32) * 10
        raw = np.concatenate([pts, rng.uniform(0, 255, (200, 1)).astype(np.float32),
                              rng.integers(0, 32, (200, 1)).astype(np.float32)], axis=-1)
        raw.tofile(root / "samples" / "LIDAR_TOP" / f"{i}.pcd.bin")

    return root


def test_nuscenes_parser(fake_nuscenes):
    cfg = NuScenesDataParserConfig(data=str(fake_nuscenes), sequence="scene-0001", train_split_fraction=0.5)
    out = cfg.setup().get_dataparser_outputs("train")
    assert len(out.images) == N
    assert len(out.point_clouds) == N
    assert out.point_clouds[0].shape[1] == 5
    assert out.point_clouds[0][:, 3].max() <= 1.0  # intensity normalized
    assert out.duration > 0
    # one moving car actor; timestamps zero-based
    assert len(out.trajectories) == 1
    assert out.trajectories[0]["label"] == "vehicle.car"
    assert float(np.asarray(out.trajectories[0]["timestamps"]).min()) >= 0.0
    # camera looks along the driving direction, which the world-recentering maps
    # to +y (`ad_dataparser.py:613-635`: mean pose y-axis = mean direction)
    c2w = np.asarray(out.cameras.camera_to_worlds[0])
    fwd = -c2w[:3, 2]
    assert fwd[1] > 0.9
