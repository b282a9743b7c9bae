"""KITTI-MOT + Argoverse2 parser tests against fabricated raw layouts."""

import numpy as np
import pandas as pd
import pytest

from neurad_tpu.data.dataparsers.argoverse2 import Argoverse2DataParserConfig
from neurad_tpu.data.dataparsers.kitti import KittiMotDataParserConfig

N = 4


@pytest.fixture(scope="module")
def fake_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    seq = "0000"
    t = root / "training"
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    (t / "image_02" / seq).mkdir(parents=True)
    (t / "velodyne" / seq).mkdir(parents=True)
    (t / "label_02").mkdir(parents=True)
    (t / "oxts").mkdir(parents=True)
    (t / "calib").mkdir(parents=True)
    for i in range(N):
        imageio.imwrite(t / "image_02" / seq / f"{i:06d}.png",
                        rng.integers(0, 255, (24, 32, 3), dtype=np.uint8))
        raw = np.concatenate(
            [rng.normal(size=(150, 3)).astype(np.float32) * 10,
             rng.uniform(0, 1, (150, 1)).astype(np.float32)], axis=-1)
        raw.tofile(t / "velodyne" / seq / f"{i:06d}.bin")
    # oxts: lat lon alt roll pitch yaw + 24 zeros; driving north-ish
    rows = []
    for i in range(N):
        rows.append([49.0 + i * 2e-6, 8.43, 110.0, 0.0, 0.0, 0.0] + [0.0] * 24)
    np.savetxt(t / "oxts" / f"{seq}.txt", np.asarray(rows))
    calib = [
        "P0: " + " ".join(map(str, np.eye(3, 4).reshape(-1))),
        "P1: " + " ".join(map(str, np.eye(3, 4).reshape(-1))),
        "P2: " + " ".join(map(str, [100.0, 0, 16.0, 0, 0, 100.0, 12.0, 0, 0, 0, 1.0, 0])),
        "P3: " + " ".join(map(str, np.eye(3, 4).reshape(-1))),
        "R_rect " + " ".join(map(str, np.eye(3).reshape(-1))),
        "Tr_velo_cam " + " ".join(map(str, np.array(
            [[0, -1, 0, 0], [0, 0, -1, -0.08], [1, 0, 0, -0.27]]).reshape(-1))),
        "Tr_imu_velo " + " ".join(map(str, np.eye(3, 4).reshape(-1))),
    ]
    (t / "calib" / f"{seq}.txt").write_text("\n".join(calib))
    labels = []
    for i in range(N):
        labels.append(f"{i} 1 Car 0 0 0.0 0 0 10 10 1.6 1.8 4.2 {1.0 + i} 1.0 {8.0 + i} 0.1")
    (t / "label_02" / f"{seq}.txt").write_text("\n".join(labels))
    return root


def test_kitti_parser(fake_kitti):
    cfg = KittiMotDataParserConfig(data=str(fake_kitti), sequence="0000", train_split_fraction=0.5,
                                   min_lidar_dist=(0.5, 0.5, 0.5))
    out = cfg.setup().get_dataparser_outputs("train")
    assert len(out.images) == N and len(out.point_clouds) == N
    assert out.point_clouds[0].shape[1] == 5
    assert len(out.trajectories) == 1
    traj = out.trajectories[0]
    assert traj["label"] == "Car"
    # dims in wlh order
    np.testing.assert_allclose(np.asarray(traj["dims"]), [1.8, 4.2, 1.6], atol=1e-5)
    # actor box z-up: rotation column 2 should be world-up after axis swap
    up = np.asarray(traj["poses"])[0][:3, :3][:, 2]
    assert abs(up[2]) > 0.9


@pytest.fixture(scope="module")
def fake_argoverse(tmp_path_factory):
    root = tmp_path_factory.mktemp("av2")
    log = root / "log-abc"
    (log / "calibration").mkdir(parents=True)
    (log / "sensors" / "cameras" / "ring_front_center").mkdir(parents=True)
    (log / "sensors" / "lidar").mkdir(parents=True)
    t0 = 1_000_000_000_000_000_000

    ego_rows = []
    for i in range(N):
        ego_rows.append({"timestamp_ns": t0 + i * 100_000_000, "qw": 1.0, "qx": 0.0, "qy": 0.0,
                         "qz": 0.0, "tx_m": 2.0 * i, "ty_m": 0.0, "tz_m": 0.0})
    pd.DataFrame(ego_rows).to_feather(log / "city_SE3_egovehicle.feather")

    pd.DataFrame([
        {"sensor_name": "ring_front_center", "qw": 0.5, "qx": -0.5, "qy": 0.5, "qz": -0.5,
         "tx_m": 1.6, "ty_m": 0.0, "tz_m": 1.4},
    ]).to_feather(log / "calibration" / "egovehicle_SE3_sensor.feather")
    pd.DataFrame([
        {"sensor_name": "ring_front_center", "fx_px": 100.0, "fy_px": 100.0, "cx_px": 16.0,
         "cy_px": 12.0, "width_px": 32, "height_px": 24, "k1": 0.0, "k2": 0.0, "k3": 0.0},
    ]).to_feather(log / "calibration" / "intrinsics.feather")

    import imageio.v2 as imageio

    rng = np.random.default_rng(1)
    for i in range(N):
        t_ns = t0 + i * 100_000_000
        imageio.imwrite(log / "sensors" / "cameras" / "ring_front_center" / f"{t_ns}.jpg",
                        rng.integers(0, 255, (24, 32, 3), dtype=np.uint8))
        pd.DataFrame({
            "x": rng.normal(size=160).astype(np.float32) * 10,
            "y": rng.normal(size=160).astype(np.float32) * 10,
            "z": rng.normal(size=160).astype(np.float32) * 3,
            "intensity": rng.uniform(0, 255, 160).astype(np.float32),
            "laser_number": rng.integers(0, 32, 160).astype(np.uint8),
            "offset_ns": rng.integers(0, 100_000_000, 160).astype(np.int64),
        }).to_feather(log / "sensors" / "lidar" / f"{t_ns}.feather")

    ann_rows = []
    for i in range(N):
        ann_rows.append({"timestamp_ns": t0 + i * 100_000_000, "track_uuid": "actor-1",
                         "category": "REGULAR_VEHICLE", "length_m": 4.5, "width_m": 2.0,
                         "height_m": 1.6, "qw": 1.0, "qx": 0.0, "qy": 0.0, "qz": 0.0,
                         "tx_m": 10.0 + i, "ty_m": 2.0, "tz_m": 0.8, "num_interior_pts": 50})
    pd.DataFrame(ann_rows).to_feather(log / "annotations.feather")
    return root


def test_argoverse2_parser(fake_argoverse):
    cfg = Argoverse2DataParserConfig(data=str(fake_argoverse), sequence="log-abc",
                                     train_split_fraction=0.5)
    out = cfg.setup().get_dataparser_outputs("train")
    assert len(out.images) == N and len(out.point_clouds) == N
    assert out.point_clouds[0].shape[1] == 5
    assert out.point_clouds[0][:, 3].max() <= 1.0
    assert len(out.trajectories) == 1
    assert out.trajectories[0]["label"] == "REGULAR_VEHICLE"
    np.testing.assert_allclose(np.asarray(out.trajectories[0]["dims"]), [2.0, 4.5, 1.6], atol=1e-5)
