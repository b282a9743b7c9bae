"""PandaSet parser test against a fabricated raw-layout mini sequence."""

import gzip
import json
import pickle

import numpy as np
import pandas as pd
import pytest

import neurad_tpu.data.dataparsers.pandaset as ps
from neurad_tpu.data.dataparsers.pandaset import PandaSetDataParserConfig

N_FRAMES = 4


@pytest.fixture(scope="module")
def fake_pandaset(tmp_path_factory):
    root = tmp_path_factory.mktemp("pandaset")
    seq = root / "001"
    t0 = 1_600_000_000.0

    # camera
    cam_dir = seq / "camera" / "front_camera"
    cam_dir.mkdir(parents=True)
    poses = []
    for i in range(N_FRAMES):
        poses.append(
            {"position": {"x": 2.0 * i, "y": 0.0, "z": 1.5}, "heading": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0}}
        )
    (cam_dir / "poses.json").write_text(json.dumps(poses))
    (cam_dir / "intrinsics.json").write_text(json.dumps({"fx": 100.0, "fy": 100.0, "cx": 16.0, "cy": 12.0}))
    (cam_dir / "timestamps.json").write_text(json.dumps([t0 + 0.1 * i for i in range(N_FRAMES)]))
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    for i in range(N_FRAMES):
        imageio.imwrite(cam_dir / f"{i:02d}.jpg", rng.integers(0, 255, (24, 32, 3), dtype=np.uint8))

    # lidar
    lid_dir = seq / "lidar"
    lid_dir.mkdir(parents=True)
    (lid_dir / "poses.json").write_text(json.dumps(poses))
    (lid_dir / "timestamps.json").write_text(json.dumps([t0 + 0.1 * i for i in range(N_FRAMES)]))
    for i in range(N_FRAMES):
        n = 200
        world_pts = rng.normal(size=(n, 3)) * 10 + np.array([2.0 * i, 0, 1.5])
        df = pd.DataFrame(
            {
                "x": world_pts[:, 0],
                "y": world_pts[:, 1],
                "z": world_pts[:, 2],
                "i": rng.integers(0, 255, n).astype(np.float64),
                "t": t0 + 0.1 * i + rng.uniform(-0.04, 0.04, n),
                "d": np.zeros(n),
            }
        )
        df.to_pickle(lid_dir / f"{i:02d}.pkl.gz")

    # cuboids
    cub_dir = seq / "annotations" / "cuboids"
    cub_dir.mkdir(parents=True)
    for i in range(N_FRAMES):
        df = pd.DataFrame(
            {
                "uuid": ["actor-1", "actor-2"],
                "label": ["Car", "Pedestrian"],
                "yaw": [0.1 * i, 0.0],
                "stationary": [False, False],
                "position.x": [5.0 + i, -3.0],
                "position.y": [2.0, 1.0],
                "position.z": [1.0, 1.0],
                "dimensions.x": [2.0, 0.8],
                "dimensions.y": [4.5, 0.8],
                "dimensions.z": [1.6, 1.8],
                "cuboids.sensor_id": [-1, -1],
                "cuboids.sibling_id": [None, None],
            }
        )
        df.to_pickle(cub_dir / f"{i:02d}.pkl.gz")

    return root


def test_pandaset_parser_full_pipeline(fake_pandaset, monkeypatch):
    monkeypatch.setattr(ps, "PANDASET_SEQ_LEN", N_FRAMES)
    cfg = PandaSetDataParserConfig(data=str(fake_pandaset), sequence="001", train_split_fraction=0.5)
    out = cfg.setup().get_dataparser_outputs("train")

    assert len(out.images) == N_FRAMES
    assert out.images[0].dtype == np.uint8
    assert len(out.point_clouds) == N_FRAMES
    # missing-point synthesis (default ON) inserts DUMMY_DISTANCE returns
    pc = out.point_clouds[0]
    dist = np.linalg.norm(pc[:, :3], axis=-1)
    assert (dist > 1000).any(), "expected synthetic missing points at DUMMY_DISTANCE"
    real = pc[dist < 1000]
    # real points moved to sensor frame: mean near origin (ego removal cuts some)
    assert np.abs(np.mean(real[:, :3], axis=0)).max() < 10
    # intensity normalized
    assert out.point_clouds[0][:, 3].max() <= 1.0
    # times zero-based
    assert float(out.cameras.times.min()) >= 0.0
    assert out.duration > 0
    # actors: car + pedestrian (deformable)
    assert len(out.trajectories) == 2
    labels = {t["label"] for t in out.trajectories}
    assert labels == {"Car", "Pedestrian"}
    ped = next(t for t in out.trajectories if t["label"] == "Pedestrian")
    assert ped["deformable"] and not ped["symmetric"]
    # train/eval split is disjoint
    train = set(out.metadata["train_camera_indices"])
    ev = set(out.eval_camera_indices)
    assert train and ev and not (train & ev)
    # rolling shutter metadata attached
    assert "rolling_shutter_time" in out.cameras.metadata


def test_pandaset_with_datamanager(fake_pandaset, monkeypatch):
    monkeypatch.setattr(ps, "PANDASET_SEQ_LEN", N_FRAMES)
    from neurad_tpu.data.datamanager import ADDataManager, ADDataManagerConfig

    cfg = PandaSetDataParserConfig(data=str(fake_pandaset), sequence="001")
    out = cfg.setup().get_dataparser_outputs("train")
    dm = ADDataManager(out, ADDataManagerConfig(num_cam_patches=2, patch_size=2, num_lidar_rays=16))
    bundle, batch = dm.next_train()
    assert bundle.origins.shape[0] == 2 * 4 + 16
    assert batch["image"].dtype == np.float32 or str(batch["image"].dtype) == "float32"
    assert float(batch["image"].max()) <= 1.0
