"""Synthetic on-disk dataset fixtures in real dataset layouts.

Generates a PandaSet-layout sequence (random-content images, synthetic lidar
scans, cuboid annotations) so the full disk -> parser -> datamanager -> device
pipeline can be exercised and benchmarked without the license-gated download
(`/root/reference/nerfstudio/scripts/datasets/` ships no equivalent; its
dataparser tests run against the real data). Used by
`benchmarks/host_pipeline.py` (host prefetch throughput proof) and
`tests/data/test_host_pipeline.py`, and handy as an install smoke test.

Layout written (matching `data/dataparsers/pandaset.py` expectations):
  <root>/<seq>/camera/<cam>_camera/{NN.jpg, poses.json, intrinsics.json, timestamps.json}
  <root>/<seq>/lidar/{NN.pkl.gz, poses.json, timestamps.json}
  <root>/<seq>/annotations/cuboids/{NN.pkl.gz}
"""

from __future__ import annotations

import json
import zlib
from pathlib import Path
from typing import Sequence


def make_pandaset_fixture(
    root: str,
    seq: str = "001",
    n_frames: int = 80,
    cameras: Sequence[str] = ("front",),
    height: int = 1080,
    width: int = 1920,
    points_per_scan: int = 100_000,
    n_actors: int = 8,
    seed: int = 0,
) -> Path:
    """Write a synthetic PandaSet-layout sequence; returns the dataset root.

    Images are smooth gradients + low-amplitude noise (jpg-compressible, so an
    80-frame 1080p sequence stays ~100 MB); scans are gaussian blobs around the
    ego path at realistic point counts.
    """
    import imageio.v2 as imageio
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    root_p = Path(root)
    seq_dir = root_p / seq
    t0 = 1_600_000_000.0
    times = [t0 + 0.1 * i for i in range(n_frames)]
    poses = [
        {
            "position": {"x": 2.0 * i, "y": 0.0, "z": 1.5},
            "heading": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0},
        }
        for i in range(n_frames)
    ]

    # smooth base image reused with per-frame shifts: fast to generate, and jpg
    # compresses it well while still exercising full decode cost at load time
    yy, xx = np.meshgrid(np.linspace(0, 1, height), np.linspace(0, 1, width), indexing="ij")
    base = np.stack([yy, xx, 0.5 * (xx + yy)], axis=-1)

    for cam in cameras:
        cam_dir = seq_dir / "camera" / f"{cam}_camera"
        cam_dir.mkdir(parents=True, exist_ok=True)
        (cam_dir / "poses.json").write_text(json.dumps(poses))
        (cam_dir / "intrinsics.json").write_text(
            json.dumps({"fx": 0.8 * width, "fy": 0.8 * width, "cx": width / 2, "cy": height / 2})
        )
        (cam_dir / "timestamps.json").write_text(json.dumps(times))
        for i in range(n_frames):
            # zlib.crc32, not hash(): PYTHONHASHSEED randomizes str hash per
            # process, which would make fixture content irreproducible across
            # runs (a benchmark reusing --keep vs regenerating differs)
            img = base * (0.6 + 0.4 * np.sin(0.3 * i + zlib.crc32(cam.encode()) % 7))
            img = img + rng.uniform(0, 0.08, size=(height, width, 1))
            imageio.imwrite(cam_dir / f"{i:02d}.jpg", (np.clip(img, 0, 1) * 255).astype(np.uint8))

    lid_dir = seq_dir / "lidar"
    lid_dir.mkdir(parents=True, exist_ok=True)
    (lid_dir / "poses.json").write_text(json.dumps(poses))
    (lid_dir / "timestamps.json").write_text(json.dumps(times))
    for i in range(n_frames):
        n = points_per_scan
        world = rng.normal(size=(n, 3)) * np.array([30.0, 12.0, 2.0]) + np.array([2.0 * i, 0.0, 1.5])
        df = pd.DataFrame(
            {
                "x": world[:, 0],
                "y": world[:, 1],
                "z": world[:, 2],
                "i": rng.integers(0, 255, n).astype(np.float64),
                "t": t0 + 0.1 * i + rng.uniform(-0.04, 0.04, n),
                "d": np.zeros(n),
            }
        )
        df.to_pickle(lid_dir / f"{i:02d}.pkl.gz")

    cub_dir = seq_dir / "annotations" / "cuboids"
    cub_dir.mkdir(parents=True, exist_ok=True)
    labels = ["Car", "Pedestrian", "Pickup Truck", "Bicycle"]
    for i in range(n_frames):
        rows = {
            "uuid": [f"actor-{a}" for a in range(n_actors)],
            "label": [labels[a % len(labels)] for a in range(n_actors)],
            "yaw": [0.05 * i * ((a % 3) - 1) for a in range(n_actors)],
            "stationary": [False] * n_actors,
            "position.x": [2.0 * i + 8.0 + 3.0 * a for a in range(n_actors)],
            "position.y": [(-1) ** a * (2.0 + a) for a in range(n_actors)],
            "position.z": [1.0] * n_actors,
            "dimensions.x": [2.0] * n_actors,
            "dimensions.y": [4.5] * n_actors,
            "dimensions.z": [1.6] * n_actors,
            "cuboids.sensor_id": [-1] * n_actors,
            "cuboids.sibling_id": [None] * n_actors,
        }
        pd.DataFrame(rows).to_pickle(cub_dir / f"{i:02d}.pkl.gz")

    return root_p
