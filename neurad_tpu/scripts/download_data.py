"""nt-download-data: dataset acquisition + layout validation.

Counterpart of the reference's `ns-download-data` (`pyproject.toml:124-135`,
`nerfstudio/scripts/downloads/`). AD datasets (PandaSet, nuScenes, Argoverse2,
ZOD, KITTI-MOT, Waymo) all require license acceptance on their portals, so —
exactly like the reference — this tool downloads what it legally can, prints
acquisition instructions for the rest, and VALIDATES an existing download
against the expected on-disk layout the dataparsers consume.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

DATASETS = {
    "pandaset": {
        "url": "https://pandaset.org/ (free account; 'full dataset' download)",
        "layout": [
            "{root}/{seq}/camera/front_camera/00.jpg",
            "{root}/{seq}/camera/front_camera/poses.json",
            "{root}/{seq}/camera/front_camera/intrinsics.json",
            "{root}/{seq}/camera/front_camera/timestamps.json",
            "{root}/{seq}/lidar/00.pkl[.gz]",
            "{root}/{seq}/lidar/poses.json",
            "{root}/{seq}/annotations/cuboids/00.pkl[.gz]",
        ],
        "probe": ["camera/front_camera", "lidar", "annotations/cuboids"],
    },
    "nuscenes": {
        "url": "https://www.nuscenes.org/nuscenes (account; v1.0 full or mini)",
        "layout": [
            "{root}/v1.0-mini/*.json (scene, sample, sample_data, calibrated_sensor, ...)",
            "{root}/samples/CAM_FRONT/*.jpg",
            "{root}/samples/LIDAR_TOP/*.pcd.bin",
        ],
        "probe": ["v1.0-mini", "samples"],
    },
    "argoverse2": {
        "url": "https://www.argoverse.org/av2.html (s3 bucket, sensor dataset)",
        "layout": [
            "{root}/{log_id}/calibration/egovehicle_SE3_sensor.feather",
            "{root}/{log_id}/sensors/cameras/ring_front_center/*.jpg",
            "{root}/{log_id}/sensors/lidar/*.feather",
            "{root}/{log_id}/city_SE3_egovehicle.feather",
            "{root}/{log_id}/annotations.feather",
        ],
        "probe": ["calibration", "sensors"],
    },
    "zod": {
        "url": "https://zod.zenseact.com/ (account; sequences subset)",
        "layout": [
            "{root}/sequences/{seq}/camera_front_blur/*.jpg",
            "{root}/sequences/{seq}/lidar_velodyne/*.npy",
            "{root}/sequences/{seq}/calibration.json",
            "{root}/sequences/{seq}/annotations/object_detection/*.json",
        ],
        "probe": ["sequences"],
    },
    "kitti-mot": {
        "url": "https://www.cvlibs.net/datasets/kitti/eval_tracking.php (account)",
        "layout": [
            "{root}/training/image_02/{seq}/*.png",
            "{root}/training/velodyne/{seq}/*.bin",
            "{root}/training/calib/{seq}.txt",
            "{root}/training/label_02/{seq}.txt",
            "{root}/training/oxts/{seq}.txt",
        ],
        "probe": ["training"],
    },
    "waymo": {
        "url": "https://waymo.com/open/ (license; v2 parquet or v1 tfrecord)",
        "layout": ["{root}/*.tfrecord or {root}/{component}/*.parquet"],
        "probe": [],
    },
}


def validate(dataset: str, root: Path) -> bool:
    info = DATASETS[dataset]
    if not root.exists():
        print(f"[nt-download-data] {root} does not exist")
        return False
    missing = []
    for probe in info["probe"]:
        hits = list(root.glob(f"*/{probe}")) + list(root.glob(probe))
        if not hits:
            missing.append(probe)
    if missing:
        print(f"[nt-download-data] {dataset} at {root}: MISSING {missing}")
        print("expected layout:")
        for line in info["layout"]:
            print(f"  {line}")
        return False
    print(f"[nt-download-data] {dataset} at {root}: layout OK")
    return True


def entrypoint(argv=None):
    parser = argparse.ArgumentParser(description="Acquire / validate AD datasets")
    parser.add_argument("dataset", choices=sorted(DATASETS))
    parser.add_argument("--data", default=None, help="dataset root to validate (default data/<name>)")
    parser.add_argument("--instructions", action="store_true", help="print acquisition instructions only")
    args = parser.parse_args(argv)

    info = DATASETS[args.dataset]
    if args.instructions:
        print(f"{args.dataset}: {info['url']}")
        print("expected layout after download:")
        for line in info["layout"]:
            print(f"  {line}")
        return 0

    root = Path(args.data or f"data/{args.dataset}")
    ok = validate(args.dataset, root)
    if not ok:
        print(f"\nacquisition: {info['url']}")
        print("(AD datasets are license-gated; no direct download is possible — the")
        print(" reference's ns-download-data has the same constraint for these.)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(entrypoint())
