"""nt-render: render eval sensors / camera paths / actor edits from a checkpoint.

TPU-native counterpart of `nerfstudio/scripts/render.py` (dataset rendering
415-861, AD actor-edit extras 729-791, lidar point-cloud outputs 1190+).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _save_image(path: Path, img: np.ndarray):
    import imageio.v2 as imageio

    imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))


def entrypoint(argv=None):
    parser = argparse.ArgumentParser(description="Render a trained neurad_tpu run")
    parser.add_argument("run_dir")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--cameras", default="eval", choices=["eval", "train", "all"])
    parser.add_argument("--lidar", action="store_true", help="also render lidar point clouds (.npz)")
    parser.add_argument("--shift", type=float, default=0.0, help="lateral ray-origin shift in meters (FID-style lane shift)")
    parser.add_argument("--interpolate", type=int, default=0,
                        help="render an interpolated path with N steps between consecutive train cameras")
    args = parser.parse_args(argv)

    from neurad_tpu.scripts.eval import load_run

    pipeline, state, step = load_run(args.run_dir)
    out_dir = Path(args.output_dir or (Path(args.run_dir) / "renders"))
    out_dir.mkdir(parents=True, exist_ok=True)

    outputs = pipeline.outputs
    if args.cameras == "eval":
        cam_indices = list(outputs.eval_camera_indices)
    elif args.cameras == "train":
        ev = set(outputs.eval_camera_indices)
        cam_indices = [i for i in range(len(outputs.images)) if i not in ev]
    else:
        cam_indices = list(range(len(outputs.images)))

    import jax.numpy as jnp

    for ci in cam_indices:
        if args.shift != 0.0:
            # shift the camera origin laterally (lane-shift render, `render.py:749-791`)
            cams = outputs.cameras
            c2w = np.asarray(cams.camera_to_worlds)
            right = c2w[ci, :3, 0]
            c2w = c2w.copy()
            c2w[ci, :3, 3] += right * args.shift
            pipeline.outputs.cameras = cams.replace(camera_to_worlds=jnp.asarray(c2w))
        pred, gt = pipeline.render_eval_camera(state, ci)
        _save_image(out_dir / f"camera_{ci:04d}.png", pred)
        _save_image(out_dir / f"camera_{ci:04d}_gt.png", gt)

    if args.interpolate > 0:
        # smooth interpolated camera path (`render.py:415-550` interpolated mode)
        from neurad_tpu.cameras.camera_utils import get_interpolated_poses

        cams = outputs.cameras
        c2w = np.asarray(cams.camera_to_worlds)
        frame = 0
        for a, b in zip(cam_indices[:-1], cam_indices[1:]):
            path = get_interpolated_poses(c2w[a], c2w[b], steps=args.interpolate)
            for pose in path:
                patched = c2w.copy()
                patched[a] = pose
                pipeline.outputs.cameras = cams.replace(camera_to_worlds=jnp.asarray(patched))
                pipeline.datamanager.outputs.cameras = pipeline.outputs.cameras
                pred, _ = pipeline.render_eval_camera(state, a)
                _save_image(out_dir / f"path_{frame:05d}.png", pred)
                frame += 1
        print(f"[nt-render] wrote {frame} path frames")

    if args.lidar:
        for si in outputs.eval_lidar_indices:
            out = pipeline.render_eval_lidar(state, si)
            np.savez(out_dir / f"lidar_{si:04d}.npz", **out)

    print(f"[nt-render] wrote {len(cam_indices)} camera renders to {out_dir} (ckpt step {step})")


if __name__ == "__main__":
    entrypoint()
