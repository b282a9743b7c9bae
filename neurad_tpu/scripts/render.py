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




def modify_actors(pipeline, state, shift=None, removal_time=None, stop_time=None, indices=None):
    """Actor trajectory edits for renders (`render.py:729-747` modify_actors):
    shift positions, remove actors after a time, or freeze them at a time.
    Returns the updated TrainState (and rebuilds the model for removals, since
    presence masks are static module data)."""
    import dataclasses as _dc

    import jax.numpy as jnp
    import numpy as np

    if not hasattr(pipeline.model, "actor_data"):
        raise SystemExit("actor edits need a dynamic-actor model (neurad/splatad), not splatfacto")
    ad = pipeline.model.actor_data
    if ad.n_actors == 0:
        return state
    idx = np.asarray(indices if indices is not None else np.arange(ad.n_actors), dtype=np.int64)

    p = {k: v for k, v in state.params["params"].items()}
    actors = dict(p["actors"])
    pos = np.asarray(actors["actor_positions"]).copy()
    rot = np.asarray(actors["actor_rotations_6d"]).copy()
    if shift is not None:
        pos[:, idx, :] += np.asarray(shift, dtype=np.float32)
    if stop_time is not None:
        ts = np.asarray(ad.unique_timestamps)
        si = int(np.searchsorted(ts, stop_time))
        si = min(si, pos.shape[0] - 1)
        pos[si:, idx] = pos[si, idx][None]
        rot[si:, idx] = rot[si, idx][None]
    actors["actor_positions"] = jnp.asarray(pos)
    actors["actor_rotations_6d"] = jnp.asarray(rot)
    p["actors"] = actors
    state = state.replace(params={**state.params, "params": p})

    if removal_time is not None:
        present = np.asarray(ad.present).copy()
        mask = np.asarray(ad.unique_timestamps) > removal_time
        present[np.ix_(mask, idx)] = False
        new_ad = _dc.replace(ad, present=present)
        pipeline.model = _dc.replace(pipeline.model, actor_data=new_ad)
        # drop cached jitted eval fns tied to the old module
        for attr in ("_nff_applies",):
            if hasattr(pipeline, attr):
                delattr(pipeline, attr)
    return state


def load_camera_path(path):
    """Minimal nerfstudio camera-path JSON reader (`render.py:73-170`): returns
    (list of 3x4 c2w, fov_deg or None, times or None)."""
    import numpy as np

    data = json.loads(Path(path).read_text())
    poses, times = [], []
    for frame in data.get("camera_path", []):
        c2w = np.asarray(frame["camera_to_world"], dtype=np.float32).reshape(4, 4)[:3]
        poses.append(c2w)
        if "render_time" in frame:
            times.append(float(frame["render_time"]))
    fov_deg = float(data.get("fov", 0)) or None
    return poses, fov_deg, (times if times else None)


def render_pose(pipeline, state, pose_c2w, base_cam_idx, time=None):
    """Render an arbitrary pose using base_cam_idx's intrinsics."""
    import jax.numpy as jnp
    import numpy as np

    cams = pipeline.outputs.cameras
    c2w = np.asarray(cams.camera_to_worlds).copy()
    c2w[base_cam_idx] = np.asarray(pose_c2w, dtype=np.float32)
    patched = cams.replace(camera_to_worlds=jnp.asarray(c2w))
    if time is not None and cams.times is not None:
        t = np.asarray(cams.times).copy()
        t[base_cam_idx] = time
        patched = patched.replace(times=jnp.asarray(t))
    pipeline.outputs.cameras = patched
    pipeline.datamanager.outputs.cameras = patched
    pred, _ = pipeline.render_eval_camera(state, base_cam_idx)
    return pred


def save_lidar_bev(path, pts, intensity=None, extent=60.0, px=800):
    """Top-down (BEV) lidar point-cloud plot (`render.py:1190+` point-cloud
    outputs): numpy rasterization, no plotting deps needed on the hot path."""
    import numpy as np

    img = np.zeros((px, px, 3), dtype=np.float32)
    x, y = pts[:, 0], pts[:, 1]
    keep = (np.abs(x) < extent) & (np.abs(y) < extent)
    xi = ((x[keep] + extent) / (2 * extent) * (px - 1)).astype(int)
    yi = ((extent - y[keep]) / (2 * extent) * (px - 1)).astype(int)
    v = intensity[keep] if intensity is not None else np.ones(keep.sum())
    v = np.clip(v, 0.05, 1.0)
    img[yi, xi, 1] = np.maximum(img[yi, xi, 1], v)  # green channel = intensity
    img[yi, xi, 0] = 0.3 * img[yi, xi, 1]
    _save_image(Path(path), img)


def entrypoint(argv=None):
    parser = argparse.ArgumentParser(description="Render a trained neurad_tpu run")
    parser.add_argument("run_dir")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--cameras", default="eval", choices=["eval", "train", "all"])
    parser.add_argument("--lidar", action="store_true", help="also render lidar point clouds (.npz)")
    parser.add_argument("--shift", type=float, default=0.0, help="lateral ray-origin shift in meters (FID-style lane shift)")
    parser.add_argument("--interpolate", type=int, default=0,
                        help="render an interpolated path with N steps between consecutive train cameras")
    parser.add_argument("--camera-path", default=None, help="nerfstudio camera-path JSON to render")
    parser.add_argument("--actor-shift", default=None, help="dx,dy,dz actor position shift in meters")
    parser.add_argument("--actor-removal-time", type=float, default=None, help="remove actors after this time (s)")
    parser.add_argument("--actor-stop-time", type=float, default=None, help="freeze actors at this time (s)")
    parser.add_argument("--actor-indices", default=None, help="comma-separated actor indices for edits (default all)")
    parser.add_argument("--shift-time", type=float, default=None,
                        help="with --shift: apply the lateral shift only after this time (smooth ramp)")
    parser.add_argument("--lidar-bev", action="store_true", help="also write top-down lidar plots (.png)")
    args = parser.parse_args(argv)

    from neurad_tpu.scripts.eval import load_run

    pipeline, state, step = load_run(args.run_dir)
    out_dir = Path(args.output_dir or (Path(args.run_dir) / "renders"))
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.actor_shift or args.actor_removal_time is not None or args.actor_stop_time is not None:
        shift = [float(v) for v in args.actor_shift.split(",")] if args.actor_shift else None
        indices = [int(v) for v in args.actor_indices.split(",")] if args.actor_indices else None
        state = modify_actors(
            pipeline, state, shift=shift,
            removal_time=args.actor_removal_time, stop_time=args.actor_stop_time, indices=indices,
        )

    if args.camera_path:
        poses, _fov, times = load_camera_path(args.camera_path)
        base = (list(pipeline.outputs.eval_camera_indices) or [0])[0]
        for i, pose in enumerate(poses):
            t = times[i] if times else None
            img = render_pose(pipeline, state, pose, base, time=t)
            _save_image(out_dir / f"campath_{i:05d}.png", img)
        print(f"[nt-render] wrote {len(poses)} camera-path frames")

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
        skip_shift = False
        if args.shift_time is not None and outputs.cameras.times is not None:
            # shifted-path mode (`render.py:749-791`): shift only after shift_time
            skip_shift = float(np.asarray(outputs.cameras.times[ci]).reshape(-1)[0]) <= args.shift_time
        if args.shift != 0.0 and not skip_shift:
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

    if args.lidar or args.lidar_bev:
        for si in outputs.eval_lidar_indices:
            out = pipeline.render_eval_lidar(state, si)
            if args.lidar:
                np.savez(out_dir / f"lidar_{si:04d}.npz", **out)
            if args.lidar_bev:
                # predicted point cloud (model returns) and GT, top-down
                ret = out["did_return"][:, 0]
                drop = 1.0 / (1.0 + np.exp(-out["ray_drop_logits"][:, 0])) > 0.5
                pred_pts = out["origins"] + out["directions"] * out["depth"]
                gt_pts = out["origins"] + out["directions"] * out["gt_distance"]
                org = out["origins"][0]
                save_lidar_bev(out_dir / f"lidar_{si:04d}_pred_bev.png", (pred_pts - org)[~drop],
                               out["intensity"][~drop, 0])
                save_lidar_bev(out_dir / f"lidar_{si:04d}_gt_bev.png", (gt_pts - org)[ret],
                               out["gt_intensity"][ret, 0])

    print(f"[nt-render] wrote {len(cam_indices)} camera renders to {out_dir} (ckpt step {step})")


if __name__ == "__main__":
    entrypoint()
