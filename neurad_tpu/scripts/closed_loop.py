"""Closed-loop simulation server: render-by-pose HTTP API.

TPU-native counterpart of `nerfstudio/scripts/closed_loop/main.py:32-108` +
`server.py:36-199`. FastAPI isn't in this image, so the same JSON API is served
with the stdlib http.server (threaded; renders run under a lock like the
reference's `render_lock`):

  POST /render_image   {pose: [[...4x4...]], timestamp: float, camera_name: str}
                       -> {image: [[...]]} (H x W x 3 floats)
  GET  /get_actors     -> {actors: [{uuid, poses, timestamps, dims}]}
  POST /update_actors  {actors: [...]} -> swap trajectories live
  GET  /start_time     -> {start_time: float}
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class ClosedLoopState:
    """Holds the pipeline + live-editable actor trajectories (`server.py:36-199`)."""

    def __init__(self, run_dir: str):
        from neurad_tpu.scripts.eval import load_run

        self.pipeline, self.state, _ = load_run(run_dir)
        self.render_lock = threading.Lock()
        self.time_offset = float((self.pipeline.outputs.metadata or {}).get("time_offset", 0.0))

    def render_image(self, pose_4x4, timestamp: float, camera_name: str = "front"):
        import jax.numpy as jnp

        from neurad_tpu.cameras.cameras import generate_rays, full_image_coords

        outputs = self.pipeline.outputs
        cams = outputs.cameras
        # pick the template camera matching the requested sensor name
        names = {v: k for k, v in outputs.sensor_idx_to_name.items()}
        sensor = names.get(camera_name, 0)
        md = cams.metadata
        cam_idx = 0
        if "sensor_idxs" in md:
            matches = np.nonzero(np.asarray(md["sensor_idxs"][:, 0]) == sensor)[0]
            cam_idx = int(matches[0]) if len(matches) else 0

        pose = np.asarray(pose_4x4, dtype=np.float32)[:3, :4]
        c2w = np.asarray(cams.camera_to_worlds).copy()
        c2w[cam_idx] = pose
        times = np.asarray(cams.times).copy() if cams.times is not None else None
        if times is not None:
            times[cam_idx] = timestamp
        patched = cams.replace(
            camera_to_worlds=jnp.asarray(c2w),
            times=jnp.asarray(times) if times is not None else None,
        )
        self.pipeline.outputs.cameras = patched
        self.pipeline.datamanager.outputs.cameras = patched
        with self.render_lock:
            pred, _ = self.pipeline.render_eval_camera(self.state, cam_idx)
        return pred

    def get_actors(self):
        return [
            {
                "poses": np.asarray(t["poses"]).tolist(),
                "timestamps": np.asarray(t["timestamps"]).tolist(),
                "dims": np.asarray(t["dims"]).tolist(),
            }
            for t in self.pipeline.outputs.trajectories
        ]

    def update_actors(self, actors):
        """Replace actor trajectories live (`server.py:123-147`): rebuild the
        model's actor data and re-init only the trajectory params."""
        from neurad_tpu.model_components.dynamic_actors import actor_data_from_trajectories

        trajs = []
        for a in actors:
            trajs.append(
                {
                    "poses": np.asarray(a["poses"], dtype=np.float32),
                    "timestamps": np.asarray(a["timestamps"]),
                    "dims": np.asarray(a["dims"], dtype=np.float32),
                    "symmetric": a.get("symmetric", True),
                    "deformable": a.get("deformable", False),
                }
            )
        data = actor_data_from_trajectories(trajs)
        import jax.numpy as jnp

        from neurad_tpu.core import poses as pose_utils

        p = dict(self.state.params["params"])
        actors_params = dict(p.get("actors", {}))
        poses = jnp.asarray(data.poses)
        actors_params["actor_positions"] = poses[..., :3, 3]
        actors_params["actor_rotations_6d"] = pose_utils.rotmat_to_6d(poses[..., :3, :3])
        actors_params["actor_vel_linear"] = jnp.asarray(data.vel_linear)
        actors_params["actor_vel_angular"] = jnp.asarray(data.vel_angular)
        p["actors"] = actors_params
        self.state = self.state.replace(params={**self.state.params, "params": p})


def make_handler(cls_state: ClosedLoopState):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, payload, code=200):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/get_actors":
                self._json({"actors": cls_state.get_actors()})
            elif self.path == "/start_time":
                self._json({"start_time": cls_state.time_offset})
            else:
                self._json({"error": "unknown endpoint"}, 404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            if self.path == "/render_image":
                img = cls_state.render_image(
                    req["pose"], float(req.get("timestamp", 0.0)), req.get("camera_name", "front")
                )
                self._json({"image": np.asarray(img).tolist()})
            elif self.path == "/update_actors":
                cls_state.update_actors(req["actors"])
                self._json({"status": "ok"})
            else:
                self._json({"error": "unknown endpoint"}, 404)

        def log_message(self, *args):
            pass

    return Handler


def entrypoint(argv=None):
    parser = argparse.ArgumentParser(description="Closed-loop render server")
    parser.add_argument("run_dir")
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args(argv)
    state = ClosedLoopState(args.run_dir)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(state))
    print(f"[closed-loop] serving on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    entrypoint()
