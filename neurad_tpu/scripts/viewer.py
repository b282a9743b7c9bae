"""nt-viewer: interactive browser viewer for a trained run.

Counterpart of `ns-viewer` (`nerfstudio/scripts/viewer/run_viewer.py`). Works
for both pipeline families: NeuRAD-style ray pipelines (chunked NFF render)
and SplatAD (direct rasterization) — both expose
`render_viewer_image` / `render_virtual_lidar` with traced actor-edit values.
"""

from __future__ import annotations

import argparse

import numpy as np


def entrypoint(argv=None):
    parser = argparse.ArgumentParser(description="Interactive viewer for a neurad_tpu run")
    parser.add_argument("run_dir")
    parser.add_argument("--port", type=int, default=7007)
    args = parser.parse_args(argv)

    from neurad_tpu.scripts.eval import load_run
    from neurad_tpu.viewer.server import ViewerServer

    pipeline, state, _ = load_run(args.run_dir)
    duration = pipeline.outputs.duration

    def _edits_vec(edits):
        if not edits:
            return None
        return np.asarray(
            [
                edits.get("lateral", 0.0), edits.get("longitudinal", 0.0),
                edits.get("rotation", 0.0), edits.get("height", 0.0),
                edits.get("rs", 0.0),  # rolling-shutter slider (splatad only)
            ],
            dtype=np.float32,
        )

    def render_fn(c2w, width, height, t01, edits=None):
        return pipeline.render_viewer_image(
            state.params, c2w, width, height, t01 * duration, _edits_vec(edits)
        )

    lidar_fn = None
    if hasattr(pipeline, "render_virtual_lidar"):

        def lidar_fn(t01, channels, azim_res, drop_threshold, edits=None):
            origin = np.asarray(pipeline.outputs.cameras.camera_to_worlds)[:, :3, 3].mean(0)
            origin[2] += 0.5
            return pipeline.render_virtual_lidar(
                state.params, origin, t01 * duration,
                channels=channels, azim_res_deg=azim_res,
                drop_threshold=drop_threshold, edits_vec=_edits_vec(edits),
            )

    server = ViewerServer(render_fn, port=args.port, lidar_fn=lidar_fn)
    server.start(background=False)


if __name__ == "__main__":
    entrypoint()
