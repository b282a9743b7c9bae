"""nt-viewer: interactive browser viewer for a trained run.

Counterpart of `ns-viewer` (`nerfstudio/scripts/viewer/run_viewer.py`).
"""

from __future__ import annotations

import argparse

import numpy as np


def entrypoint(argv=None):
    parser = argparse.ArgumentParser(description="Interactive viewer for a neurad_tpu run")
    parser.add_argument("run_dir")
    parser.add_argument("--port", type=int, default=7007)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from neurad_tpu.cameras.cameras import CameraType, Cameras, full_image_coords, generate_rays
    from neurad_tpu.core.structs import tree_getitem
    from neurad_tpu.models.neurad import NeuRADModel
    from neurad_tpu.scripts.eval import load_run
    from neurad_tpu.viewer.server import ViewerServer

    pipeline, state, _ = load_run(args.run_dir)
    duration = pipeline.outputs.duration

    def render_fn(c2w: np.ndarray, width: int, height: int, t01: float) -> np.ndarray:
        focal = 0.7 * width
        cams = Cameras(
            camera_to_worlds=jnp.asarray(c2w)[None],
            fx=jnp.full((1, 1), focal),
            fy=jnp.full((1, 1), focal),
            cx=jnp.full((1, 1), width / 2.0),
            cy=jnp.full((1, 1), height / 2.0),
            width=jnp.full((1, 1), width, dtype=jnp.int32),
            height=jnp.full((1, 1), height, dtype=jnp.int32),
            camera_type=jnp.full((1, 1), int(CameraType.PERSPECTIVE), dtype=jnp.int32),
            times=jnp.full((1, 1), t01 * duration),
        )
        coords = full_image_coords(height, width)
        bundle = generate_rays(cams, jnp.zeros(coords.shape[0], dtype=jnp.int32), coords)
        nff = pipeline._chunked_nff(state.params, bundle, all_camera=True)
        features = nff["features"]
        rgb = pipeline.model.apply(
            state.params, features, (height, width), height * width, method=NeuRADModel.decode_features
        )[0]
        return np.asarray(rgb[0])

    server = ViewerServer(render_fn, port=args.port)
    server.start(background=False)


if __name__ == "__main__":
    entrypoint()
