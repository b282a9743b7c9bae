"""Capture an xplane trace of the SplatAD CAMERA train step (fwd+bwd+adam,
480x720, 500k cap, device-resident inputs) and print the per-category device
time — the decomposition behind BENCH's camera_train_step_ms.

Usage: python benchmarks/splatad_train_trace.py [trace_dir]
Then:  python benchmarks/trace_by_component.py <trace_dir> 2   (rough)
       python benchmarks/trace_dump.py <trace_dir> 2 40        (op level)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/splatad_train_trace"
    os.makedirs(trace_dir, exist_ok=True)

    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.pipelines.splatad_pipeline import SplatADPipeline, SplatADPipelineConfig

    parser = SyntheticDataParserConfig(num_frames=6, image_height=480, image_width=720).setup()
    outputs = parser.get_dataparser_outputs()
    cfg = SplatADPipelineConfig()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, num_downscales=0))
    pipe = SplatADPipeline(outputs, cfg)
    state = pipe.init_state()
    cam_step = pipe._make_camera_step()

    s = pipe.datamanager._camera_sample(0)
    args = (
        jax.device_put(np.asarray(s.c2w)), jax.device_put(np.asarray(s.K)),
        jax.device_put(np.asarray(s.image)),
        jax.device_put(np.asarray(s.time, np.float32)),
        jax.device_put(np.asarray(s.sensor_idx, np.int32)),
        jax.device_put(np.asarray(s.cam_idx, np.int32)),
        jax.device_put(np.asarray(s.linear_velocity, np.float32)),
        s.rolling_shutter_time, s.time_to_center_pixel,
    )
    print("[trace] compiling...", flush=True)
    state, _m, _aux = cam_step(state, *args)
    jax.block_until_ready(state.params)
    print("[trace] tracing 2 steps...", flush=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            state, _m, _aux = cam_step(state, *args)
        jax.block_until_ready(state.params)
    print(f"[trace] saved to {trace_dir}", flush=True)


if __name__ == "__main__":
    main()
