"""Time the full NeuRAD train step (bench config) with optional overrides.

Usage: python benchmarks/step_time.py [--dedup] [--segsum ROWS] [--patches 40]
       [--lidar 16384] [--steps 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dedup", action="store_true")
    ap.add_argument("--segsum", type=int, default=0, help="segsum_grad_rows threshold (0=off)")
    ap.add_argument("--patches", type=int, default=40)
    ap.add_argument("--lidar", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from neurad_tpu.data.datamanager import ADDataManagerConfig
    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.fields.neurad_encoding import StaticSettings
    from neurad_tpu.models.neurad import SamplingSettings
    from neurad_tpu.pipelines.ad_pipeline import ADPipeline, ADPipelineConfig

    overrides = dict(sampling=SamplingSettings())
    if args.dedup:
        overrides["field_static"] = StaticSettings(run_dedup=True)
    if args.segsum:
        overrides["field_static"] = overrides.get(
            "field_static", StaticSettings()
        )._replace(segsum_grad_rows=args.segsum)

    parser = SyntheticDataParserConfig(num_frames=10, image_height=192, image_width=288).setup()
    pipe = ADPipeline(
        parser.get_dataparser_outputs(),
        ADPipelineConfig(
            datamanager=ADDataManagerConfig(
                num_cam_patches=args.patches, patch_size=32, num_lidar_rays=args.lidar
            ),
            model_overrides=overrides,
            train_ray_chunk=0,
        ),
    )
    state, tx = pipe.init_state()
    step_fn = pipe.make_train_step(tx)
    batches = [pipe.datamanager.next_train() for _ in range(4)]
    rays = batches[0][0].origins.shape[0]
    print(f"[step_time] compiling (dedup={args.dedup}, {rays} rays)...", flush=True)
    for i in range(3):
        state, m = step_fn(state, *batches[i % 4])
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step_fn(state, *batches[i % 4])
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    print(
        f"rays/s: {args.steps * rays / dt:.1f}  step: {1000 * dt / args.steps:.1f} ms"
        f"  dedup={args.dedup} segsum={args.segsum}",
        flush=True,
    )


if __name__ == "__main__":
    main()
