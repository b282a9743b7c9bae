"""Benchmark: NeuRAD training throughput (rays/s/chip) on the real TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no numeric benchmarks (BASELINE.md); the
NeuRAD paper (arXiv:2311.15260, §experiments) reports ~1 hour training on one
A100 for 20001 steps at 57344 rays/step => ~318k rays/s. vs_baseline is measured
throughput / 318000.

Runs the default-size NeuRAD model (full hashgrid sizes, 128/64 proposal + 32
nerf samples, default 40960+16384 ray batch) on the synthetic scene so the
benchmark needs no dataset download. Device-side throughput: batches are
pre-generated and cycled to exclude host sampling from the timing (the real
datamanager prefetches on a thread).
"""

import json
import sys
import time


def main():
    import os
    import sys

    import jax

    # persistent compilation cache: repeat bench runs skip the (remote) compile
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from neurad_tpu.data.datamanager import ADDataManagerConfig
    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.models.neurad import SamplingSettings
    from neurad_tpu.pipelines.ad_pipeline import ADPipeline, ADPipelineConfig

    backend = jax.default_backend()
    # real NeuRAD per-ray architecture ((128,64) proposals + 32 nerf samples,
    # full-size hash tables); full reference batch (40x32^2 cam rays + 16384
    # lidar rays, `ad_datamanager.py:38-45`).
    parser = SyntheticDataParserConfig(num_frames=10, image_height=192, image_width=288).setup()
    outputs = parser.get_dataparser_outputs()
    config = ADPipelineConfig(
        datamanager=ADDataManagerConfig(num_cam_patches=40, patch_size=32, num_lidar_rays=16384),
        model_overrides=dict(
            sampling=SamplingSettings(),  # (128, 64) proposals, 32 nerf samples
        ),
        # chunk=0 (no lax.map chunking): per-level hash gathers shrank the
        # intermediates enough that the full 28k-ray batch fits one v5e, and
        # dropping the scan+remat machinery measured 1.5x faster than chunk 4096
        # (2469 ms vs 3730 ms / step)
        train_ray_chunk=0,
    )
    pipe = ADPipeline(outputs, config)
    state, tx = pipe.init_state()
    step_fn = pipe.make_train_step(tx)

    batches = [pipe.datamanager.next_train() for _ in range(4)]
    rays_per_step = batches[0][0].origins.shape[0]
    print(f"[bench] compiling train step ({rays_per_step} rays/step, backend={backend})...", file=sys.stderr, flush=True)

    # warmup (compile)
    for i in range(3):
        state, metrics = step_fn(state, *batches[i % len(batches)])
    jax.block_until_ready(state.params)
    print("[bench] compile done, timing...", file=sys.stderr, flush=True)

    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step_fn(state, *batches[i % len(batches)])
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    rays_per_sec = n_steps * rays_per_step / dt
    baseline = 318000.0  # A100 reference estimate, see module docstring
    print(
        json.dumps(
            {
                "metric": f"neurad_train_rays_per_sec_per_chip_{backend}",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit one JSON line for the driver
        print(json.dumps({"metric": "neurad_train_rays_per_sec_per_chip", "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0, "error": str(e)[:200]}))
        sys.exit(1)
