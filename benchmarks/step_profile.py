"""Piecewise profiling of the NeuRAD train step on the real TPU: where does the
time go after the per-level gather restructure, and what chunk size is best?"""

import os
import sys
import time

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from neurad_tpu.data.datamanager import ADDataManagerConfig
from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
from neurad_tpu.models.neurad import LossSettings, SamplingSettings
from neurad_tpu.pipelines.ad_pipeline import ADPipeline, ADPipelineConfig


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def timeit(fn, *args, reps=3):
    fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def build(chunk, vgg=True):
    parser = SyntheticDataParserConfig(num_frames=10, image_height=192, image_width=288).setup()
    outputs = parser.get_dataparser_outputs()
    over = dict(sampling=SamplingSettings())
    if not vgg:
        over["loss"] = LossSettings(vgg_mult=0.0)
    config = ADPipelineConfig(
        datamanager=ADDataManagerConfig(num_cam_patches=20, patch_size=32, num_lidar_rays=8192),
        model_overrides=over,
        train_ray_chunk=chunk,
    )
    return ADPipeline(outputs, config)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    results = {}

    if which in ("chunks",):
        for chunk in (4096, 8192, 0):
            try:
                pipe = build(chunk)
                state, tx = pipe.init_state()
                step = pipe.make_train_step(tx)
                b = pipe.datamanager.next_train()
                print(f"[profile] compiling chunk={chunk}...", flush=True)
                t = timeit(lambda s: step(s, *b)[1]["total_loss"], state)
                n = b[0].origins.shape[0]
                print(f"chunk={chunk}: {t*1e3:.0f} ms/step, {n/t:.0f} rays/s", flush=True)
                results[f"chunk_{chunk}"] = t
            except Exception as e:
                print(f"chunk={chunk} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    if which in ("all", "parts"):
        pipe = build(4096)
        state, tx = pipe.init_state()
        b = pipe.datamanager.next_train()
        n = b[0].origins.shape[0]

        fwd = jax.jit(lambda p: pipe.loss_fn(p, b[0], b[1], jax.random.PRNGKey(0))[0])
        print("[profile] compiling fwd-only...", flush=True)
        t = timeit(fwd, state.params)
        print(f"forward-only: {t*1e3:.0f} ms  ({n/t:.0f} rays/s)", flush=True)

        pipe2 = build(4096, vgg=False)
        state2, tx2 = pipe2.init_state()
        step2 = pipe2.make_train_step(tx2)
        b2 = pipe2.datamanager.next_train()
        print("[profile] compiling no-vgg step...", flush=True)
        t = timeit(lambda s: step2(s, *b2)[1]["total_loss"], state2)
        print(f"no-vgg step: {t*1e3:.0f} ms  ({n/t:.0f} rays/s)", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
