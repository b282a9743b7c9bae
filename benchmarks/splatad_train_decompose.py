"""Decompose the SplatAD camera TRAIN step (the driver-measured 443.7 ms in
BENCH_r03 vs the 74.6 ms model-level claim in PERFORMANCE.md).

Hypotheses measured separately:
  A. device-resident inputs, chained steps   -> true device step time
  B. + host jnp.asarray(image) per step      -> tunnel/H2D transfer cost
  C. adam/opt update only (same param tree)  -> optimizer share
  D. forward-only loss (no grad)             -> fwd vs bwd split

Usage: python benchmarks/splatad_train_decompose.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def main():
    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.pipelines.splatad_pipeline import SplatADPipeline, SplatADPipelineConfig

    parser = SyntheticDataParserConfig(num_frames=6, image_height=480, image_width=720).setup()
    outputs = parser.get_dataparser_outputs()
    cfg = SplatADPipelineConfig()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, num_downscales=0))
    pipe = SplatADPipeline(outputs, cfg)
    state = pipe.init_state()
    print(f"[decompose] cap_max={pipe.config.cap_max}", flush=True)
    cam_step = pipe._make_camera_step()

    def dev_sample(i):
        s = pipe.datamanager._camera_sample(i % len(outputs.images))
        return (
            jax.device_put(np.asarray(s.c2w)),
            jax.device_put(np.asarray(s.K)),
            jax.device_put(np.asarray(s.image)),
            jax.device_put(np.asarray(s.time, np.float32)),
            jax.device_put(np.asarray(s.sensor_idx, np.int32)),
            jax.device_put(np.asarray(s.cam_idx, np.int32)),
            jax.device_put(np.asarray(s.linear_velocity, np.float32)),
            s.rolling_shutter_time,
            s.time_to_center_pixel,
        )

    samples = [dev_sample(i) for i in range(4)]
    jax.block_until_ready([s[2] for s in samples])

    # compile
    state, _m, _aux = cam_step(state, *samples[0])
    jax.block_until_ready(state.params)

    n = 20
    # A: device-resident inputs
    t0 = time.perf_counter()
    for i in range(n):
        state, _m, _aux = cam_step(state, *samples[i % len(samples)])
    jax.block_until_ready(state.params)
    a_ms = 1000 * (time.perf_counter() - t0) / n
    print(f"A. device-resident inputs:      {a_ms:7.1f} ms/step", flush=True)

    # B: host asarray per step (what bench.py r3 timed)
    host_samples = [pipe.datamanager._camera_sample(i % len(outputs.images)) for i in range(4)]
    t0 = time.perf_counter()
    for i in range(n):
        s = host_samples[i % len(host_samples)]
        state, _m, _aux = cam_step(
            state, jnp.asarray(s.c2w), jnp.asarray(s.K), jnp.asarray(s.image),
            jnp.asarray(s.time), jnp.asarray(s.sensor_idx), jnp.asarray(s.cam_idx),
            jnp.asarray(s.linear_velocity), s.rolling_shutter_time, s.time_to_center_pixel,
        )
    jax.block_until_ready(state.params)
    b_ms = 1000 * (time.perf_counter() - t0) / n
    print(f"B. + per-step host transfers:   {b_ms:7.1f} ms/step  (transfer share {b_ms - a_ms:.1f})", flush=True)

    # C: optimizer-only on the same tree (zero grads)
    zgrads = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    @jax.jit
    def opt_only(state, grads):
        updates, opt_state = pipe.tx.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state)

    state2 = opt_only(state, zgrads)
    jax.block_until_ready(state2.params)
    t0 = time.perf_counter()
    for _ in range(n):
        state2 = opt_only(state2, zgrads)
    jax.block_until_ready(state2.params)
    print(f"C. optimizer update only:       {1000 * (time.perf_counter() - t0) / n:7.1f} ms/step", flush=True)

    # D: forward-only loss
    s0 = samples[0]

    @jax.jit
    def fwd_only(params, c2w, K, image, t, sidx, cidx, lv):
        h, w = image.shape[0], image.shape[1]
        out = pipe.model.apply(
            params, c2w, K, w, h, t, sidx, cidx,
            cam_linear_vel=lv,
            rolling_shutter_time=s0[7], time_to_center_pixel=s0[8], train=True,
            method=type(pipe.model).get_camera_outputs,
        )
        total, _ = pipe.model.apply(params, out, image, method=type(pipe.model).camera_loss)
        return total

    args = (state.params,) + s0[:7]
    fetch(fwd_only(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fwd_only(*args)
    fetch(r)
    print(f"D. forward+loss only:           {1000 * (time.perf_counter() - t0) / n:7.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
