"""Benchmark: NeuRAD training throughput + SplatAD rendering rate on the real TPU.

Prints ONE JSON line. Primary metric (the driver's headline) stays NeuRAD
training rays/s/chip; the SplatAD numbers ride along under the "splatad" key so
every round's BENCH_r*.json captures the rasterizer too:

  {"metric": "neurad_train_rays_per_sec_per_chip_<backend>", "value": N,
   "unit": "rays/s", "vs_baseline": N,
   "splatad": {"render_fps_480x720": N, "lidar_scans_per_sec": N,
               "camera_train_step_ms": N, "vs_realtime_10hz": N}}

Baselines:
- NeuRAD: the reference repo publishes no numeric benchmarks (BASELINE.md); the
  NeuRAD paper (arXiv:2311.15260, §experiments) reports ~1 hour training on one
  A100 for 20001 steps at 57344 rays/step => ~318k rays/s. vs_baseline is
  measured throughput / 318000.
- SplatAD: the reference's headline is "Real-Time Lidar and Camera Rendering"
  (README.md:39). AD sensor rigs (PandaSet/nuScenes) run cameras and lidar at
  10 Hz, so vs_realtime_10hz = min(camera FPS, lidar scans/s) / 10 — >=1 means
  real-time on both modalities on one chip.

NeuRAD runs the default-size model (full hashgrid sizes, 128/64 proposal + 32
nerf samples, default 40960+16384 ray batch) on the synthetic scene so the
benchmark needs no dataset download. Device-side throughput: batches are
pre-generated and cycled to exclude host sampling from the timing (the real
datamanager prefetches on a thread). SplatAD renders 500k gaussians at 480x720
with the tuned inference knobs (static frustum cull + max_per_tile=128) and a
65k-point lidar scan, timed with the chained fetch-forced harness
(`benchmarks/render_fps.py`) because single-call timings lie through the
remote-TPU tunnel.
"""

import json
import sys
import time


def _fetch(x):
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def bench_neurad():
    import jax

    from neurad_tpu.data.datamanager import ADDataManagerConfig
    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.models.neurad import SamplingSettings
    from neurad_tpu.pipelines.ad_pipeline import ADPipeline, ADPipelineConfig

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
    print(f"[bench] compiling neurad train step ({rays_per_step} rays/step)...", file=sys.stderr, flush=True)

    for i in range(3):  # warmup (compile)
        state, metrics = step_fn(state, *batches[i % len(batches)])
    jax.block_until_ready(state.params)
    print("[bench] compile done, timing...", file=sys.stderr, flush=True)

    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step_fn(state, *batches[i % len(batches)])
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    return n_steps * rays_per_step / dt


def bench_splatad():
    """Tuned 480x720 camera FPS + 65k-pt lidar scans/s + camera train-step ms."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neurad_tpu.model_components.dynamic_actors import empty_actor_data
    from neurad_tpu.models.splatad import GaussianInit, SplatADConfig, SplatADModel

    K_CHAIN = 8
    n = 500_000
    rng = np.random.default_rng(0)
    means = rng.uniform(-40, 40, size=(n, 3)).astype(np.float32)
    means[:, 2] *= 0.2

    def build(config):
        init = GaussianInit(
            means=means,
            scales_log=np.full((n, 3), np.log(0.2), np.float32),
            quats=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
            features=rng.uniform(size=(n, config.feature_dim)).astype(np.float32),
            opacities_logit=rng.uniform(-1, 1, size=(n,)).astype(np.float32),
            ids=np.full((n,), 1, np.int32),
        )
        model = SplatADModel(init_data=init, actor_data=empty_actor_data(), config=config)
        return model, model.init(jax.random.PRNGKey(0), method=SplatADModel.init_all)

    def chain_time(fn, *args):
        _fetch(fn(*args))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _fetch(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best / K_CHAIN

    out = {}
    # --- tuned camera render 480x720 ---
    model, params = build(SplatADConfig(max_visible_gaussians=128 * 1024, max_per_tile=128))
    w, h = 720, 480
    Kmat = jnp.array([[0.7 * w, 0, w / 2], [0, 0.7 * w, h / 2], [0, 0, 1.0]])
    c2ws = jnp.tile(jnp.eye(4)[None, :3], (K_CHAIN, 1, 1))
    c2ws = c2ws.at[:, 0, 3].set(jnp.linspace(0.0, 2.0, K_CHAIN))
    c2ws = c2ws.at[:, 2, 3].set(-50.0)

    @jax.jit
    def render_chain(params, c2ws):
        def body(i, s):
            o = model.apply(
                params, c2ws[i], Kmat, w, h,
                jnp.zeros(()), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                method=SplatADModel.get_camera_outputs,
            )
            return s + jnp.sum(o["rgb"][::97, ::97])
        return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

    print("[bench] compiling splatad camera render...", file=sys.stderr, flush=True)
    t = chain_time(render_chain, params, c2ws)
    out["render_fps_480x720"] = round(1.0 / t, 1)

    # quality gate behind the tuned caps (VERDICT r3 weak #4): overflow
    # counters + PSNR of the tuned render vs the uncapped default on the same
    # pose — a cap that silently clips gaussians would post the same FPS
    model_ref, params_ref = build(SplatADConfig())  # same seed => identical weights
    o_tuned = model.apply(
        params, c2ws[0], Kmat, w, h, jnp.zeros(()), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32), method=SplatADModel.get_camera_outputs,
    )
    o_def = model_ref.apply(
        params_ref, c2ws[0], Kmat, w, h, jnp.zeros(()), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32), method=SplatADModel.get_camera_outputs,
    )
    mse = float(jnp.mean((o_tuned["rgb"] - o_def["rgb"]) ** 2))
    out["overflow"] = {
        "dropped_pairs": int(o_tuned["binning_dropped_pairs"]),
        "cropped_gaussians": int(o_tuned["binning_cropped_gaussians"]),
        "culled_visible": int(o_tuned["binning_culled_visible"]),
        "tuned_vs_default_psnr_db": round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 1),
    }

    # --- tuned camera render at PandaSet sensor resolution 1080x1920
    # (the reference's real-time pitch is sensor-res on an RTX GPU,
    # README.md:39; PandaSet cameras are 1080x1920) ---
    w2, h2 = 1920, 1080
    K2 = jnp.array([[0.7 * w2, 0, w2 / 2], [0, 0.7 * w2, h2 / 2], [0, 0, 1.0]])

    @jax.jit
    def render_chain_1080(params, c2ws):
        def body(i, s):
            o = model.apply(
                params, c2ws[i], K2, w2, h2,
                jnp.zeros(()), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                method=SplatADModel.get_camera_outputs,
            )
            return s + jnp.sum(o["rgb"][::97, ::97])
        return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

    print("[bench] compiling splatad camera render 1080p...", file=sys.stderr, flush=True)
    t = chain_time(render_chain_1080, params, c2ws)
    out["render_fps_1080x1920"] = round(1.0 / t, 1)
    o_tuned2 = model.apply(
        params, c2ws[0], K2, w2, h2, jnp.zeros(()), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32), method=SplatADModel.get_camera_outputs,
    )
    o_def2 = model_ref.apply(
        params_ref, c2ws[0], K2, w2, h2, jnp.zeros(()), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32), method=SplatADModel.get_camera_outputs,
    )
    mse2 = float(jnp.mean((o_tuned2["rgb"] - o_def2["rgb"]) ** 2))
    out["overflow_1080p"] = {
        "dropped_pairs": int(o_tuned2["binning_dropped_pairs"]),
        "cropped_gaussians": int(o_tuned2["binning_cropped_gaussians"]),
        "culled_visible": int(o_tuned2["binning_culled_visible"]),
        "tuned_vs_default_psnr_db": round(10.0 * np.log10(1.0 / max(mse2, 1e-12)), 1),
    }

    # --- lidar scan (default config, like the training path) ---
    model_d, params_d = build(SplatADConfig())
    m = 65536
    pts = np.stack([
        rng.uniform(-180, 180, m), rng.uniform(-20, 10, m),
        rng.uniform(3, 60, m), np.zeros(m), np.zeros(m),
    ], axis=-1).astype(np.float32)
    pts = jnp.asarray(pts)
    l2w = jnp.eye(4)[:3]

    @jax.jit
    def lidar_chain(params, pts):
        def body(i, s):
            o = model_d.apply(
                params, l2w, pts + i * 1e-5, jnp.zeros(()), jnp.zeros((), jnp.int32),
                method=SplatADModel.get_lidar_outputs,
            )
            return s + jnp.sum(o["intensity"][::97])
        return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

    print("[bench] compiling splatad lidar render...", file=sys.stderr, flush=True)
    t = chain_time(lidar_chain, params_d, pts)
    out["lidar_scans_per_sec"] = round(1.0 / t, 1)

    # --- camera train step (fwd+bwd+adam, full-res, no refine) on the
    # synthetic scene: the steady-state cost after the downscale schedule ---
    import dataclasses

    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.pipelines.splatad_pipeline import SplatADPipeline, SplatADPipelineConfig

    parser = SyntheticDataParserConfig(num_frames=6, image_height=480, image_width=720).setup()
    outputs = parser.get_dataparser_outputs()
    cfg = SplatADPipelineConfig()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, num_downscales=0))
    pipe = SplatADPipeline(outputs, cfg)
    state = pipe.init_state()
    print("[bench] compiling splatad camera train step...", file=sys.stderr, flush=True)
    cam_step = pipe._make_camera_step()

    # Pre-stage the camera samples on device and cycle them, like the NeuRAD
    # section: the real train loop prefetches the next sample while the step
    # runs, so per-step H2D cost is hidden; timing the transfer would measure
    # the benchmark tunnel, not the trainer (round-4 decomposition,
    # benchmarks/splatad_train_decompose.py: 165.9 ms device vs 1.6 s/step of
    # pure tunnel transfer when inputs ship per step).
    import numpy as _np

    def dev_sample(i):
        s = pipe.datamanager._camera_sample(i % len(outputs.images))
        return (
            jax.device_put(_np.asarray(s.c2w)), jax.device_put(_np.asarray(s.K)),
            jax.device_put(_np.asarray(s.image)),
            jax.device_put(_np.asarray(s.time, _np.float32)),
            jax.device_put(_np.asarray(s.sensor_idx, _np.int32)),
            jax.device_put(_np.asarray(s.cam_idx, _np.int32)),
            jax.device_put(_np.asarray(s.linear_velocity, _np.float32)),
            s.rolling_shutter_time, s.time_to_center_pixel,
        )

    samples = [dev_sample(i) for i in range(4)]
    jax.block_until_ready([s[2] for s in samples])

    state, _m, _aux = cam_step(state, *samples[0])
    jax.block_until_ready(state.params)
    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, _m, _aux = cam_step(state, *samples[(i + 1) % len(samples)])
    jax.block_until_ready(state.params)
    out["camera_train_step_ms"] = round(1000.0 * (time.perf_counter() - t0) / n_steps, 1)

    # --- lidar train step (fwd+bwd+adam on a 65k-pt scan) — VERDICT r4 #4:
    # only the render scans/s was driver-tracked before ---
    print("[bench] compiling splatad lidar train step...", file=sys.stderr, flush=True)
    lid_step = pipe._make_lidar_step()

    def dev_lidar(i):
        s = pipe.datamanager._lidar_sample(i % len(outputs.point_clouds))
        return (
            jax.device_put(_np.asarray(s.l2w)), jax.device_put(_np.asarray(s.raster_pts)),
            jax.device_put(_np.asarray(s.did_return)), jax.device_put(_np.asarray(s.valid)),
            jax.device_put(_np.asarray(s.time, _np.float32)),
            jax.device_put(_np.asarray(s.sensor_idx, _np.int32)),
            jax.device_put(_np.asarray(s.linear_velocity, _np.float32)),
        )

    lsamples = [dev_lidar(i) for i in range(2)]
    jax.block_until_ready([s[1] for s in lsamples])
    state, _m = lid_step(state, *lsamples[0])
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, _m = lid_step(state, *lsamples[(i + 1) % len(lsamples)])
    jax.block_until_ready(state.params)
    out["lidar_train_step_ms"] = round(1000.0 * (time.perf_counter() - t0) / n_steps, 1)

    out["vs_realtime_10hz"] = round(min(out["render_fps_480x720"], out["lidar_scans_per_sec"]) / 10.0, 2)
    return out


def bench_neurad_parity():
    """Driver-tracked rays/s for the reference-faithful `neurad-parity`
    architecture (hashgrid proposals, unpacked face-shared corners, fp32 —
    VERDICT r3 missing #3: the architecture proven numerically equivalent
    needs its own tracked number next to the TPU-default one). Smaller batch
    + fewer steps: this path is ~3x slower and chunked (train_ray_chunk)."""
    import time as _time

    import jax

    from neurad_tpu.configs.method_configs import get_method_config
    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.pipelines.ad_pipeline import ADPipeline

    cfg = get_method_config("neurad-parity").pipeline
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        datamanager=dataclasses.replace(cfg.datamanager, num_cam_patches=20, patch_size=32, num_lidar_rays=8192),
    )
    parser = SyntheticDataParserConfig(num_frames=10, image_height=192, image_width=288).setup()
    pipe = ADPipeline(parser.get_dataparser_outputs(), cfg)
    state, tx = pipe.init_state()
    step_fn = pipe.make_train_step(tx)
    batches = [pipe.datamanager.next_train() for _ in range(2)]
    rays = batches[0][0].origins.shape[0]
    print(f"[bench] compiling neurad-parity train step ({rays} rays/step)...", file=sys.stderr, flush=True)
    for i in range(2):
        state, _ = step_fn(state, *batches[i % 2])
    jax.block_until_ready(state.params)
    n = 6
    t0 = _time.perf_counter()
    for i in range(n):
        state, _ = step_fn(state, *batches[i % 2])
    jax.block_until_ready(state.params)
    return n * rays / (_time.perf_counter() - t0)


def _tpu_queue_pids():
    """PIDs of any running benchmarks/tpu_queue.py runner + its descendants.

    The round-5 campaign runs TPU jobs through a detached serialized queue
    (benchmarks/tpu_queue.py). The axon tunnel multiplexes rather than
    rejecting a second claim, so a driver bench run that lands mid-job would
    CONTEND with the active job and understate the headline. Returns
    (queue runner first, then descendants) for SIGSTOP/SIGCONT bracketing.
    Excludes our own process tree: when bench.py itself runs AS a queue job
    (the bench_warm stage), the queue is already serialized around us and
    must not be frozen."""
    import os

    procs = {}
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit():
            continue
        pid = int(pid_s)
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ").decode(errors="replace")
            with open(f"/proc/{pid}/stat") as f:
                ppid = int(f.read().split(")")[-1].split()[1])
        except OSError:
            continue
        procs[pid] = (ppid, cmd)

    def ancestors(pid):
        seen = set()
        while pid in procs and pid not in seen and pid > 1:
            seen.add(pid)
            pid = procs[pid][0]
        return seen

    my_tree = ancestors(os.getpid())
    roots = [
        p for p, (_, cmd) in procs.items()
        if "tpu_queue.py" in cmd and p not in my_tree and p != os.getpid()
    ]
    out = []
    frontier = list(roots)
    while frontier:
        p = frontier.pop()
        if p in my_tree or p == os.getpid():
            continue
        out.append(p)
        frontier.extend(c for c, (pp, _) in procs.items() if pp == p)
    return out


class _paused_queue:
    """Context manager: SIGSTOP the tpu_queue tree on enter, SIGCONT on exit."""

    def __enter__(self):
        import os
        import signal

        self.pids = _tpu_queue_pids()
        for p in self.pids:
            try:
                os.kill(p, signal.SIGSTOP)
            except OSError:
                pass
        if self.pids:
            print(f"[bench] paused tpu_queue tree {self.pids} for clean timing", file=sys.stderr, flush=True)
        return self

    def __exit__(self, *exc):
        import os
        import signal

        for p in reversed(self.pids):
            try:
                os.kill(p, signal.SIGCONT)
            except OSError:
                pass
        return False


def main():
    import os

    import jax

    # persistent compilation cache: repeat bench runs skip the (remote) compile
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # Pause a detached round-5 TPU job queue (and its active job) for the
    # duration of the measurement; resumed on exit.
    with _paused_queue():
        backend = jax.default_backend()
        rays_per_sec = bench_neurad()
        baseline = 318000.0  # A100 reference estimate, see module docstring

        try:
            splat = bench_splatad()
        except Exception as e:  # splat section must never sink the primary metric
            splat = {"error": str(e)[:200]}

        try:
            parity_rays = round(bench_neurad_parity(), 1)
        except Exception as e:
            parity_rays = {"error": str(e)[:200]}

    print(
        json.dumps(
            {
                "metric": f"neurad_train_rays_per_sec_per_chip_{backend}",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / baseline, 4),
                "neurad_parity_rays_per_sec": parity_rays,
                "splatad": splat,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit one JSON line for the driver
        print(json.dumps({"metric": "neurad_train_rays_per_sec_per_chip", "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0, "error": str(e)[:200]}))
        sys.exit(1)


