"""SplatAD inference (render) rate on the real TPU.

The reference's headline claim is "Real-Time Lidar and Camera Rendering"
(README.md:39; SplatAD paper arXiv:2411.16816 reports camera FPS on an RTX
GPU). This measures the model-level render path — projection + binning +
compositing + RGB decoder CNN — jitted, forward-only, amortized over chained
frames with per-frame pose changes (so nothing is constant-folded).

Variants: `default` = the training config; `tuned` = the inference knobs
(max_visible_gaussians static frustum cull + max_per_tile 128).

Usage: python benchmarks/render_fps.py [n_gaussians]
"""

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

from neurad_tpu.model_components.dynamic_actors import empty_actor_data
from neurad_tpu.models.splatad import GaussianInit, SplatADConfig, SplatADModel

K_CHAIN = 8


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def timeit(fn, *args, reps=3):
    fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K_CHAIN


def build_model(n: int, config: SplatADConfig):
    rng = np.random.default_rng(0)
    means = rng.uniform(-40, 40, size=(n, 3)).astype(np.float32)
    means[:, 2] *= 0.2
    init = GaussianInit(
        means=means,
        scales_log=np.full((n, 3), np.log(0.2), np.float32),
        quats=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        features=rng.uniform(size=(n, config.feature_dim)).astype(np.float32),
        opacities_logit=rng.uniform(-1, 1, size=(n,)).astype(np.float32),
        ids=np.full((n,), 1, np.int32),  # id > n_actors-1 => static
    )
    model = SplatADModel(init_data=init, actor_data=empty_actor_data(), config=config)
    params = model.init(jax.random.PRNGKey(0), method=SplatADModel.init_all)
    return model, params


def run_camera(model, params, w, h, label):
    Kmat = jnp.array([[0.7 * w, 0, w / 2], [0, 0.7 * w, h / 2], [0, 0, 1.0]])
    c2ws = jnp.tile(jnp.eye(4)[None, :3], (K_CHAIN, 1, 1))
    c2ws = c2ws.at[:, 0, 3].set(jnp.linspace(0.0, 2.0, K_CHAIN))
    c2ws = c2ws.at[:, 2, 3].set(-50.0)

    @jax.jit
    def render_chain(params, c2ws):
        def body(i, s):
            out = model.apply(
                params, c2ws[i], Kmat, w, h,
                jnp.zeros(()), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                method=SplatADModel.get_camera_outputs,
            )
            return s + jnp.sum(out["rgb"][::97, ::97])
        return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

    print(f"[render_fps] compiling camera {label}...", flush=True)
    t = timeit(render_chain, params, c2ws)
    print(f"  camera {label:24s}: {t*1e3:8.1f} ms/frame  = {1.0/t:6.1f} FPS", flush=True)


def run_lidar(model, params):
    m = 65536
    rng = np.random.default_rng(1)
    pts = np.stack([
        rng.uniform(-180, 180, m), rng.uniform(-20, 10, m),
        rng.uniform(3, 60, m), np.zeros(m), np.zeros(m),
    ], axis=-1).astype(np.float32)
    pts = jnp.asarray(pts)
    l2w = jnp.eye(4)[:3]

    @jax.jit
    def lidar_chain(params, pts):
        def body(i, s):
            out = model.apply(
                params, l2w, pts + i * 1e-5, jnp.zeros(()), jnp.zeros((), jnp.int32),
                method=SplatADModel.get_lidar_outputs,
            )
            return s + jnp.sum(out["intensity"][::97])
        return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

    print("[render_fps] compiling lidar scan (65k pts)...", flush=True)
    t = timeit(lidar_chain, params, pts)
    print(f"  lidar 65k pts             : {t*1e3:8.1f} ms/scan   = {1.0/t:6.1f} scans/s", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    print(f"devices: {jax.devices()}  n_gaussians={n}", flush=True)

    cull = int(os.environ.get("RENDER_FPS_MAX_VISIBLE", str(128 * 1024)))
    variants = (
        ("default", SplatADConfig()),
        ("tuned", SplatADConfig(max_visible_gaussians=cull, max_per_tile=128)),
    )
    for vname, config in variants:
        model, params = build_model(n, config)
        for w, h, label in ((720, 480, "480x720"), (1920, 1080, "1080x1920")):
            run_camera(model, params, w, h, f"{label} [{vname}]")

    model, params = build_model(n, SplatADConfig())
    run_lidar(model, params)
    print("done", flush=True)


if __name__ == "__main__":
    main()
