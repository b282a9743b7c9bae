"""1080x1920 SplatAD render cap sweep with quality gates (VERDICT r4 #5).

For (max_per_tile, max_visible_gaussians) candidates: tuned FPS at sensor
resolution + PSNR vs the uncapped default render on the same pose + overflow
counters. The per-pixel composite cost is ~linear in K (=max_per_tile), so
K is the lever; the PSNR gate keeps it honest (a cap that clips visible
gaussians must show up as PSNR loss / nonzero counters, the two-regime gate
idea from tests/models/test_splatad.py:237-304).

Usage: python benchmarks/render_1080_sweep.py [n_gaussians]
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


def _fetch(x):
    return float(jnp.sum(x))


def build(n, config, rng):
    means = rng.uniform(-40, 40, size=(n, 3)).astype(np.float32)
    means[:, 2] *= 0.2
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    print(f"devices: {jax.devices()}  n={n}", flush=True)
    w, h = 1920, 1080
    Kmat = jnp.array([[0.7 * w, 0, w / 2], [0, 0.7 * w, h / 2], [0, 0, 1.0]])
    c2ws = jnp.tile(jnp.eye(4)[None, :3], (K_CHAIN, 1, 1))
    c2ws = c2ws.at[:, 0, 3].set(jnp.linspace(0.0, 2.0, K_CHAIN))
    c2ws = c2ws.at[:, 2, 3].set(-50.0)

    def render_one(model, params, c2w):
        return model.apply(
            params, c2w, Kmat, w, h, jnp.zeros(()), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32), method=SplatADModel.get_camera_outputs,
        )

    def fps(model, params):
        @jax.jit
        def chain(params, c2ws):
            def body(i, s):
                o = render_one(model, params, c2ws[i])
                return s + jnp.sum(o["rgb"][::97, ::97])
            return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

        _fetch(chain(params, c2ws))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _fetch(chain(params, c2ws))
            best = min(best, time.perf_counter() - t0)
        return K_CHAIN / best

    seed_rng = lambda: np.random.default_rng(0)
    model_ref, params_ref = build(n, SplatADConfig(), seed_rng())
    ref_rgb = render_one(model_ref, params_ref, c2ws[0])["rgb"]

    print(f"  default (uncapped)           : {fps(model_ref, params_ref):6.1f} FPS", flush=True)

    for mpt, mv in [(128, 128 * 1024), (96, 128 * 1024), (64, 128 * 1024), (64, 96 * 1024), (48, 96 * 1024)]:
        model, params = build(n, SplatADConfig(max_visible_gaussians=mv, max_per_tile=mpt), seed_rng())
        f = fps(model, params)
        o = render_one(model, params, c2ws[0])
        mse = float(jnp.mean((o["rgb"] - ref_rgb) ** 2))
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        print(
            f"  K={mpt:3d} vis={mv//1024:3d}k : {f:6.1f} FPS  psnr_vs_default={psnr:6.1f} dB  "
            f"dropped={int(o['binning_dropped_pairs'])} cropped={int(o['binning_cropped_gaussians'])} "
            f"culled={int(o['binning_culled_visible'])}",
            flush=True,
        )
    print("done", flush=True)


if __name__ == "__main__":
    main()
