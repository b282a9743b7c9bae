"""Phase breakdown of the tuned SplatAD camera render path on the real TPU:
project only, project+bin (with frustum cull), full rasterize, full model."""

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

from neurad_tpu.ops import gaussian_rasterize as GR
from neurad_tpu.ops import gaussians as G

N = 500_000
W, H = 720, 480
K_CHAIN = 8
CULL = 128 * 1024


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


def report(name, secs):
    print(f"  {name:44s} {secs*1e3:9.1f} ms", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    means = jax.random.uniform(k1, (N, 3), minval=-40, maxval=40).at[:, 2].mul(0.2)
    quats = jnp.zeros((N, 4)).at[:, 0].set(1.0)
    scales = jnp.full((N, 3), jnp.log(0.2))
    opac = jax.random.uniform(k2, (N,), minval=0.1, maxval=0.9)
    feats = jax.random.uniform(k3, (N, 16))
    viewmat = jnp.eye(4).at[2, 3].set(-50.0)
    Kmat = jnp.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]])

    def project(means, i):
        covar6 = G.quat_scale_to_covar6(quats, jnp.exp(scales))
        return G.project_gaussians_camera(
            means + i * 1e-4, covar6=covar6, viewmat=viewmat, K=Kmat, width=W, height=H
        )

    @jax.jit
    def proj_only(means):
        def body(i, s):
            p = project(means, i)
            return s + jnp.sum(p.means2d[::511])
        return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

    report("project only", timeit(proj_only, means))

    for mv in (0, CULL):
        @jax.jit
        def bin_only(means, mv=mv):
            def body(i, s):
                p = project(means, i)
                b = GR.bin_gaussians(
                    p.means2d, p.radii, p.depths, (0.0, 0.0), (16.0, 16.0),
                    (-(-W // 16), -(-H // 16)), 16, 256, max_visible=mv,
                )
                return s + jnp.sum(b.tile_gauss[:, 0])
            return jax.lax.fori_loop(0, K_CHAIN, body, jnp.int32(0))

        report(f"project + bin (max_visible={mv})", timeit(bin_only, means))

    for mv, k in ((0, 256), (CULL, 256), (CULL, 128)):
        @jax.jit
        def fwd(means, mv=mv, k=k):
            def body(i, s):
                p = project(means, i)
                img, dep, al = GR.rasterize_camera(
                    p, feats, opac, W, H, backend="xla", max_per_tile=k, max_visible=mv,
                )
                return s + jnp.sum(img[::97, ::97])
            return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

        report(f"full forward (max_visible={mv}, K={k})", timeit(fwd, means))


if __name__ == "__main__":
    main()
