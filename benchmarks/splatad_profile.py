"""Phase profiling of the SplatAD camera step on the real TPU: where do the
570 ms go (binning sort? compositing forward? backward?), and does the Pallas
compositor win once measured honestly (amortized, forced fetch)?"""

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
K_CHAIN = 4


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


_overhead = 0.0


def timeit(fn, *args, reps=3):
    fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - _overhead, 1e-9) / K_CHAIN


def report(name, secs):
    print(f"  {name:44s} {secs*1e3:9.1f} ms", flush=True)


def main():
    global _overhead
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    f = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8, 128))
    fetch(f(x0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); fetch(f(x0)); ts.append(time.perf_counter() - t0)
    _overhead = min(ts)
    print(f"dispatch overhead: {_overhead*1e3:.1f} ms", flush=True)

    k1, k2, k3, k4 = jax.random.split(key, 4)
    means = jax.random.uniform(k1, (N, 3), minval=-40, maxval=40).at[:, 2].mul(0.2)
    quats = jnp.zeros((N, 4)).at[:, 0].set(1.0)
    scales = jnp.full((N, 3), jnp.log(0.2))
    opac = jax.random.uniform(k2, (N,), minval=0.1, maxval=0.9)
    feats = jax.random.uniform(k3, (N, 16))
    viewmat = jnp.eye(4).at[2, 3].set(-50.0)
    Kmat = jnp.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]])

    def project(means, scales):
        covar6 = G.quat_scale_to_covar6(quats, jnp.exp(scales))
        return G.project_gaussians_camera(
            means, covar6=covar6, viewmat=viewmat, K=Kmat, width=W, height=H
        )

    # --- phase: projection + binning only
    @jax.jit
    def bin_only(means, scales):
        def body(i, s):
            proj = project(means + i * 1e-4, scales)
            b = GR.bin_gaussians(
                proj.means2d, proj.radii, proj.depths, (0.0, 0.0), (16.0, 16.0),
                (-(-W // 16), -(-H // 16)), 16, 256,
            )
            return s + jnp.sum(b.tile_gauss[:, 0])
        return jax.lax.fori_loop(0, K_CHAIN, body, jnp.int64(0) if False else jnp.int32(0))

    report("project + bin_gaussians", timeit(bin_only, means, scales))

    # --- phase: full forward (per backend)
    def make_fwd(backend):
        @jax.jit
        def fwd(means, scales):
            def body(i, s):
                proj = project(means + i * 1e-4, scales)
                img, dep, al = GR.rasterize_camera(proj, feats, opac, W, H, backend=backend)
                return s + jnp.sum(img)
            return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))
        return fwd

    # --- phase: forward + backward (per backend)
    def make_fwdbwd(backend):
        def loss(means, scales, i):
            proj = project(means + i * 1e-4, scales)
            img, dep, al = GR.rasterize_camera(proj, feats, opac, W, H, backend=backend)
            return jnp.sum(img ** 2)

        g = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def fb(means, scales):
            def body(i, s):
                gm, gs = g(means, scales, i)
                return s + jnp.sum(gm) + jnp.sum(gs)
            return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))
        return fb

    for backend in ("xla", "pallas", "hybrid"):
        try:
            report(f"forward ({backend})", timeit(make_fwd(backend), means, scales))
        except Exception as e:
            print(f"  forward ({backend}) FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        try:
            report(f"forward+backward ({backend})", timeit(make_fwdbwd(backend), means, scales))
        except Exception as e:
            print(f"  forward+backward ({backend}) FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

    # --- lidar rasterization fwd+bwd (65k query points)
    M = 65536
    k5 = jax.random.PRNGKey(9)
    pts = jnp.stack([
        jax.random.uniform(k5, (M,), minval=-180, maxval=180),
        jax.random.uniform(k5, (M,), minval=-20, maxval=10),
        jax.random.uniform(k5, (M,), minval=3, maxval=60),
        jnp.zeros((M,)),
    ], axis=-1)

    def make_lidar(raster_fn, **kw):
        def lidar_loss(means, scales, i):
            covar6 = G.quat_scale_to_covar6(quats, jnp.exp(scales))
            proj = G.project_gaussians_lidar(means + i * 1e-4, covar6=covar6, viewmat=jnp.eye(4))
            out = raster_fn(proj, feats, opac, pts, max_per_tile=128, **kw)
            return jnp.sum(out["features"] ** 2) + jnp.sum(out["alpha_sum_until_points"])

        gl = jax.grad(lidar_loss, argnums=(0, 1))

        @jax.jit
        def lidar_fb(means, scales):
            def body(i, s):
                gm, gs = gl(means, scales, i)
                return s + jnp.sum(gm) + jnp.sum(gs)
            return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))
        return lidar_fb

    for name, fn, kw in (
        ("lidar fwd+bwd per-point (65k pts)", GR.rasterize_lidar_points, {}),
        ("lidar fwd+bwd tiled hybrid", GR.rasterize_lidar_points_tiled, {"pts_per_tile": 128, "backend": "hybrid"}),
        ("lidar fwd+bwd tiled pallas", GR.rasterize_lidar_points_tiled, {"pts_per_tile": 128, "backend": "pallas"}),
    ):
        try:
            report(name, timeit(make_lidar(fn, **kw), means, scales))
        except Exception as e:
            print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
