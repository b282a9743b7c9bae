"""Decompose the NeuRAD train step cost on the real TPU, piece by piece, in one
process (the tunnel is flaky — every case is try/except'd and flushed).

Pieces at real shapes (chunk 4096 rays):
  A. hash encode fwd / fwd+bwd: static field (4096x32 samples, 8 levels) and
     proposal field (4096x128, 6 levels)
  B. proposal sampling machinery alone (sorts, searchsorted, PDF resampling)
  C. full NFF forward for one chunk
  D. full train step at chunk 0 / 4096 / 16384
"""

import os
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K_CHAIN = 4
_overhead = 0.0


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def timeit(fn, *args, reps=3):
    fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - _overhead, 1e-9) / K_CHAIN


def guard(name, fn):
    try:
        t = fn()
        print(f"  {name:52s} {t*1e3:9.1f} ms", flush=True)
    except Exception as e:
        print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
        traceback.print_exc(limit=1)


def main():
    global _overhead
    print(f"devices: {jax.devices()}", flush=True)
    f = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8, 128))
    fetch(f(x0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); fetch(f(x0)); ts.append(time.perf_counter() - t0)
    _overhead = min(ts)
    print(f"dispatch overhead: {_overhead*1e3:.1f} ms", flush=True)

    from neurad_tpu.ops import hash_encoding as he

    key = jax.random.PRNGKey(0)

    # ---- A. hash encode at real shapes
    def hash_case(n_pts, levels, log2_size, fdim, corners, label):
        table_size = max(2**log2_size // corners, 1)
        table = jax.random.normal(key, (levels * table_size, fdim * corners)) * 1e-3
        scales = jnp.asarray(he.level_scales(levels, 32, 8192))
        pos = jax.random.uniform(key, (n_pts, 1, 3))

        @jax.jit
        def fwd(table, pos):
            def body(i, s):
                out = he.hash_encode(pos + i * 1e-5, table, scales, table_size, cell_packed=True)
                return s + jnp.sum(out)
            return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

        g = jax.grad(lambda t, p: jnp.sum(he.hash_encode(p, t, scales, table_size, cell_packed=True) ** 2))

        @jax.jit
        def fwdbwd(table, pos):
            def body(i, s):
                return s + jnp.sum(g(table, pos + i * 1e-5))
            return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

        guard(f"hash fwd {label}", lambda: timeit(fwd, table, pos))
        guard(f"hash fwd+bwd {label}", lambda: timeit(fwdbwd, table, pos))

    hash_case(4096 * 32, 8, 22, 4, 8, "static (131k pts, 8L, 2^22)")
    hash_case(4096 * 128, 6, 20, 1, 8, "prop1 (524k pts, 6L, 2^20)")
    hash_case(4096 * 64, 6, 20, 1, 8, "prop2 (262k pts, 6L, 2^20)")

    # ---- B/C/D: pipeline pieces
    from neurad_tpu.data.datamanager import ADDataManagerConfig
    from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig
    from neurad_tpu.models.neurad import NeuRADModel, SamplingSettings
    from neurad_tpu.pipelines.ad_pipeline import ADPipeline, ADPipelineConfig
    from neurad_tpu.core.structs import tree_getitem

    parser = SyntheticDataParserConfig(num_frames=10, image_height=192, image_width=288).setup()
    outputs = parser.get_dataparser_outputs()

    def build(chunk):
        return ADPipeline(outputs, ADPipelineConfig(
            datamanager=ADDataManagerConfig(num_cam_patches=20, patch_size=32, num_lidar_rays=8192),
            model_overrides=dict(sampling=SamplingSettings()),
            train_ray_chunk=chunk,
        ))

    pipe = build(4096)
    state, tx = pipe.init_state()
    b = pipe.datamanager.next_train()
    chunk_bundle = tree_getitem(b[0], slice(0, 4096))

    # B: sampling machinery only
    @jax.jit
    def sampling_only(params, bundle):
        def body(i, s):
            rs, pw, ps = pipe.model.apply(
                params, bundle.replace(origins=bundle.origins + i * 1e-5), None,
                method=NeuRADModel._get_ray_samples,
            )
            return s + jnp.sum(rs.frustums.starts)
        return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

    guard("proposal sampling only (4096 rays)", lambda: timeit(sampling_only, state.params, chunk_bundle))

    # C: full NFF forward, one chunk
    @jax.jit
    def nff_chunk(params, bundle):
        def body(i, s):
            out = pipe.model.apply(
                params, bundle.replace(origins=bundle.origins + i * 1e-5), 0, False, None,
                method=NeuRADModel.get_nff_outputs,
            )
            return s + jnp.sum(out["features"])
        return jax.lax.fori_loop(0, K_CHAIN, body, jnp.float32(0))

    guard("NFF forward (one 4096-ray chunk)", lambda: timeit(nff_chunk, state.params, chunk_bundle))

    # D: full steps at several chunkings
    for chunk in (0, 16384):
        def case(chunk=chunk):
            p = build(chunk)
            s, tx2 = p.init_state()
            step = p.make_train_step(tx2)
            bb = p.datamanager.next_train()
            t0 = time.perf_counter()
            s, m = step(s, *bb)
            fetch(m["total_loss"])
            compile_t = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                s, m = step(s, *bb)
                fetch(m["total_loss"])
                ts.append(time.perf_counter() - t0)
            t = min(ts) - _overhead
            n = bb[0].origins.shape[0]
            print(f"  full step chunk={chunk}: {t*1e3:.0f} ms ({n/t:.0f} rays/s), compile {compile_t:.0f}s", flush=True)
            return None
        try:
            case()
        except Exception as e:
            print(f"  full step chunk={chunk} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
