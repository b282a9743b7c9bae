"""Focused A/B at EXACT round-4 train shapes: baseline scatter-add vs exact
sorted-run dedup for one hashed level ([524288, 32] bf16 accumulator,
1,835,008 update rows) and the dense 33^3 level ([35937, 32] fp32).

The dedup sorts (bucket, packed-w, packed-g) with a narrow u32 payload, builds
the updates IN SORTED ORDER from the sorted w/g (so no 112 MB permute-gather),
then takes per-run totals as consecutive differences of the cumsum at run
boundaries and scatters <= n_unique rows.

Usage: python benchmarks/dedup_focus.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1_835_008
C, F = 8, 4
F_ROW = C * F


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def chain(body, reps=8):
    @jax.jit
    def run(*args):
        def it(i, s):
            outs = body(*args, i)
            return s + sum(jnp.sum(o[..., 0].astype(jnp.float32)) for o in jax.tree_util.tree_leaves(outs))

        return lax.fori_loop(0, reps, it, jnp.float32(0))

    return run, reps


def timeit(name, body, *args, rows=N):
    run, reps = chain(body)
    fetch(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(run(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / reps
    print(f"{name:44s} {per * 1e3:8.2f} ms  {rows / per / 1e6:7.1f} M rows/s", flush=True)
    return per


def dedup(bucket, w, g, i, n_rows, accum_dtype):
    """Exact sorted-run dedup: payload = packed w (4xu32) + g (2xu32)."""
    n = bucket.shape[0]
    wp = lax.bitcast_convert_type(w.reshape(n, C // 2, 2), jnp.uint32)  # [n, 4]
    gp = lax.bitcast_convert_type(g.reshape(n, F // 2, 2), jnp.uint32)  # [n, 2]
    ops = lax.sort(
        (bucket ^ (i % 2), *(wp[:, k] for k in range(C // 2)), *(gp[:, k] for k in range(F // 2))),
        num_keys=1, is_stable=False,
    )
    sb = ops[0]
    ws = lax.bitcast_convert_type(jnp.stack(ops[1 : 1 + C // 2], axis=-1), jnp.bfloat16).reshape(n, C)
    gs = lax.bitcast_convert_type(jnp.stack(ops[1 + C // 2 :], axis=-1), jnp.bfloat16).reshape(n, F)
    # updates in sorted order, 2-D slices only
    upd = jnp.concatenate([ws[:, c : c + 1] * gs for c in range(C)], axis=-1)  # [n, 32] bf16
    csum = jnp.cumsum(upd.astype(jnp.float32), axis=0)
    is_last = jnp.concatenate([sb[:-1] != sb[1:], jnp.ones((1,), bool)])
    n_last = jnp.cumsum(is_last.astype(jnp.int32))
    u = min(n, n_rows)
    ks = jnp.arange(1, u + 1, dtype=jnp.int32)
    pos = jnp.clip(jnp.searchsorted(n_last, ks), 0, n - 1)
    valid = ks <= n_last[-1]
    key_u = jnp.where(valid, sb[pos], n_rows)
    csum_u = csum[pos]
    prev = jnp.concatenate([jnp.zeros((1, F_ROW), csum.dtype), csum_u[:-1]], axis=0)
    g_u = jnp.where(valid[:, None], csum_u - prev, 0.0)
    return (jnp.zeros((n_rows + 1, F_ROW), accum_dtype).at[key_u].add(g_u.astype(accum_dtype))[:n_rows],)


def main():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (N, C), jnp.bfloat16)
    g = jax.random.normal(key, (N, F), jnp.bfloat16)

    for name, n_rows, accum_dtype, idx_kind in (
        ("hashed level (524288 buckets, bf16 acc)", 524288, jnp.bfloat16, "random"),
        ("dense 33^3 level (35937 buckets, f32 acc)", 35937, jnp.float32, "ray-coherent"),
    ):
        if idx_kind == "random":
            bucket = jax.random.randint(key, (N,), 0, n_rows, jnp.int32)
        else:
            # ray-coherent: 32 consecutive samples walk ~8 distinct cells
            ray = jnp.arange(N, dtype=jnp.int32) // 32
            step = (jnp.arange(N, dtype=jnp.int32) % 32) // 4
            bucket = ((ray * 7919 + step * 31) % n_rows).astype(jnp.int32)

        def base(bucket, w, g, i, n_rows=n_rows, accum_dtype=accum_dtype):
            upd = jnp.concatenate([w[:, c : c + 1] * g for c in range(C)], axis=-1)
            return (jnp.zeros((n_rows, F_ROW), accum_dtype).at[bucket ^ (i % 2)].add(upd.astype(accum_dtype)),)

        print(f"== {name}", flush=True)
        timeit("  baseline scatter-add", base, bucket, w, g)
        got = dedup(bucket, w, g, 0, n_rows, jnp.float32)[0]
        ref = base(bucket, w.astype(jnp.float32), g.astype(jnp.float32), 0)[0].astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"  dedup correctness max abs err: {err:.3e}", flush=True)
        body = lambda b, w_, g_, i, nr=n_rows, ad=accum_dtype: dedup(b, w_, g_, i, nr, ad)
        timeit("  sorted-run dedup", body, bucket, w, g)


if __name__ == "__main__":
    import functools

    # bind the loop-carried i properly for timeit's body(*args, i) signature
    main()
