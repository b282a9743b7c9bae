"""Microbenchmark: sharded scatter-add at the REAL static-field backward shapes.

Current production (`_gather_levels_multi_bwd`): per hashed static level,
scatter 917k PHYSICAL-row updates [N, 512] into a [262144, 512] bf16
accumulator (268 MB). Measured floor ~69 M rows/s -> 13.4 ms/level, 80 ms/step.

Hypothesis (from scatter_matmul.py): scatter rate is a function of ACCUMULATOR
SIZE (4 MB -> ~400 M rows/s, >=16 MB -> ~68 M rows/s), and lax.sort with the
payload riding along runs at 1.4-3 G rows/s. So:
  bucket-view + sort-routed shards:
    1. updates as [N, 32] bucket rows (idx = bucket id in [0, 4.2M))
    2. sort (key, 16x packed-bf16 payload cols)
    3. searchsorted shard boundaries; per shard a contiguous dynamic_slice
       window (cap = mean + 8 sigma, uniform hash keys -> Poisson-tight)
    4. 64 independent scatters into [65536, 32] bf16 shards (4 MB each)
    5. concat + reshape back to physical [262144, 512]
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K_CHAIN = 8
_overhead = 0.0


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, reps=3):
    fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - _overhead, 1e-9) / K_CHAIN


def guard(name, fn, rows):
    try:
        t = fn()
        print(f"  {name:58s} {t*1e3:8.2f} ms  {rows/t/1e6:8.1f} M rows/s", flush=True)
    except Exception as e:
        print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)


def chain(body):
    # Fold EVERY output leaf into the carry — reducing only leaves[0] lets XLA
    # DCE the rest (5 of 6 levels in E/F, payload sort columns in D).
    @jax.jit
    def run(*args):
        def it(i, s):
            out = body(*args, i)
            return s + sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out)
            )
        return lax.fori_loop(0, K_CHAIN, it, jnp.float32(0))
    return run


def sharded_scatter(idx, g, n_rows, n_shards, cap, accum_dtype=jnp.bfloat16):
    """sort-routed sharded scatter-add: [N] idx, [N, F] g -> [n_rows, F].

    CAVEAT (do not port as-is): updates beyond `cap` sorted rows per shard are
    SILENTLY DROPPED. cap = mean + 8 sigma is Poisson-tight only for uniform
    random keys; real hash-key distributions cluster and need an overflow
    check — production code must assert (ends - starts).max() <= cap (see
    `ops/hash_encoding.py`'s overflow telemetry pattern) or fall back.
    """
    N, F = g.shape
    gb = g.astype(jnp.bfloat16)
    packed = lax.bitcast_convert_type(gb.reshape(N, F // 2, 2), jnp.int32)  # [N, F/2]
    ops = lax.sort((idx, *[packed[:, i] for i in range(F // 2)]), num_keys=1, is_stable=False)
    si = ops[0]
    sg = lax.bitcast_convert_type(
        jnp.stack(ops[1:], axis=-1), jnp.bfloat16
    ).reshape(N, F)
    rows_per = n_rows // n_shards
    starts = jnp.searchsorted(si, jnp.arange(n_shards, dtype=si.dtype) * rows_per)
    ends = jnp.concatenate([starts[1:], jnp.array([N], starts.dtype)])
    si_p = jnp.concatenate([si, jnp.full((cap,), n_rows, si.dtype)])
    sg_p = jnp.concatenate([sg, jnp.zeros((cap, F), sg.dtype)])
    iota_c = jnp.arange(cap, dtype=jnp.int32)
    parts = []
    for s in range(n_shards):  # unrolled: independent scatters overlap in XLA
        st = starts[s]
        k = lax.dynamic_slice(si_p, (st,), (cap,))
        v = lax.dynamic_slice(sg_p, (st, 0), (cap, F))
        valid = (st + iota_c) < ends[s]
        local = jnp.where(valid, k - s * rows_per, rows_per)  # sentinel row
        local = jnp.clip(local, 0, rows_per)
        parts.append(
            jnp.zeros((rows_per + 8, F), accum_dtype).at[local].add(v.astype(accum_dtype))[:rows_per]
        )
    return jnp.concatenate(parts, axis=0)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    global _overhead
    f = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros((8, 128))
    fetch(f(x0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); fetch(f(x0)); ts.append(time.perf_counter() - t0)
    _overhead = min(ts)
    print(f"dispatch overhead: {_overhead*1e3:.1f} ms", flush=True)

    key = jax.random.PRNGKey(0)
    N = 917504                      # 28672 rays x 32 nerf samples
    BUCKETS, FB = 4194304, 32       # bucket view: 4.2M buckets x (8 corners x 4 feats)
    PHYS, FP = 262144, 512          # physical view: pack=16
    idx_b = jax.random.randint(key, (N,), 0, BUCKETS)
    g_b = jax.random.normal(key, (N, FB), dtype=jnp.float32)
    g_p = jax.random.normal(key, (N, FP), dtype=jnp.bfloat16)
    idx_p = idx_b // 16

    # correctness of sharded_scatter on small shapes
    sm_idx = jax.random.randint(key, (8192,), 0, 16384)
    sm_g = jax.random.normal(key, (8192, 8), dtype=jnp.float32)
    ref = jnp.zeros((16384, 8), jnp.bfloat16).at[sm_idx].add(sm_g.astype(jnp.bfloat16))
    got = sharded_scatter(sm_idx, sm_g, 16384, 8, cap=4096)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"correctness sharded vs .at[].add (bf16): {err:.2e}", flush=True)
    # overflow guard for the benchmark shapes: assert no shard exceeds its cap
    for n_shards, cap in ((32, None), (64, None), (128, None), (64, 15360)):
        if cap is None:
            mean = N / n_shards
            cap = int(np.ceil((mean + 8 * np.sqrt(mean) + 64) / 128) * 128)
        si = jnp.sort(idx_b)
        st = jnp.searchsorted(si, jnp.arange(n_shards, dtype=si.dtype) * (BUCKETS // n_shards))
        en = jnp.concatenate([st[1:], jnp.array([N], st.dtype)])
        worst = int(jnp.max(en - st))
        assert worst <= cap, f"shard overflow: {worst} > cap {cap} at n_shards={n_shards}"
    print("overflow check: all shard caps hold for these keys", flush=True)

    # A: current production — physical-row scatter, wide updates, 268MB bf16 acc
    def prod(idx, g, i):
        return jnp.zeros((PHYS, FP), jnp.bfloat16).at[idx ^ i].add(g)
    guard("A  production: [N,512]->268MB bf16 physical scatter", lambda: timeit(chain(prod), idx_p, g_p), N)

    # B: bucket-view scatter, narrow updates, same total acc bytes
    def bucket(idx, g, i):
        return jnp.zeros((BUCKETS, FB), jnp.bfloat16).at[idx ^ i].add(g.astype(jnp.bfloat16))
    guard("B  bucket view: [N,32]->268MB bf16 scatter", lambda: timeit(chain(bucket), idx_b, g_b), N)

    # C: sharded bucket view
    for n_shards in (32, 64, 128):
        mean = N / n_shards
        cap = int(np.ceil((mean + 8 * np.sqrt(mean) + 64) / 128) * 128)
        def sh(idx, g, i, n_shards=n_shards, cap=cap):
            return sharded_scatter(idx ^ i, g, BUCKETS, n_shards, cap)
        guard(
            f"C  sorted {n_shards}-shard bucket scatter (cap={cap})",
            lambda sh=sh: timeit(chain(sh), idx_b, g_b),
            N,
        )

    # D: components — payload sort alone (16 packed cols)
    def sort_only(idx, g, i):
        gb = g.astype(jnp.bfloat16)
        packed = lax.bitcast_convert_type(gb.reshape(N, FB // 2, 2), jnp.int32)
        return lax.sort((idx ^ i, *[packed[:, k] for k in range(FB // 2)]), num_keys=1, is_stable=False)
    guard("D  lax.sort key + 16 packed-bf16 cols", lambda: timeit(chain(sort_only), idx_b, g_b), N)

    # E: 6 levels of C overlapped (the real step has 6 independent hashed levels)
    def six(idx, g, i):
        outs = []
        for l in range(6):
            outs.append(sharded_scatter(idx ^ (i * 8 + l), g, BUCKETS, 64, 15360))
        return tuple(outs)
    guard("E  6 levels x 64-shard (full static bwd)", lambda: timeit(chain(six), idx_b, g_b), 6 * N)

    def six_prod(idx, g, i):
        outs = []
        for l in range(6):
            outs.append(jnp.zeros((PHYS, FP), jnp.bfloat16).at[idx ^ (i * 8 + l)].add(g))
        return tuple(outs)
    guard("F  6 levels production physical scatter", lambda: timeit(chain(six_prod), idx_p, g_p), 6 * N)

    print("done", flush=True)


if __name__ == "__main__":
    main()
