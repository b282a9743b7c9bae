"""Microbenchmark: static-field hash-table traffic strategies at REAL shapes.

Round-2 trace: the static field's backward scatter-add (~108 ms) and forward
gathers (~90 ms) are the two largest remaining pieces of the NeuRAD train step.
Static field: 8 levels, cell-packed rows T=2^22/8=524288, F=4*8=32 features,
N=917504 cell rows per level per pass.

Per-level operand sizes: bf16 table slice 33.5 MB (gather), bf16 accumulator
33.5 MB / fp32 67 MB (scatter). The measured operand-size cliff (~8 MB = VMEM
scale) motivates feature-split and sorted-write strategies.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K_CHAIN = 8
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


def guard(name, fn, rows):
    try:
        t = fn()
        print(f"  {name:52s} {t*1e3:8.2f} ms  {rows/t/1e6:8.1f} M rows/s", flush=True)
    except Exception as e:
        print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


def chain(body):
    @jax.jit
    def run(idx, g):
        def it(i, s):
            out = body(idx, g, i)
            return s + jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
        return lax.fori_loop(0, K_CHAIN, it, jnp.float32(0))
    return run


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
    # ONE static level at trace shapes (multiply results by 8 levels)
    N, T, F = 917504, 524288, 32
    idx = jax.random.randint(key, (N,), 0, T)
    g = jax.random.normal(key, (N, F), dtype=jnp.bfloat16)
    table = jax.random.normal(key, (T, F), dtype=jnp.float32)

    print(f"one static level: N={N} T={T} F={F} (x8 levels per step)", flush=True)

    # ---------------- scatter strategies ----------------
    def s_base_bf16(idx, g, i):
        return jnp.zeros((T, F), jnp.bfloat16).at[idx ^ i].add(g)
    guard("S-A scatter bf16 33MB acc (current)", lambda: timeit(chain(s_base_bf16), idx, g), N)

    def s_fsplit2(idx, g, i):
        outs = [jnp.zeros((T, F // 2), jnp.bfloat16).at[idx ^ i].add(g[:, c * 16:(c + 1) * 16]) for c in range(2)]
        return outs
    guard("S-B scatter bf16 2x16MB feature-split", lambda: timeit(chain(s_fsplit2), idx, g), N)

    def s_fsplit4(idx, g, i):
        outs = [jnp.zeros((T, F // 4), jnp.bfloat16).at[idx ^ i].add(g[:, c * 8:(c + 1) * 8]) for c in range(4)]
        return outs
    guard("S-C scatter bf16 4x8MB feature-split", lambda: timeit(chain(s_fsplit4), idx, g), N)

    def s_sorted(idx, g, i):
        kb = jnp.broadcast_to((idx ^ i)[:, None], (N, F))
        ks, gs = lax.sort((kb, g), dimension=0, num_keys=1, is_stable=False)
        dnums = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,), scatter_dims_to_operand_dims=(0,))
        return lax.scatter_add(jnp.zeros((T, F), jnp.bfloat16), ks[:, :1], gs, dnums,
                               indices_are_sorted=True, unique_indices=False)
    guard("S-D colsort + scatter(sorted)", lambda: timeit(chain(s_sorted), idx, g), N)

    def s_seg(idx, g, i):
        kb = jnp.broadcast_to((idx ^ i)[:, None], (N, F))
        ks, gs = lax.sort((kb, g), dimension=0, num_keys=1, is_stable=False)
        return jax.ops.segment_sum(gs, ks[:, 0], num_segments=T, indices_are_sorted=True)
    guard("S-E colsort + segment_sum(sorted)", lambda: timeit(chain(s_seg), idx, g), N)

    def s_sort_perm(idx, g, i):
        pos = jnp.arange(N, dtype=jnp.int32)
        ks, ps = lax.sort_key_val(idx ^ i, pos, is_stable=False)
        gs = jnp.take(g, ps, axis=0)  # gather from 59MB operand
        return jax.ops.segment_sum(gs, ks, num_segments=T, indices_are_sorted=True)
    guard("S-F permsort + take + segsum", lambda: timeit(chain(s_sort_perm), idx, g), N)

    # ---------------- gather strategies ----------------
    def g_base(idx, g, i):
        return jnp.take(table.astype(jnp.bfloat16), idx ^ i, axis=0)
    guard("G-A gather bf16 33MB (current)", lambda: timeit(chain(g_base), idx, g), N)

    def g_fsplit(idx, g, i):
        tb = table.astype(jnp.bfloat16)
        return [jnp.take(tb[:, c * 8:(c + 1) * 8], idx ^ i, axis=0) for c in range(4)]
    guard("G-B gather bf16 4x8MB feature-split", lambda: timeit(chain(g_fsplit), idx, g), N)

    def g_sorted(idx, g, i):
        pos = jnp.arange(N, dtype=jnp.int32)
        ks, ps = lax.sort_key_val(idx ^ i, pos, is_stable=False)
        rows = jnp.take(table.astype(jnp.bfloat16), ks, axis=0)  # sorted = coherent rows
        return jnp.zeros((N, F), jnp.bfloat16).at[ps].set(rows)
    guard("G-C sort idx + coherent gather + unscatter", lambda: timeit(chain(g_sorted), idx, g), N)

    print("done", flush=True)


if __name__ == "__main__":
    main()
