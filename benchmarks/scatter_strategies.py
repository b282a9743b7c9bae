"""Microbenchmark: strategies for the hash-table gradient scatter-add on TPU.

The hash-encoding backward is `zeros((T, F)).at[idx].add(g)` per level — at
NeuRAD shapes (3.1M update rows into a 131072x8 fp32 accumulator per proposal
field) this runs at ~68M rows/s and is the single largest piece of the train
step. Candidates:
  A. baseline .at[].add (fp32)
  B. bf16 accumulator
  C. K-split partial accumulators + sum (breaks any serial dependency)
  D. sort by index + scatter with indices_are_sorted=True
  E. sort + segment_sum
  F. [T,F] accumulate via transposed layout [F,T] (minor-dim scatter)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

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
        print(f"  {name:46s} {t*1e3:8.2f} ms  {rows/t/1e6:8.1f} M rows/s", flush=True)
    except Exception as e:
        print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)


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
    # prop1 shape: 524k samples x 6 levels -> per-level 524k rows, T=131072, F=8
    N, T, F = 524288, 131072, 8
    L = 6
    idx = jax.random.randint(key, (L, N), 0, T)
    g = jax.random.normal(key, (L, N, F), dtype=jnp.float32)

    def chain(body):
        @jax.jit
        def run(idx, g):
            def it(i, s):
                out = body(idx, g, i)
                return s + jnp.sum(out[0].astype(jnp.float32))
            return jax.lax.fori_loop(0, K_CHAIN, it, jnp.float32(0))
        return run

    rows = L * N

    # A. baseline per-level fp32
    def base(idx, g, i):
        outs = [jnp.zeros((T, F), jnp.float32).at[idx[l] ^ i].add(g[l]) for l in range(L)]
        return outs
    guard("A baseline .at[].add fp32 per-level", lambda: timeit(chain(base), idx, g), rows)

    # B. bf16 accumulator
    def bf16acc(idx, g, i):
        outs = [jnp.zeros((T, F), jnp.bfloat16).at[idx[l] ^ i].add(g[l].astype(jnp.bfloat16)) for l in range(L)]
        return outs
    guard("B bf16 accumulator", lambda: timeit(chain(bf16acc), idx, g), rows)

    # C. K-split partials (K=4) then sum
    def ksplit(idx, g, i, K=4):
        outs = []
        for l in range(L):
            ii = (idx[l] ^ i).reshape(K, -1)
            gg = g[l].reshape(K, -1, F)
            acc = jnp.zeros((K, T, F), jnp.float32)
            acc = acc.at[jnp.arange(K)[:, None], ii].add(gg)
            outs.append(acc.sum(0))
        return outs
    guard("C K=4 split partials + sum", lambda: timeit(chain(ksplit), idx, g), rows)

    # C2. vmap form
    def ksplit_vmap(idx, g, i, K=8):
        outs = []
        for l in range(L):
            ii = (idx[l] ^ i).reshape(K, -1)
            gg = g[l].reshape(K, -1, F)
            acc = jax.vmap(lambda a, b: jnp.zeros((T, F), jnp.float32).at[a].add(b))(ii, gg)
            outs.append(acc.sum(0))
        return outs
    guard("C2 K=8 vmapped partials + sum", lambda: timeit(chain(ksplit_vmap), idx, g), rows)

    # D. sort + scatter sorted
    from jax import lax
    def sorted_scatter(idx, g, i):
        outs = []
        dnums = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        for l in range(L):
            ii = idx[l] ^ i
            si, sg = lax.sort_key_val(ii, g[l])
            out = lax.scatter_add(
                jnp.zeros((T, F), jnp.float32), si[:, None], sg, dnums,
                indices_are_sorted=True, unique_indices=False)
            outs.append(out)
        return outs
    guard("D sort + scatter(sorted=True)", lambda: timeit(chain(sorted_scatter), idx, g), rows)

    # E. sort + segment_sum
    def seg(idx, g, i):
        outs = []
        for l in range(L):
            ii = idx[l] ^ i
            si, sg = lax.sort_key_val(ii, g[l])
            out = jax.ops.segment_sum(sg, si, num_segments=T, indices_are_sorted=True)
            outs.append(out)
        return outs
    guard("E sort + segment_sum(sorted)", lambda: timeit(chain(seg), idx, g), rows)

    # F. all levels in ONE scatter against [L*T, F]
    def onebig(idx, g, i):
        off = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
        ii = (idx ^ i) + off
        out = jnp.zeros((L * T, F), jnp.float32).at[ii.reshape(-1)].add(g.reshape(-1, F))
        return (out,)
    guard("F one fused all-level scatter (6.3M rows, 4MB x6)", lambda: timeit(chain(onebig), idx, g), rows)

    # G. smaller updates dtype: bf16 updates into fp32 acc
    def bfup(idx, g, i):
        gb = g.astype(jnp.bfloat16)
        outs = [jnp.zeros((T, F), jnp.float32).at[idx[l] ^ i].add(gb[l]) for l in range(L)]
        return outs
    guard("G bf16 updates -> fp32 acc", lambda: timeit(chain(bfup), idx, g), rows)

    print("done", flush=True)


if __name__ == "__main__":
    main()
