"""Microbenchmark: MXU-based scatter-add for hash-table gradients.

PERFORMANCE.md measured XLA scatter-add at a flat ~14.6 ns/row (serialized
conflict-safe RMW) — the last structural cost in the NeuRAD train step
(~106 ms/step). Sorting doubles the scatter rate but the random payload
permute costs more than it saves. This benchmark tests a different escape:

  H. sort (key, payload) together -> per-tile contiguous windows of the
     sorted stream (windowed gather = sequential access, not random) ->
     one-hot [cap, R] x [cap, F] matmuls on the MXU, batched over tiles.
     The scatter becomes a dense contraction; the only serial-ish cost left
     is the bitonic sort (measured 664 M keys/s keys-only).

Strategies measured at the real prop-field shape (N=3.1M rows, T=131072, F=8):
  A  baseline .at[].add fp32                       (the current floor)
  H0 sort_key_val with [N,F] fp32 payload          (is payload sort cheap?)
  H0b sort keys + iota, then gather payload        (the known-bad permute)
  H1 full H pipeline (sort + windows + matmul)
  H2 H1 with bf16 one-hot/window compute
"""

import os
import sys
import time
from functools import partial

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
    # Fold EVERY output leaf into the carry: reducing only leaves[0] lets XLA
    # DCE the other outputs (e.g. 5 of 6 per-level scatters, or the payload
    # columns of a sort), silently inflating the measured rate.
    @jax.jit
    def run(idx, g):
        def it(i, s):
            out = body(idx, g, i)
            return s + sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out)
            )
        return lax.fori_loop(0, K_CHAIN, it, jnp.float32(0))
    return run


def tile_matmul_scatter(idx, g, T, R, cap, compute_dtype=jnp.float32, tile_batch=32):
    """Sorted-window one-hot matmul scatter-add: returns [T, F] fp32."""
    n_tiles = T // R
    F = g.shape[-1]
    # payload rides the sort: lax.sort with F+1 equal-shape [N] operands
    sorted_ops = lax.sort((idx, *[g[:, i] for i in range(F)]), num_keys=1, is_stable=False)
    si = sorted_ops[0]
    sg = jnp.stack(sorted_ops[1:], axis=-1)
    # window start per tile: first sorted position with key >= t*R
    starts = jnp.searchsorted(si, jnp.arange(n_tiles, dtype=si.dtype) * R)
    ends = jnp.concatenate([starts[1:], jnp.array([idx.shape[0]], starts.dtype)])
    # pad the sorted stream so fixed-size windows never run off the end
    si_p = jnp.concatenate([si, jnp.full((cap,), T, si.dtype)])
    sg_p = jnp.concatenate([sg, jnp.zeros((cap, F), sg.dtype)])

    def tile_block(t0):
        ts = t0 * tile_batch + jnp.arange(tile_batch)
        st = starts[ts]  # [B]
        en = ends[ts]
        # windowed (contiguous) gather: [B, cap, F] and [B, cap]
        win_k = jax.vmap(lambda s: lax.dynamic_slice(si_p, (s,), (cap,)))(st)
        win_g = jax.vmap(lambda s: lax.dynamic_slice(sg_p, (s, 0), (cap, F)))(st)
        pos = st[:, None] + jnp.arange(cap)[None, :]
        valid = pos < en[:, None]
        local = win_k - (ts * R)[:, None]
        onehot = (
            (local[:, :, None] == jnp.arange(R)[None, None, :]) & valid[:, :, None]
        ).astype(compute_dtype)
        out = jnp.einsum(
            "bur,buf->brf", onehot, win_g.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return out  # [B, R, F]

    blocks = lax.map(tile_block, jnp.arange(n_tiles // tile_batch))
    return blocks.reshape(T, F)


def tile_matmul_scatter_seq(idx, g, T, R, cap, compute_dtype=jnp.bfloat16):
    """Like tile_matmul_scatter but one tile per lax.map iteration with a TRUE
    contiguous dynamic_slice (DMA) instead of a vmapped (gather-lowered) one."""
    n_tiles = T // R
    F = g.shape[-1]
    sorted_ops = lax.sort((idx, *[g[:, i] for i in range(F)]), num_keys=1, is_stable=False)
    si = sorted_ops[0]
    sg = jnp.stack(sorted_ops[1:], axis=-1)
    starts = jnp.searchsorted(si, jnp.arange(n_tiles, dtype=si.dtype) * R)
    ends = jnp.concatenate([starts[1:], jnp.array([idx.shape[0]], starts.dtype)])
    si_p = jnp.concatenate([si, jnp.full((cap,), T, si.dtype)])
    sg_p = jnp.concatenate([sg, jnp.zeros((cap, F), sg.dtype)])
    iota_r = jnp.arange(R)
    iota_c = jnp.arange(cap)

    def one_tile(t):
        st = starts[t]
        win_k = lax.dynamic_slice(si_p, (st,), (cap,))
        win_g = lax.dynamic_slice(sg_p, (st, 0), (cap, F))
        valid = (st + iota_c) < ends[t]
        local = win_k - t * R
        onehot = ((local[:, None] == iota_r[None, :]) & valid[:, None]).astype(compute_dtype)
        return jnp.einsum(
            "ur,uf->rf", onehot, win_g.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )

    blocks = lax.map(one_tile, jnp.arange(n_tiles))
    return blocks.reshape(T, F)


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
    N, T, F = 524288 * 6, 131072, 8  # all 6 levels fused: 3.1M rows
    idx = jax.random.randint(key, (N,), 0, T)
    g = jax.random.normal(key, (N, F), dtype=jnp.float32)
    rows = N

    # correctness check of the tile-matmul path (small shapes, CPU-safe math)
    small_idx = jax.random.randint(key, (4096,), 0, 1024)
    small_g = jax.random.normal(key, (4096, 4), dtype=jnp.float32)
    ref = jnp.zeros((1024, 4), jnp.float32).at[small_idx].add(small_g)
    got = tile_matmul_scatter(small_idx, small_g, 1024, 128, cap=1024, tile_batch=4)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"correctness vmap variant f32 (max abs err): {err:.2e}", flush=True)
    got_bf = tile_matmul_scatter(
        small_idx, small_g, 1024, 128, cap=1024, compute_dtype=jnp.bfloat16, tile_batch=4
    )
    err_bf = float(jnp.max(jnp.abs(ref - got_bf)))
    print(f"correctness vmap variant bf16 (max abs err, bf16-matmul rounding): {err_bf:.2e}", flush=True)
    got2 = tile_matmul_scatter_seq(small_idx, small_g, 1024, 128, cap=1024, compute_dtype=jnp.float32)
    err2 = float(jnp.max(jnp.abs(ref - got2)))
    print(f"correctness seq variant f32: {err2:.2e}", flush=True)

    def base(idx, g, i):
        return jnp.zeros((T, F), jnp.float32).at[idx ^ i].add(g)
    guard("A  baseline .at[].add fp32 (3.1M rows)", lambda: timeit(chain(base), idx, g), rows)

    # J: the production path — 6 INDEPENDENT per-level scatters (524k rows each
    # into a 4MB fp32 accumulator). This is what _gather_levels_multi_bwd emits.
    L = 6
    idx6 = idx.reshape(L, -1)
    g6 = g.reshape(L, -1, F)
    def per_level(a, b, i):
        return tuple(jnp.zeros((T, F), jnp.float32).at[a[l] ^ i].add(b[l]) for l in range(L))
    guard("J  6 independent per-level scatters (production)", lambda: timeit(chain(per_level), idx6, g6), rows)

    def per_level_matmul(a, b, i, R=128, cap=1024):
        return tuple(tile_matmul_scatter_seq(a[l] ^ i, b[l], T, R, cap) for l in range(L))
    guard("J2 6x per-level sort+seq-window matmul R=128", lambda: timeit(chain(per_level_matmul), idx6, g6), rows)

    def h3(a, b, i, R=128, cap=4096):
        return tile_matmul_scatter_seq(a ^ i, b, T, R, cap)
    guard("H3 sort + lax.map dynamic_slice windows R=128", lambda: timeit(chain(h3), idx, g), rows)

    def h3b(a, b, i, R=512, cap=16384):
        return tile_matmul_scatter_seq(a ^ i, b, T, R, cap)
    guard("H3b same, R=512 cap=16384", lambda: timeit(chain(h3b), idx, g), rows)

    def h3c(a, b, i, R=1024, cap=32768):
        return tile_matmul_scatter_seq(a ^ i, b, T, R, cap)
    guard("H3c same, R=1024 cap=32768", lambda: timeit(chain(h3c), idx, g), rows)

    def sort_payload(idx, g, i):
        F = g.shape[-1]
        return lax.sort((idx ^ i, *[g[:, k] for k in range(F)]), num_keys=1, is_stable=False)
    guard("H0 lax.sort with 8x f32 payload cols", lambda: timeit(chain(sort_payload), idx, g), rows)

    def sort_bf16_payload(idx, g, i):
        gb = g.astype(jnp.bfloat16)
        F = g.shape[-1]
        return lax.sort((idx ^ i, *[gb[:, k] for k in range(F)]), num_keys=1, is_stable=False)
    guard("H0a lax.sort with 8x bf16 payload cols", lambda: timeit(chain(sort_bf16_payload), idx, g), rows)

    def sort_packed_payload(idx, g, i):
        # pack pairs of bf16 into int32 columns: 4 payload operands instead of 8
        gb = g.astype(jnp.bfloat16)
        u = lax.bitcast_convert_type(gb.reshape(-1, 4, 2), jnp.int32).reshape(-1, 4)
        return lax.sort((idx ^ i, *[u[:, k] for k in range(4)]), num_keys=1, is_stable=False)
    guard("H0p lax.sort with 4x packed-bf16 cols", lambda: timeit(chain(sort_packed_payload), idx, g), rows)

    def sort_gather(idx, g, i):
        perm = jnp.argsort(idx ^ i)
        return (idx ^ i)[perm], g[perm]
    guard("H0b argsort + random payload gather", lambda: timeit(chain(sort_gather), idx, g), rows)

    for R, cap, tb in [(128, 4096, 32)]:
        n_tiles = T // R
        mean = N / n_tiles
        def h1(a, b, i, R=R, cap=cap, tb=tb):
            return tile_matmul_scatter(a ^ i, b, T, R, cap, jnp.float32, tb)
        guard(
            f"H1 sort+window+matmul f32 R={R} cap={cap} (mean {mean:.0f})",
            lambda h1=h1: timeit(chain(h1), idx, g),
            rows,
        )
        def h2(a, b, i, R=R, cap=cap, tb=tb):
            return tile_matmul_scatter(a ^ i, b, T, R, cap, jnp.bfloat16, tb)
        guard(
            f"H2 sort+window+matmul bf16 R={R} cap={cap}",
            lambda h2=h2: timeit(chain(h2), idx, g),
            rows,
        )

    # D: EXACT sorted-run dedup — sort (key, payload), cumsum, take per-run
    # totals at run boundaries (consecutive differences of the compacted
    # boundary cumsums), scatter only <= T unique rows. No caps, no overflow.
    def dedup_scatter(idx_in, g_in, i, u_cap=None):
        F = g_in.shape[-1]
        n = idx_in.shape[0]
        t_rows = T
        u = u_cap or min(n, t_rows)
        ops = lax.sort((idx_in ^ i, *[g_in[:, k] for k in range(F)]), num_keys=1, is_stable=False)
        si = ops[0]
        sg = jnp.stack(ops[1:], axis=-1).astype(jnp.float32)
        csum = jnp.cumsum(sg, axis=0)
        is_last = jnp.concatenate([si[:-1] != si[1:], jnp.ones((1,), bool)])
        n_last = jnp.cumsum(is_last.astype(jnp.int32))
        ks = jnp.arange(1, u + 1, dtype=jnp.int32)
        pos = jnp.searchsorted(n_last, ks)  # binary search: 20 gather rounds
        pos = jnp.clip(pos, 0, n - 1)
        valid = ks <= n_last[-1]
        key_u = jnp.where(valid, si[pos], t_rows)
        csum_u = csum[pos]
        prev = jnp.concatenate([jnp.zeros((1, F), csum.dtype), csum_u[:-1]], axis=0)
        g_u = jnp.where(valid[:, None], csum_u - prev, 0.0)
        return jnp.zeros((t_rows + 1, F), jnp.float32).at[key_u].add(g_u)[:t_rows]

    # correctness
    ref_d = jnp.zeros((T, F), jnp.float32).at[idx].add(g)
    got_d = dedup_scatter(idx, g, 0)
    print(f"correctness dedup_scatter (max abs err): {float(jnp.max(jnp.abs(ref_d - got_d))):.2e}", flush=True)

    guard("D  sorted-run dedup scatter (exact)", lambda: timeit(chain(dedup_scatter), idx, g), rows)

    def per_level_dedup(a, b, i):
        return tuple(dedup_scatter(a[l], b[l], i) for l in range(L))
    guard("D2 6x per-level dedup scatter", lambda: timeit(chain(per_level_dedup), idx6, g6), rows)

    # D3: the coarse-dense-level case — keys heavily duplicated (few unique
    # cells). 917k rows into a 33^3=36k-row level: dedup factor ~26x.
    T_small = 36000
    idx_s = jax.random.randint(key, (N // 6,), 0, T_small)
    g_s = jax.random.normal(key, (N // 6, F), dtype=jnp.float32)
    def base_small(a, b, i):
        return jnp.zeros((T_small, F), jnp.float32).at[a ^ (i % 2)].add(b)
    guard("A3 baseline scatter 917k rows -> 36k-row level", lambda: timeit(chain(base_small), idx_s, g_s), N // 6)
    def dedup_small(a, b, i):
        F_ = b.shape[-1]
        n = a.shape[0]
        ops = lax.sort((a ^ (i % 2), *[b[:, k] for k in range(F_)]), num_keys=1, is_stable=False)
        si = ops[0]
        sg = jnp.stack(ops[1:], axis=-1).astype(jnp.float32)
        csum = jnp.cumsum(sg, axis=0)
        is_last = jnp.concatenate([si[:-1] != si[1:], jnp.ones((1,), bool)])
        n_last = jnp.cumsum(is_last.astype(jnp.int32))
        ks = jnp.arange(1, T_small + 1, dtype=jnp.int32)
        pos = jnp.clip(jnp.searchsorted(n_last, ks), 0, n - 1)
        valid = ks <= n_last[-1]
        key_u = jnp.where(valid, si[pos], T_small)
        csum_u = csum[pos]
        prev = jnp.concatenate([jnp.zeros((1, F_), csum.dtype), csum_u[:-1]], axis=0)
        g_u = jnp.where(valid[:, None], csum_u - prev, 0.0)
        return jnp.zeros((T_small + 1, F_), jnp.float32).at[key_u].add(g_u)[:T_small]
    ref_s = jnp.zeros((T_small, F), jnp.float32).at[idx_s].add(g_s)
    print(f"correctness dedup_small: {float(jnp.max(jnp.abs(ref_s - dedup_small(idx_s, g_s, 0)))):.2e}", flush=True)
    guard("D3 dedup scatter 917k rows -> 36k-row level", lambda: timeit(chain(dedup_small), idx_s, g_s), N // 6)

    print("done", flush=True)


if __name__ == "__main__":
    main()
