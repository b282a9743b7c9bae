"""Microbench v3: amortized timing (fori_loop-chained inside one jit) for
hash-table gather/scatter candidates. The axon tunnel adds ~31 ms per dispatch,
so per-call timing lies; every benchmark here runs K chained iterations inside
one jit and reports (total - dispatch_overhead) / K.

Key new candidate: scalar-loop Pallas kernels — indices in SMEM, per-query
dynamic-index row load/store against a VMEM-resident table. This is the only
Pallas-supported random-access form (vector gather/scatter don't lower), and a
serial RMW loop gives a race-free scatter-add.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 20
K = 8  # chained iterations per jit


def fetch(x):
    return float(jnp.sum(x).astype(jnp.float32))


_overhead = None


def timeit(fn, *args, reps=4):
    fetch(fn(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - _overhead, 1e-9) / K


def report(name, secs, rows=N):
    print(f"  {name:52s} {secs*1e3:9.3f} ms   {rows/secs/1e6:10.1f} M rows/s", flush=True)


# ---------------------------------------------------------------- XLA chained
def make_xla_gather(T, F):
    @jax.jit
    def run(table, idx):
        def body(i, s):
            out = jnp.take(table, (idx + i * 7919) % T, axis=0)
            return s + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    return run


def make_xla_scatter(T, F, acc_dtype=jnp.float32):
    @jax.jit
    def run(idx, g):
        def body(i, s):
            dt = jnp.zeros((T, F), acc_dtype).at[(idx + i * 7919) % T].add(g.astype(acc_dtype))
            return s + jnp.sum(dt.astype(jnp.float32))

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    return run


def make_xla_sort(n):
    idx0 = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, 1 << 22, jnp.int32)

    @jax.jit
    def run():
        def body(i, s):
            srt = jnp.sort(idx0 + i)
            return s + jnp.float32(srt[0])

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    return run


def make_xla_argsort(n):
    idx0 = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, 1 << 22, jnp.int32)

    @jax.jit
    def run():
        def body(i, s):
            srt = jnp.argsort(idx0 + i)
            return s + jnp.float32(srt[0])

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    return run


# ----------------------------------------------- Pallas scalar-loop gather
def make_scalar_gather(T, F, B, unroll, tbl_dtype=jnp.bfloat16):
    grid = N // B

    def kernel(idx_ref, tbl_ref, out_ref):
        def body(j, _):
            out_ref[j, :] = tbl_ref[idx_ref[j], :]
            return 0

        jax.lax.fori_loop(0, B, body, 0, unroll=unroll)

    pc = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, F), tbl_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
    )

    @jax.jit
    def run(table, idx):
        def body(i, s):
            out = pc((idx + i * 7919) % T, table)
            return s + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    return run


# ------------------------------------------ Pallas scalar-loop scatter-add
def make_scalar_scatter(T, F, B, unroll, acc_dtype=jnp.float32):
    grid = N // B

    def kernel(idx_ref, g_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(j, _):
            r = idx_ref[j]
            out_ref[r, :] = out_ref[r, :] + g_ref[j, :]
            return 0

        jax.lax.fori_loop(0, B, body, 0, unroll=unroll)

    pc = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, F), acc_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024),
    )

    @jax.jit
    def run(idx, g):
        def body(i, s):
            dt = pc((idx + i * 7919) % T, g.astype(acc_dtype))
            return s + jnp.sum(dt.astype(jnp.float32))

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    return run


def main():
    global _overhead
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128))
    fetch(f(x))
    _overhead = min(
        (lambda: (lambda t0: (fetch(f(x)), time.perf_counter() - t0)[1])(time.perf_counter()))()
        for _ in range(6)
    )
    print(f"dispatch overhead: {_overhead*1e3:.2f} ms", flush=True)

    # sorts (for sort-based scatter feasibility)
    for n in (1 << 20, 1 << 23):
        try:
            t = timeit(make_xla_sort(n))
            report(f"XLA sort ({n>>20}M keys)", t, n)
            t = timeit(make_xla_argsort(n))
            report(f"XLA argsort ({n>>20}M keys)", t, n)
        except Exception as e:
            print(f"  sort({n}) FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)

    configs = [
        (16384, 8, "prop level"),
        (131072, 32, "mid static (8 MB bf16)"),
        (524288, 32, "full static (33 MB bf16)"),
    ]

    for T, F, label in configs:
        print(f"\n== table [{T}, {F}] — {label}", flush=True)
        table_bf = (jax.random.normal(key, (T, F), jnp.float32)).astype(jnp.bfloat16)
        idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
        g = jax.random.normal(key, (N, F), jnp.float32)

        t = timeit(make_xla_gather(T, F), table_bf, idx)
        report("XLA gather (bf16)", t)
        t = timeit(make_xla_scatter(T, F), idx, g)
        report("XLA scatter-add (fp32)", t)
        try:
            t = timeit(make_xla_scatter(T, F, jnp.bfloat16), idx, g)
            report("XLA scatter-add (bf16)", t)
        except Exception as e:
            print(f"  XLA scatter bf16 FAILED: {str(e)[:120]}", flush=True)

        for B, unroll in ((512, 1), (2048, 4), (8192, 8)):
            try:
                fn = make_scalar_gather(T, F, B, unroll)
                t = timeit(fn, table_bf, idx)
                report(f"Pallas scalar gather (B={B},u={unroll})", t)
            except Exception as e:
                print(f"  Pallas scalar gather (B={B},u={unroll}) FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

        for B, unroll in ((2048, 4), (8192, 8)):
            for acc in (jnp.float32,):
                try:
                    fn = make_scalar_scatter(T, F, B, unroll, acc)
                    t = timeit(fn, idx, g)
                    report(f"Pallas scalar scatter (B={B},u={unroll},{acc.__name__})", t)
                except Exception as e:
                    print(
                        f"  Pallas scalar scatter (B={B},u={unroll}) FAILED: {type(e).__name__}: {str(e)[:160]}",
                        flush=True,
                    )

    print("\ndone", flush=True)


if __name__ == "__main__":
    main()
