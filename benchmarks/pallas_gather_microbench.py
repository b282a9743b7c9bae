"""Microbenchmarks for TPU hash-table gather/scatter strategies (Pallas vs XLA).

Answers the round-2 design questions for the Pallas field sampler
(VERDICT.md "Next round" #1):
  1. Does `jnp.take` on a VMEM-resident table compile in a Pallas kernel, and
     at what rows/s? (XLA HBM gather baseline: ~41 M rows/s on v5e.)
  2. One-hot matmul gather: MXU-speed gather for small tables — rows/s?
  3. One-hot transpose-matmul scatter-add (backward): rows/s vs XLA's ~8 M/s?
  4. How large a table fits in VMEM (v5e)?

Run ON THE REAL CHIP: `python benchmarks/pallas_gather_microbench.py`
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 20  # queries per call


def timeit(fn, *args, reps=5, inner=1):
    # the axon tunnel's block_until_ready returns before the computation
    # finishes; fetching a scalar is the only honest completion barrier
    out = float(jnp.sum(fn(*args)).astype(jnp.float32))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = float(jnp.sum(fn(*args)).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def report(name, secs, rows):
    print(f"  {name:48s} {secs*1e3:9.3f} ms   {rows/secs/1e6:10.1f} M rows/s", flush=True)


# ---------------------------------------------------------------- XLA baselines
def xla_gather(table, idx):
    return jnp.take(table, idx, axis=0)


def xla_scatter(table_shape, idx, g):
    return jnp.zeros(table_shape, jnp.float32).at[idx].add(g)


# ------------------------------------------------- Pallas VMEM-resident gather
def make_vmem_gather(T, F, B, dtype, spelling="take_along_axis"):
    grid = N // B

    def kernel(tbl_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        if spelling == "take_along_axis":
            out_ref[:] = jnp.take_along_axis(
                tbl_ref[:], jnp.broadcast_to(idx[:, None], (B, F)), axis=0
            )
        elif spelling == "take":
            out_ref[:] = jnp.take(tbl_ref[:], idx, axis=0)
        else:  # fori + dynamic row reads
            def body(i, _):
                out_ref[i, :] = tbl_ref[idx[i], :]
                return 0
            jax.lax.fori_loop(0, B, body, 0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, F), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
            ),
        )(table, idx)

    return run


# ------------------------------------------------------- Pallas one-hot gather
def make_onehot_gather(T, F, B, TT):
    grid = N // B

    def kernel(tbl_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        acc = jnp.zeros((B, F), jnp.float32)
        for t in range(T // TT):
            rows = jax.lax.broadcasted_iota(jnp.int32, (B, TT), 1) + t * TT
            oh = (idx[:, None] == rows).astype(jnp.bfloat16)
            acc = acc + jnp.dot(
                oh, tbl_ref[t * TT : (t + 1) * TT, :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        out_ref[:] = acc

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        )(table, idx)

    return run


# ------------------------------------------- Pallas one-hot scatter (backward)
def make_onehot_scatter(T, F, B, TT):
    grid = N // B

    def kernel(idx_ref, g_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        idx = idx_ref[:]
        g = g_ref[:].astype(jnp.bfloat16)
        for t in range(T // TT):
            rows = jax.lax.broadcasted_iota(jnp.int32, (TT, B), 0) + t * TT
            oh_t = (rows == idx[None, :]).astype(jnp.bfloat16)  # [TT, B]
            acc_ref[t * TT : (t + 1) * TT, :] = acc_ref[t * TT : (t + 1) * TT, :] + jnp.dot(
                oh_t, g, preferred_element_type=jnp.float32
            )

        @pl.when(i == grid - 1)
        def _():
            out_ref[:] = acc_ref[:]

    @jax.jit
    def run(idx, g):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, F), jnp.float32),
            scratch_shapes=[pltpu.VMEM((T, F), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        )(idx, g)

    return run


# ---------------------------------------------- Pallas in-kernel scatter probe
def make_vmem_scatter_probe(T, F, B):
    def kernel(idx_ref, g_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] = out_ref[:] + jnp.zeros((T, F), jnp.float32).at[idx_ref[:]].add(g_ref[:])

    @jax.jit
    def run(idx, g):
        return pl.pallas_call(
            kernel,
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, F), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        )(idx, g)

    return run


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)

    # ---- dispatch overhead probe
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128))
    t = timeit(f, x)
    print(f"dispatch overhead (tiny jit): {t*1e3:.2f} ms", flush=True)

    configs = [
        # (T rows, F width, label)
        (16384, 8, "prop-level (2^17 slots cell-packed F1)"),
        (65536, 32, "small static level"),
        (131072, 32, "mid static level (8 MB bf16)"),
        (524288, 32, "full static level (33 MB bf16)"),
    ]

    for T, F, label in configs:
        print(f"\n== table [{T}, {F}] — {label}", flush=True)
        table = jax.random.normal(key, (T, F), jnp.float32)
        table_bf = table.astype(jnp.bfloat16)
        idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
        g = jax.random.normal(key, (N, F), jnp.float32)

        t = timeit(jax.jit(xla_gather), table_bf, idx)
        report("XLA gather (bf16 HBM)", t, N)

        t = timeit(jax.jit(functools.partial(xla_scatter, (T, F))), idx, g)
        report("XLA scatter-add (fp32)", t, N)

        for spelling, B in (("take_along_axis", 1024), ("take_along_axis", 4096), ("fori", 256)):
            try:
                fn = make_vmem_gather(T, F, B, jnp.bfloat16, spelling)
                t = timeit(fn, table_bf, idx)
                report(f"Pallas VMEM {spelling} (B={B})", t, N)
            except Exception as e:
                print(f"  Pallas VMEM {spelling} (B={B}) FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

        if T <= 131072:
            TT = min(T, 2048)
            for B in (1024,):
                try:
                    fn = make_onehot_gather(T, F, B, TT)
                    t = timeit(fn, table_bf, idx)
                    report(f"Pallas one-hot gather (B={B},TT={TT})", t, N)
                except Exception as e:
                    print(f"  Pallas one-hot gather FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

            for B in (1024,):
                try:
                    fn = make_onehot_scatter(T, F, B, TT)
                    t = timeit(fn, idx, g)
                    report(f"Pallas one-hot scatter (B={B},TT={TT})", t, N)
                except Exception as e:
                    print(f"  Pallas one-hot scatter FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

    print("\ndone", flush=True)


if __name__ == "__main__":
    main()
