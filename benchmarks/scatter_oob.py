"""Does XLA's TPU scatter-add skip OUT-OF-BOUNDS update rows cheaply?

If yes, consecutive-run dedup needs NO sort/compaction: samples along a ray
that hit the same cell can be segment-summed in 5 masked shifted adds
(static [R, 32] layout), non-last rows pointed out of bounds, and the scatter
effectively processes only unique rows. If OOB rows cost the same 14.6 ns as
real ones (serial row loop), the idea is dead.

Usage: python benchmarks/scatter_oob.py
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

N, F_ROW, T = 1_835_008, 32, 524_288


def fetch(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(name, fn, *args, reps=8):
    @jax.jit
    def run(*a):
        def it(i, s):
            out = fn(*a, i)
            return s + jnp.sum(out[0].astype(jnp.float32))

        return lax.fori_loop(0, reps, it, jnp.float32(0))

    fetch(run(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(run(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best / reps * 1e3:8.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    upd = jax.random.normal(key, (N, F_ROW), jnp.bfloat16)
    idx_in = jax.random.randint(key, (N,), 0, T, jnp.int32)

    for frac_name, frac in (("all in-bounds", 0.0), ("half OOB", 0.5), ("7/8 OOB", 0.875), ("all OOB", 1.0)):
        mask = jax.random.uniform(jax.random.PRNGKey(1), (N,)) < frac
        idx = jnp.where(mask, jnp.int32(T + 5), idx_in)  # OOB rows dropped by scatter semantics

        def body(idx, upd, i):
            return (jnp.zeros((T, F_ROW), jnp.bfloat16).at[idx ^ (i % 2)].add(upd),)

        timeit(f"scatter-add 1.8M rows, {frac_name}", body, idx, upd)

    # variant: OOB encoded as index T (clip-free .at[] drops >= T automatically?)
    # JAX .at[].add default mode drops out-of-bounds updates on TPU.


if __name__ == "__main__":
    main()
