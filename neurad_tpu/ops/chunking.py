"""Ray-chunked evaluation: bound live HBM for big gather-heavy field evals.

The hash-encoding gathers materialize [rays, samples, levels, corners] index and
feature tensors; at full NeuRAD batch (57k rays x 128 samples x 3 fields) the
un-fused intermediates exceed a v5e's 16GB HBM in the FORWARD pass alone.
`chunked_map` reshapes the ray axis into [n_chunks, chunk] and `lax.map`s the
function — peak memory becomes one chunk's worth while XLA still vectorizes
fully inside the chunk. Combined with `jax.checkpoint` per chunk, the backward
rematerializes chunk-by-chunk too.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def _pad_to(x: jnp.ndarray, n: int) -> jnp.ndarray:
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0)


def chunked_map(
    fn: Callable,
    tree: Any,
    chunk_size: int,
    rng: Optional[jax.Array] = None,
    remat: bool = True,
) -> Any:
    """Apply `fn(chunk_tree[, rng])` over ray chunks of a pytree.

    Every leaf's leading dim is the ray axis; the last rows are repeated to pad
    to a chunk multiple (results for the padding are sliced off). If `rng` is
    given, each chunk receives a folded key as the second argument.
    """
    leaves = jax.tree.leaves(tree)
    n = leaves[0].shape[0]
    if n <= chunk_size:
        return fn(tree, rng) if rng is not None else fn(tree)

    n_chunks = -(-n // chunk_size)
    total = n_chunks * chunk_size
    padded = jax.tree.map(lambda x: _pad_to(x, total).reshape((n_chunks, chunk_size) + x.shape[1:]), tree)

    if rng is not None:
        keys = jax.random.split(rng, n_chunks)
        body = (lambda args: fn(args[0], args[1]))
        body = jax.checkpoint(body) if remat else body
        out = jax.lax.map(body, (padded, keys))
    else:
        body = jax.checkpoint(fn) if remat else fn
        out = jax.lax.map(body, padded)

    return jax.tree.map(lambda x: x.reshape((total,) + x.shape[2:])[:n], out)
