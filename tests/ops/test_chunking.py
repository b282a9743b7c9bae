"""Chunked-map equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.ops.chunking import chunked_map


def test_chunked_map_matches_direct():
    x = {"a": jnp.arange(20.0).reshape(10, 2), "b": jnp.arange(10.0)}
    fn = lambda t: {"out": t["a"].sum(-1) + t["b"] * 2}
    direct = fn(x)
    chunked = chunked_map(fn, x, chunk_size=3)
    np.testing.assert_allclose(np.asarray(chunked["out"]), np.asarray(direct["out"]), rtol=1e-6)


def test_chunked_map_with_rng():
    x = jnp.ones((8, 2))
    fn = lambda t, key: t * jax.random.uniform(key, ())
    out = chunked_map(fn, x, chunk_size=4, rng=jax.random.PRNGKey(0))
    assert out.shape == (8, 2)
    # different chunks get different keys
    assert float(out[0, 0]) != float(out[7, 0])


def test_chunked_map_grads():
    x = jnp.arange(12.0).reshape(6, 2)

    def loss(x):
        return chunked_map(lambda t: t**2, x, chunk_size=4).sum()

    g = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), rtol=1e-6)


def test_no_chunking_when_small():
    x = jnp.ones((3, 2))
    out = chunked_map(lambda t: t + 1, x, chunk_size=8)
    np.testing.assert_allclose(np.asarray(out), 2.0)
