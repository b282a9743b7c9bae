"""Cell-packed hash encoding: interpolation correctness + gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.ops import hash_encoding as he


def test_cell_packed_shapes_and_grads():
    key = jax.random.PRNGKey(0)
    L, T, F = 3, 2**10, 4
    scales = jnp.asarray(he.level_scales(L, 8, 64))
    table = he.init_hash_table(key, L, T, F, corners_packed=8)
    assert table.shape == (L * T, 8 * F)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    out = he.hash_encode(pos, table, scales, T, cell_packed=True)
    assert out.shape == (32, L * F)

    g = jax.grad(lambda t: jnp.sum(he.hash_encode(pos, t, scales, T, cell_packed=True) ** 2))(table)
    assert float(jnp.abs(g).sum()) > 0


def test_cell_packed_interpolates_within_cell():
    """Within one cell the encoding must be trilinear in the offset."""
    key = jax.random.PRNGKey(2)
    L, T, F = 1, 2**12, 2
    scales = jnp.asarray([4.0])
    table = he.init_hash_table(key, L, T, F, corners_packed=8, scale=1.0)
    # cell (1,2,3) at res 4: corners at offsets in {0,1}^3
    base = jnp.array([1.0, 2.0, 3.0]) / 4.0
    eps = 1e-4
    at_corner0 = he.hash_encode(base[None] + eps / 4.0, table, scales, T, cell_packed=True, gather_dtype=None)
    center = he.hash_encode(base[None] + 0.5 / 4.0, table, scales, T, cell_packed=True, gather_dtype=None)
    # the center is the mean of all 8 stored corners of that cell
    idx = int(he._hash(jnp.array([[1, 2, 3]], dtype=jnp.int32), T)[0])
    stored = np.asarray(table[idx]).reshape(8, F)
    np.testing.assert_allclose(np.asarray(center[0]), stored.mean(0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(at_corner0[0]), stored[0], atol=1e-2)


def test_cell_packed_4d():
    key = jax.random.PRNGKey(3)
    L, T, F = 2, 2**10, 4
    scales = jnp.asarray(he.level_scales(L, 8, 16))
    table = he.init_hash_table(key, L, T, F, corners_packed=16)
    pos = jax.random.uniform(jax.random.PRNGKey(4), (16, 4))
    out = he.hash_encode(pos, table, scales, T, cell_packed=True)
    assert out.shape == (16, L * F)
    assert np.isfinite(np.asarray(out)).all()


def test_gaussian_encode_cell_packed():
    key = jax.random.PRNGKey(5)
    L, T, F = 2, 2**10, 4
    scales = jnp.asarray(he.level_scales(L, 8, 32))
    table = he.init_hash_table(key, L, T, F, corners_packed=8)
    mean = jax.random.uniform(key, (8, 2, 3))  # M=2 multisamples
    std = jnp.full((8, 2, 1), 0.01)
    out = he.hash_encode_gaussians(mean, std, table, scales, T, cell_packed=True)
    assert out.shape == (8, L * F)
