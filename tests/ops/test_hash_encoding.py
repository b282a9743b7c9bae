"""Hash encoding tests: shapes, interpolation correctness, gradients, 4D support.

Mirrors the reference's encoding tests (tests/field_components/test_encodings.py)
plus gradient checks the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.ops import hash_encoding as he


def make_table(key, num_levels=4, table_size=2**10, f=2):
    return he.init_hash_table(key, num_levels, table_size, f, scale=1.0)


def test_output_shape_3d():
    key = jax.random.PRNGKey(0)
    scales = jnp.asarray(he.level_scales(4, 4, 64))
    table = make_table(key)
    x = jax.random.uniform(key, (17, 3))
    out = he.hash_encode(x, table, scales, 2**10)
    assert out.shape == (17, 8)


def test_output_shape_4d():
    key = jax.random.PRNGKey(0)
    scales = jnp.asarray(he.level_scales(4, 4, 64))
    table = he.init_hash_table(key, 4, 2**10, 2)
    x = jax.random.uniform(key, (9, 5, 4))
    out = he.hash_encode(x, table, scales, 2**10)
    assert out.shape == (9, 5, 8)


def test_interpolation_continuity():
    """Feature field must be continuous across grid cells (trilinear)."""
    key = jax.random.PRNGKey(1)
    scales = jnp.asarray(he.level_scales(2, 4, 8))
    table = make_table(key, num_levels=2)
    x0 = jnp.array([[0.3, 0.4, 0.5]])
    eps = 1e-5
    x1 = x0 + eps
    f0 = he.hash_encode(x0, table, scales, 2**10)
    f1 = he.hash_encode(x1, table, scales, 2**10)
    assert float(jnp.max(jnp.abs(f1 - f0))) < 1e-3


def test_exact_at_grid_corner():
    """At an integer grid coordinate, the encoding equals the corner's table entry."""
    key = jax.random.PRNGKey(2)
    table_size = 2**10
    scales = jnp.asarray([4.0])
    table = he.init_hash_table(key, 1, table_size, 2, scale=1.0)
    # position exactly on grid point (2,1,3) at res 4; fp32 reads for exactness
    pos = jnp.array([[2.0 / 4.0, 1.0 / 4.0, 3.0 / 4.0]])
    out = he.hash_encode(pos, table, scales, table_size, gather_dtype=None)
    # default bf16 reads stay within bf16 quantization of the exact value
    out_bf16 = he.hash_encode(pos, table, scales, table_size)
    np.testing.assert_allclose(np.asarray(out_bf16), np.asarray(out), rtol=1e-2, atol=1e-2)
    # hash of (2,1,3)
    coords = jnp.array([[2, 1, 3]], dtype=jnp.int32)
    idx = (
        (coords[..., 0].astype(jnp.uint32) * jnp.uint32(1))
        ^ (coords[..., 1].astype(jnp.uint32) * jnp.uint32(2654435761))
        ^ (coords[..., 2].astype(jnp.uint32) * jnp.uint32(805459861))
    ) % jnp.uint32(table_size)
    expected = table[idx.astype(jnp.int32)[0]]
    np.testing.assert_allclose(out[0], expected, atol=1e-5)


def test_gradients_flow_to_table():
    key = jax.random.PRNGKey(3)
    scales = jnp.asarray(he.level_scales(2, 4, 8))
    table = make_table(key, num_levels=2)
    x = jax.random.uniform(key, (32, 3))

    def loss(t):
        return jnp.sum(he.hash_encode(x, t, scales, 2**10) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_gradients_flow_to_positions():
    key = jax.random.PRNGKey(4)
    scales = jnp.asarray(he.level_scales(2, 4, 8))
    table = make_table(key, num_levels=2)
    x = jax.random.uniform(key, (8, 3), minval=0.1, maxval=0.9)

    def loss(pos):
        return jnp.sum(he.hash_encode(pos, table, scales, 2**10))

    g = jax.grad(loss)(x)
    assert jnp.isfinite(g).all()


def test_gaussian_level_weights():
    scales = jnp.asarray([4.0, 64.0])
    # tiny std -> weight 1 everywhere; large std -> fine levels downweighted
    w_small = he.gaussian_level_weights(jnp.array([1e-6]), scales)
    np.testing.assert_allclose(w_small, 1.0, atol=1e-4)
    w_large = he.gaussian_level_weights(jnp.array([0.1]), scales)
    assert w_large[0] == 1.0  # 4 * 2 * 0.1 = 0.8 < 1 -> clamped
    np.testing.assert_allclose(w_large[1], 1.0 / (64 * 2 * 0.1), rtol=1e-5)


def test_hash_encode_gaussians_matches_manual():
    key = jax.random.PRNGKey(5)
    scales = jnp.asarray(he.level_scales(2, 4, 8))
    table = make_table(key, num_levels=2)
    mean = jax.random.uniform(key, (6, 3, 3))  # 6 samples, 3 multisamples
    std = jnp.full((6, 3, 1), 0.05)
    out = he.hash_encode_gaussians(mean, std, table, scales, 2**10)
    w = he.gaussian_level_weights(std, scales)
    manual = he.hash_encode(mean, table, scales, 2**10, level_weights=w).mean(axis=-2)
    np.testing.assert_allclose(out, manual, atol=1e-6)
    assert out.shape == (6, 4)

# ---- tuple-of-tables layout (TPU fast path, ops/hash_encoding.init_hash_tables) ----


def test_level_rows_dense_sizing():
    """tcnn sizing rule: dense grid if it fits under max_rows, else hashed."""
    scales = he.level_scales(4, 4, 64)  # 4, 10, 25, 64
    rows, dense = he.level_rows(scales, d=3, max_rows=2**10, cell_packed=True)
    # res 4 -> 5^3=125 dense; res 10 -> 11^3=1331 > 1024 hashed
    assert rows[0] == 125 and dense[0] == 5
    assert rows[1] == 1024 and dense[1] is None
    # unpacked (corner-indexed) grids need one extra vertex per dim
    rows_u, dense_u = he.level_rows(scales, d=3, max_rows=2**10, cell_packed=False)
    assert rows_u[0] == 6**3 and dense_u[0] == 6


def test_tuple_tables_shapes_and_grads():
    key = jax.random.PRNGKey(7)
    scales_np = he.level_scales(4, 4, 64)
    scales = jnp.asarray(scales_np)
    tables = he.init_hash_tables(key, scales_np, 3, 2**10, 2)
    _, dense = he.level_rows(scales_np, 3, 2**10, False)
    x = jax.random.uniform(key, (33, 3))
    out = he.hash_encode(x, tables, scales, dense_res=dense)
    assert out.shape == (33, 8)

    def loss(t):
        return jnp.sum(he.hash_encode(x, t, scales, dense_res=dense) ** 2)

    g = jax.grad(loss)(tables)
    assert isinstance(g, tuple) and len(g) == 4
    for gt, t in zip(g, tables):
        assert gt.shape == t.shape and gt.dtype == jnp.float32
    assert float(sum(jnp.sum(jnp.abs(gt)) for gt in g)) > 0


def test_dense_level_is_collision_free():
    """On a dense level, distinct cells must hit distinct rows (no hash
    collisions) and the encoding at a grid corner equals that row's entry."""
    key = jax.random.PRNGKey(8)
    scales_np = np.asarray([4.0])
    tables = he.init_hash_tables(key, scales_np, 3, 2**10, 2, scale=1.0)
    _, dense = he.level_rows(scales_np, 3, 2**10, False)
    assert dense[0] == 6
    # corner (2,1,3) at res 4 -> linear row (2*6+1)*6+3 = 81
    pos = jnp.array([[2.0 / 4.0, 1.0 / 4.0, 3.0 / 4.0]])
    out = he.hash_encode(pos, tables, jnp.asarray(scales_np), dense_res=dense, gather_dtype=None)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(tables[0][81]), atol=1e-6)


def test_tuple_matches_legacy_hashed():
    """With no dense levels, tuple tables built from the legacy array give the
    same encoding (same hash, same interpolation)."""
    key = jax.random.PRNGKey(9)
    scales_np = he.level_scales(3, 32, 128)  # all hashed at 2^8 rows
    scales = jnp.asarray(scales_np)
    t_legacy = he.init_hash_table(key, 3, 2**8, 2, scale=1.0)
    parts = tuple(t_legacy[l * 2**8:(l + 1) * 2**8] for l in range(3))
    x = jax.random.uniform(key, (50, 3))
    a = he.hash_encode(x, t_legacy, scales, 2**8, gather_dtype=None)
    b = he.hash_encode(x, parts, scales, gather_dtype=None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
