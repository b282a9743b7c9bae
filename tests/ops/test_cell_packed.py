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


import pytest


@pytest.mark.parametrize("gather_dtype", [None, jnp.bfloat16])
def test_fused_interp_gather_matches_autodiff(gather_dtype):
    """The hand-written `_interp_gather_cp` VJP (sample-major updates +
    unpacked-width scatter) must match plain autodiff through the same math:
    values, table grads, position grads, and level-weight grads, for a level
    mix that covers dense (pk=1), hashed (pk=1), and bucket-packed (pk>1).

    fp32 mode compares everything tightly. In bf16 mode the pos/lw grads sum
    many bf16-rounded terms with cancellation, so elementwise comparison vs
    the equally-rounded autodiff reference is noise — there the check is
    values + table grads tight, pos/lw grads by overall direction (cosine)."""
    d, F = 3, 4
    L = 5
    scales = np.asarray(he.level_scales(L, 8, 600))
    max_rows = 2**19  # forces pk=2 on the finest hashed levels
    tables = he.init_hash_tables(
        jax.random.PRNGKey(0), scales, d, max_rows, F, cell_packed=True, scale=0.5
    )
    _, dense_res, packs = he.level_layout(scales, d, max_rows, cell_packed=True)
    assert max(packs) > 1 and any(r is not None for r in dense_res)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (257, d))
    lw = jax.random.uniform(jax.random.PRNGKey(2), (257, L), minval=0.3, maxval=1.0)

    def run(pos, tables, lw):
        return he.hash_encode(
            pos, tables, np.asarray(scales), level_weights=lw, gather_dtype=gather_dtype,
            cell_packed=True, dense_res=dense_res, bucket_pack=packs,
        )

    def run_autodiff(pos, tables, lw):
        import unittest.mock as mock

        ref = lambda rb, sh, pk, C, f, dd, *args: he._interp_gather_cp_impl(rb, sh, pk, C, f, *args)[0]
        with mock.patch.object(he, "_interp_gather_cp", ref):
            return run(pos, tables, lw)

    out = run(pos, tables, lw)
    want = run_autodiff(pos, tables, lw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-6)

    def loss(fn):
        return lambda pos, tables, lw: jnp.sum(jnp.sin(3.0 * fn(pos, tables, lw)))

    g = jax.grad(loss(run), argnums=(0, 1, 2))(pos, tables, lw)
    gw = jax.grad(loss(run_autodiff), argnums=(0, 1, 2))(pos, tables, lw)
    for gt, gtw, tbl in zip(g[1], gw[1], tables):
        # levels whose fp32 accumulator would exceed 32 MB accumulate in bf16
        # by design (tcnn accumulates in fp16); the autodiff reference always
        # accumulates fp32 — compare those at bf16 resolution
        bf16_accum = tbl.size * 4 > he._FP32_ACCUM_MAX_BYTES
        # in bf16 read mode the autodiff reference ALSO accumulates in bf16
        # (scatter dtype = gathered dtype), while the fused path accumulates
        # fp32 on small levels — everything is bf16-ulp comparison there
        rtol, atol = (1e-2, 1e-4) if (bf16_accum or gather_dtype is not None) else (2e-4, 2e-5)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gtw), rtol=rtol, atol=atol)
    if gather_dtype is None:
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gw[0]), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(g[2]), np.asarray(gw[2]), rtol=2e-4, atol=2e-5)
    else:
        for a, b in ((g[0], gw[0]), (g[2], gw[2])):
            a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
            cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
            assert cos > 0.9999, cos


def test_run_dedup_scatter_is_exact():
    """Backward scatters with consecutive-run dedup == plain scatter-add:
    identical table gradients on ray-structured positions (where consecutive
    samples genuinely share coarse cells), including across ray boundaries."""
    d, F, L = 3, 4, 4
    scales = np.asarray(he.level_scales(L, 8, 128))
    max_rows = 2**16
    tables = he.init_hash_tables(
        jax.random.PRNGKey(0), scales, d, max_rows, F, cell_packed=True, scale=0.5
    )
    _, dense_res, packs = he.level_layout(scales, d, max_rows, cell_packed=True)
    assert any(r is not None for r in dense_res)
    R, S = 17, 16
    # rays marching slowly through space: heavy cell duplication at coarse levels
    origins = jax.random.uniform(jax.random.PRNGKey(1), (R, 1, d), minval=0.2, maxval=0.8)
    steps = jnp.linspace(0.0, 0.15, S)[None, :, None]
    dirs = jax.random.normal(jax.random.PRNGKey(2), (R, 1, d))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    pos = jnp.clip(origins + steps * dirs, 0.0, 0.999)

    def loss(tables, seg):
        out = he.hash_encode(
            pos, tables, np.asarray(scales), cell_packed=True, dense_res=dense_res,
            bucket_pack=packs, gather_dtype=None, run_dedup_seg=seg,
        )
        return jnp.sum(jnp.sin(2.0 * out))

    g_plain = jax.grad(lambda t: loss(t, 0))(tables)
    g_dedup = jax.grad(lambda t: loss(t, S))(tables)
    for a, b in zip(g_dedup, g_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    # non-vacuous: the dedup path must actually merge runs at the coarse level
    assert float(jnp.abs(g_plain[0]).max()) > 0


def test_segsum_dense_grad_matches_scatter_direct():
    """_segsum_dense_grad (sort + prefix-sum boundary diffs) == .at[].add,
    both payload packings, incl. duplicated keys, empty buckets, and an
    all-same-key stream."""
    key = jax.random.PRNGKey(7)
    n, C, F, T = 4096, 8, 4, 777
    bucket = jax.random.randint(key, (n,), 0, T // 2)  # upper half: empty buckets
    w2 = jax.random.normal(jax.random.PRNGKey(8), (n, C))
    g2 = jax.random.normal(jax.random.PRNGKey(9), (n, F))

    def ref(wq, gq):
        upd = jnp.concatenate([wq[:, c : c + 1] * gq for c in range(C)], axis=-1)
        return jnp.zeros((T, C * F), jnp.float32).at[bucket].add(upd.astype(jnp.float32))

    got32 = he._segsum_dense_grad(bucket, w2, g2, T, bf16_payload=False)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(ref(w2, g2)), rtol=2e-5, atol=2e-4)

    wb, gb = w2.astype(jnp.bfloat16), g2.astype(jnp.bfloat16)
    got16 = he._segsum_dense_grad(bucket, w2, g2, T, bf16_payload=True)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(ref(wb, gb)), rtol=2e-2, atol=2e-2)

    # all rows into one bucket: the worst prefix-sum cancellation case
    one = jnp.full((n,), 3, jnp.int32)
    got_one = he._segsum_dense_grad(one, w2, g2, 7, bf16_payload=False)
    want_one = jnp.zeros((7, C * F), jnp.float32).at[one].add(
        jnp.concatenate([w2[:, c : c + 1] * g2 for c in range(C)], axis=-1)
    )
    np.testing.assert_allclose(np.asarray(got_one), np.asarray(want_one), rtol=2e-4, atol=3e-3)


@pytest.mark.parametrize("gather_dtype", [None, jnp.bfloat16])
def test_segsum_grad_matches_scatter_end_to_end(gather_dtype):
    """hash_encode gradients with segsum_max_rows covering the coarse levels
    == the plain scatter path, on ray-structured positions (real duplication).
    Fine levels above the row threshold must keep using the scatter path."""
    d, F, L = 3, 4, 4
    scales = np.asarray(he.level_scales(L, 8, 128))
    max_rows = 2**16
    tables = he.init_hash_tables(
        jax.random.PRNGKey(0), scales, d, max_rows, F, cell_packed=True, scale=0.5
    )
    _, dense_res, packs = he.level_layout(scales, d, max_rows, cell_packed=True)
    R, S = 17, 16
    origins = jax.random.uniform(jax.random.PRNGKey(1), (R, 1, d), minval=0.2, maxval=0.8)
    steps = jnp.linspace(0.0, 0.15, S)[None, :, None]
    dirs = jax.random.normal(jax.random.PRNGKey(2), (R, 1, d))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    pos = jnp.clip(origins + steps * dirs, 0.0, 0.999)

    # threshold between the two coarsest and the finer levels
    rows_unpacked = [t.shape[0] * p for t, p in zip(tables, packs)]
    thresh = sorted(rows_unpacked)[1]

    def loss(tables, segsum):
        out = he.hash_encode(
            pos, tables, np.asarray(scales), cell_packed=True, dense_res=dense_res,
            bucket_pack=packs, gather_dtype=gather_dtype, segsum_max_rows=segsum,
        )
        return jnp.sum(jnp.sin(2.0 * out))

    g_plain = jax.grad(lambda t: loss(t, 0))(tables)
    g_seg = jax.grad(lambda t: loss(t, thresh))(tables)
    n_covered = sum(1 for r in rows_unpacked if r <= thresh)
    assert 1 <= n_covered < L  # non-vacuous split
    for a, b in zip(g_seg, g_plain):
        if gather_dtype is None:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
        else:
            # bf16 products on both sides; summation order differs
            # (prefix-sum diffs vs scatter order)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3)
    assert float(jnp.abs(g_plain[0]).max()) > 0


@pytest.mark.parametrize("gather_dtype", [None, jnp.bfloat16])
def test_segsum_grad_unpacked_path(gather_dtype):
    """The UNPACKED (face-shared corner) gather path's segsum backward
    (_segsum_rows: update columns ride the sort directly) == plain scatter."""
    d, F, L = 3, 4, 4
    scales = np.asarray(he.level_scales(L, 8, 128))
    max_rows = 2**16
    tables = he.init_hash_tables(
        jax.random.PRNGKey(0), scales, d, max_rows, F, cell_packed=False, scale=0.5
    )
    _, dense_res, packs = he.level_layout(scales, d, max_rows, cell_packed=False)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (213, d), minval=0.0, maxval=0.999)

    rows = [t.shape[0] for t in tables]
    thresh = sorted(rows)[1]

    def loss(tables, segsum):
        out = he.hash_encode(
            pos, tables, np.asarray(scales), cell_packed=False, dense_res=dense_res,
            bucket_pack=packs, gather_dtype=gather_dtype, segsum_max_rows=segsum,
        )
        return jnp.sum(jnp.sin(2.0 * out))

    g_plain = jax.grad(lambda t: loss(t, 0))(tables)
    g_seg = jax.grad(lambda t: loss(t, thresh))(tables)
    n_covered = sum(1 for r in rows if r <= thresh)
    assert 1 <= n_covered < L
    for a, b in zip(g_seg, g_plain):
        # fp32: prefix-sum boundary differences carry ~1e-4 absolute noise on
        # long duplicate streams (documented cancellation); still 100x tighter
        # than the bf16 accumulators large tables use
        tol = dict(rtol=1e-3, atol=2e-4) if gather_dtype is None else dict(rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)
    assert float(jnp.abs(g_plain[0]).max()) > 0


def test_segsum_grad_bucket_packed_level(monkeypatch):
    """segsum on a pk>1 (bucket-packed) cell-packed level: the scatter space is
    the UNPACKED [rows*pk] view; bench L1 runs exactly this (pk=2)."""
    monkeypatch.setattr(he, "_FAST_GATHER_MAX_ROWS", 2**9)
    d, F, L = 3, 4, 3
    scales = np.asarray(he.level_scales(L, 8, 24))
    max_rows = 2**13
    tables = he.init_hash_tables(
        jax.random.PRNGKey(0), scales, d, max_rows, F, cell_packed=True, scale=0.5
    )
    _, dense_res, packs = he.level_layout(scales, d, max_rows, cell_packed=True)
    assert max(packs) > 1, packs
    pos = jax.random.uniform(jax.random.PRNGKey(1), (301, d), minval=0.0, maxval=0.999)

    def loss(tables, segsum):
        out = he.hash_encode(
            pos, tables, np.asarray(scales), cell_packed=True, dense_res=dense_res,
            bucket_pack=packs, gather_dtype=None, segsum_max_rows=segsum,
        )
        return jnp.sum(jnp.sin(2.0 * out))

    g_plain = jax.grad(lambda t: loss(t, 0))(tables)
    g_seg = jax.grad(lambda t: loss(t, 1 << 20))(tables)  # covers ALL levels incl. pk>1
    for a, b in zip(g_seg, g_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4)
    assert float(jnp.abs(g_plain[0]).max()) > 0
