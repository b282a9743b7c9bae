"""FF / tensor-decomposition encoding tests."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.fields.extra_encodings import (
    FFEncoding,
    KPlanesEncoding,
    TensorCPEncoding,
    TensorVMEncoding,
    TriplaneEncoding,
    octahedron_basis,
    rff_basis,
)


def test_ff_encoding_shapes_and_range():
    enc = FFEncoding(basis=((1.0, 0.0), (0.0, 1.0), (0.0, 0.0)), num_frequencies=4)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(5, 3)).astype(np.float32))
    out = enc.apply({}, x)
    assert out.shape == (5, 2 * 4 * 2)
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-5


def test_ff_integrated_encoding_shrinks():
    enc = FFEncoding(basis=((1.0,), (0.0,), (0.0,)), num_frequencies=3, max_freq_exp=4.0)
    x = jnp.asarray([[0.3, 0.2, 0.1]])
    covs = jnp.eye(3)[None] * 0.5
    plain = enc.apply({}, x)
    integrated = enc.apply({}, x, covs)
    # integration attenuates high-freq components
    assert float(jnp.abs(integrated).sum()) < float(jnp.abs(plain).sum())


def test_rff_and_octahedron_bases():
    b = rff_basis(3, 8, 2.0)
    assert len(b) == 3 and len(b[0]) == 8
    ob = octahedron_basis()
    assert len(ob) == 3


def test_tensor_encodings():
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, size=(7, 3)).astype(np.float32))
    for enc in [
        TensorCPEncoding(resolution=16, num_components=4),
        TensorVMEncoding(resolution=16, num_components=4),
        TriplaneEncoding(resolution=16, num_components=4),
    ]:
        params = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(params, x)
        assert out.shape == (7, enc.out_dim)
        g = jax.grad(lambda p: jnp.sum(enc.apply(p, x) ** 2))(params)
        assert sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g)) > 0


def test_kplanes_4d():
    x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, size=(5, 4)).astype(np.float32))
    enc = KPlanesEncoding(in_dim=4, resolution=8, num_components=6)
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (5, 6)
