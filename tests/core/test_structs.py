"""Ray struct tests (mirrors reference tests/cameras/test_rays.py + tensor_dataclass tests)."""

import jax.numpy as jnp
import numpy as np

from neurad_tpu.core.structs import Frustums, RayBundle, tree_cat, tree_getitem, tree_reshape


def make_bundle(n=8):
    return RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (n, 3)),
        pixel_area=jnp.ones((n, 1)) * 1e-4,
        nears=jnp.full((n, 1), 0.5),
        fars=jnp.full((n, 1), 10.0),
        camera_indices=jnp.zeros((n, 1), dtype=jnp.int32),
        times=jnp.zeros((n, 1)),
        metadata={"is_lidar": jnp.zeros((n, 1), dtype=bool)},
    )


def uniform_samples(bundle, num_samples=16):
    sb = jnp.linspace(0.0, 1.0, num_samples + 1)
    starts = bundle.nears + (bundle.fars - bundle.nears) * sb[:-1]
    ends = bundle.nears + (bundle.fars - bundle.nears) * sb[1:]
    return bundle.get_ray_samples(
        starts[..., None], ends[..., None], sb[:-1].reshape(1, -1, 1) * jnp.ones_like(starts[..., None]),
        sb[1:].reshape(1, -1, 1) * jnp.ones_like(ends[..., None])
    )


def test_get_ray_samples_shapes():
    bundle = make_bundle(4)
    samples = uniform_samples(bundle, 16)
    assert samples.frustums.origins.shape == (4, 16, 3)
    assert samples.frustums.starts.shape == (4, 16, 1)
    assert samples.deltas.shape == (4, 16, 1)
    assert samples.camera_indices.shape == (4, 16, 1)


def test_weights_from_density_sum_to_opacity():
    bundle = make_bundle(4)
    samples = uniform_samples(bundle, 32)
    # huge density -> weights sum ~ 1
    w = samples.get_weights(jnp.full((4, 32, 1), 1e3))
    np.testing.assert_allclose(w.sum(axis=-2), 1.0, atol=1e-3)
    # zero density -> zero weights
    w0 = samples.get_weights(jnp.zeros((4, 32, 1)))
    np.testing.assert_allclose(w0, 0.0, atol=1e-7)


def test_weights_from_alphas():
    from neurad_tpu.core.structs import RaySamples

    alphas = jnp.full((2, 8, 1), 0.5)
    w, trans = RaySamples.get_weights_and_transmittance_from_alphas(alphas)
    # first weight = alpha, second = alpha * (1 - alpha)...
    np.testing.assert_allclose(w[:, 0, 0], 0.5, atol=1e-5)
    np.testing.assert_allclose(w[:, 1, 0], 0.25, atol=1e-4)
    assert trans.shape == (2, 9, 1)


def test_fast_isotropic_gaussian():
    f = Frustums(
        origins=jnp.zeros((2, 3)),
        directions=jnp.broadcast_to(jnp.array([1.0, 0, 0]), (2, 3)),
        starts=jnp.full((2, 1), 1.0),
        ends=jnp.full((2, 1), 2.0),
        pixel_area=jnp.full((2, 1), 0.01),
    )
    g = f.get_fast_isotropic_gaussian(3)
    assert g.mean.shape == (2, 3, 3)
    assert g.std.shape == (2, 3, 1)
    # multisamples at starts + k*(e-s)/(m+1), k=1..3 -> x = 1.25, 1.5, 1.75
    np.testing.assert_allclose(g.mean[0, :, 0], [1.25, 1.5, 1.75], atol=1e-5)
    # std^3 = pixel_area * t^2 * dist
    np.testing.assert_allclose(g.std[0, 0, 0] ** 3, 0.01 * 1.25**2 * 0.25, rtol=1e-4)


def test_tree_helpers():
    bundle = make_bundle(8)
    sub = tree_getitem(bundle, slice(0, 4))
    assert sub.origins.shape == (4, 3)
    re = tree_reshape(bundle, (2, 4))
    assert re.origins.shape == (2, 4, 3)
    assert re.metadata["is_lidar"].shape == (2, 4, 1)
    cat = tree_cat([bundle, bundle])
    assert cat.origins.shape == (16, 3)


def test_frustum_positions():
    bundle = make_bundle(2)
    samples = uniform_samples(bundle, 4)
    pos = samples.frustums.get_positions()
    assert pos.shape == (2, 4, 3)
    # first frustum midpoint along +z: nears=0.5, far=10, first bin [0.5, 2.875]
    np.testing.assert_allclose(pos[0, 0, 2], (0.5 + 2.875) / 2, atol=1e-5)
