"""Sampler tests (mirrors reference tests/model_components/test_ray_sampler.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.core.structs import RayBundle
from neurad_tpu.model_components import ray_samplers as rs


def make_bundle(n=16, near=1.0, far=10.0):
    return RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (n, 3)),
        pixel_area=jnp.ones((n, 1)) * 1e-4,
        nears=jnp.full((n, 1), near),
        fars=jnp.full((n, 1), far),
    )


def test_uniform_sampler_ranges():
    bundle = make_bundle()
    samples = rs.spaced_sampler(bundle, 32, rs.UNIFORM)
    assert samples.frustums.starts.shape == (16, 32, 1)
    np.testing.assert_allclose(samples.frustums.starts[:, 0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(samples.frustums.ends[:, -1, 0], 10.0, atol=1e-5)
    # deltas sum to (far - near)
    np.testing.assert_allclose(samples.deltas.sum(axis=-2)[:, 0], 9.0, atol=1e-4)


def test_stratified_jitter_within_bins():
    bundle = make_bundle()
    key = jax.random.PRNGKey(0)
    samples = rs.spaced_sampler(bundle, 32, rs.UNIFORM, key=key)
    starts = samples.frustums.starts[..., 0]
    assert (starts >= 1.0 - 1e-5).all() and (starts <= 10.0 + 1e-5).all()
    assert (samples.deltas >= 0).all()
    # two different keys give different samples
    samples2 = rs.spaced_sampler(bundle, 32, rs.UNIFORM, key=jax.random.PRNGKey(1))
    assert float(jnp.max(jnp.abs(samples.frustums.starts - samples2.frustums.starts))) > 0


def test_lin_disp_sampler_monotone():
    bundle = make_bundle()
    samples = rs.spaced_sampler(bundle, 16, rs.LIN_DISP)
    starts = samples.frustums.starts[..., 0]
    assert (jnp.diff(starts, axis=-1) > 0).all()
    # lin-disp spacing concentrates samples near the camera
    first_gap = starts[0, 1] - starts[0, 0]
    last_gap = starts[0, -1] - starts[0, -2]
    assert first_gap < last_gap


def test_power_sampler_monotone():
    bundle = make_bundle(near=0.1, far=1000.0)
    spacing = rs.power_spacing(lambda_=-1.0, scaling=0.1)
    samples = rs.spaced_sampler(bundle, 64, spacing)
    starts = samples.frustums.starts[..., 0]
    assert (jnp.diff(starts, axis=-1) > 0).all()
    np.testing.assert_allclose(starts[:, 0], 0.1, atol=1e-4)


def test_pdf_sampler_concentrates_on_peak():
    """Samples should concentrate where weights are high."""
    bundle = make_bundle(n=4)
    init = rs.spaced_sampler(bundle, 64, rs.UNIFORM)
    # peak in bins 30-34 -> euclidean ~ [5.2, 5.9]
    w = jnp.zeros((4, 64, 1)).at[:, 30:34].set(1.0)
    out = rs.pdf_sampler(bundle, init, w, 32, rs.UNIFORM, histogram_padding=0.0)
    mids = (out.frustums.starts + out.frustums.ends)[..., 0] / 2
    frac_in_peak = ((mids > 5.0) & (mids < 6.1)).mean()
    assert frac_in_peak > 0.9


def test_pdf_sampler_uniform_weights_roughly_uniform():
    bundle = make_bundle(n=2)
    init = rs.spaced_sampler(bundle, 32, rs.UNIFORM)
    w = jnp.ones((2, 32, 1))
    out = rs.pdf_sampler(bundle, init, w, 16, rs.UNIFORM)
    mids = (out.frustums.starts + out.frustums.ends)[..., 0] / 2
    # roughly uniform: mean near center of [1, 10]
    assert 4.5 < float(mids.mean()) < 6.5


def test_proposal_sampler_end_to_end():
    bundle = make_bundle(n=8)

    def density_fn(samples):
        # density peaked at z = 5
        z = samples.frustums.get_positions()[..., 2:3]
        return 10.0 * jnp.exp(-((z - 5.0) ** 2))

    final, weights_list, samples_list = rs.proposal_sampler(
        bundle,
        [density_fn, density_fn],
        num_proposal_samples_per_ray=(32, 16),
        num_nerf_samples_per_ray=8,
        key=jax.random.PRNGKey(0),
    )
    assert final.frustums.starts.shape == (8, 8, 1)
    assert len(weights_list) == 2 and len(samples_list) == 2
    assert weights_list[0].shape == (8, 32, 1)
    # final samples concentrate around the visible (front) side of the opaque
    # gaussian at z=5 (transmittance peaks weights slightly before the center)
    mids = (final.frustums.starts + final.frustums.ends)[..., 0] / 2
    assert 3.0 < float(mids.mean()) < 5.5
    assert ((mids > 2.0) & (mids < 6.5)).mean() > 0.9


def test_proposal_sampler_jits():
    bundle = make_bundle(n=8)

    def density_fn(samples):
        z = samples.frustums.get_positions()[..., 2:3]
        return jnp.ones_like(z)

    @jax.jit
    def run(b, key):
        final, wl, sl = rs.proposal_sampler(
            b, [density_fn], (16,), 8, key=key
        )
        return final.frustums.starts

    out = run(bundle, jax.random.PRNGKey(0))
    assert out.shape == (8, 8, 1)
