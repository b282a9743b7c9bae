"""Generative guidance (SDS) math — tested without any pretrained backbone.

Reference behaviors: `nerfstudio/generative/stable_diffusion.py` (schedule,
SDS gradient trick, CFG form) and `positional_text_embeddings.py` (view-
conditioned prompt selection/blending)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurad_tpu.generative import (
    PositionalTextEmbeddings,
    scaled_linear_alphas_cumprod,
    sds_loss,
)
from neurad_tpu.generative.stable_diffusion import (
    StableDiffusionGuidance,
    add_noise,
    classifier_free_guidance,
)


def test_scaled_linear_schedule_matches_closed_form():
    a = scaled_linear_alphas_cumprod(1000)
    assert a.shape == (1000,)
    # monotone decreasing in (0, 1)
    assert float(a[0]) == pytest.approx(1.0 - 0.00085, rel=1e-5)
    assert np.all(np.diff(np.asarray(a)) < 0)
    assert 0.0 < float(a[-1]) < 0.01
    # matches the explicit product
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    np.testing.assert_allclose(np.asarray(a), np.cumprod(1 - betas), rtol=1e-5)


def test_add_noise_endpoints():
    a = scaled_linear_alphas_cumprod(100)
    lat = jnp.ones((1, 4, 8, 8))
    noise = jnp.full((1, 4, 8, 8), 2.0)
    early = add_noise(lat, noise, a, jnp.asarray(0))
    late = add_noise(lat, noise, a, jnp.asarray(99))
    # t=0: nearly the clean latents; any t: exact closed form
    assert float(jnp.abs(early - lat).max()) < 0.15
    expected = jnp.sqrt(a[99]) * lat + jnp.sqrt(1 - a[99]) * noise
    np.testing.assert_allclose(np.asarray(late), np.asarray(expected), rtol=1e-6)
    # noise fraction grows with t
    assert float(a[99]) < float(a[0])


def test_sds_gradient_is_score_direction():
    """grad_latents sds_loss == w(t) * (noise_pred - noise) / B — the
    DreamFusion score gradient, with no grad flowing into noise_pred."""
    key = jax.random.PRNGKey(0)
    a = scaled_linear_alphas_cumprod(1000)
    lat = jax.random.normal(key, (2, 4, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), lat.shape)
    pred = jax.random.normal(jax.random.PRNGKey(2), lat.shape)
    t = jnp.asarray(500)

    g = jax.grad(lambda l: sds_loss(l, noise, pred, a, t))(lat)
    w = 1.0 - a[t]
    np.testing.assert_allclose(np.asarray(g), np.asarray(w * (pred - noise) / lat.shape[0]), rtol=1e-5)


def test_cfg_matches_reference_form():
    text = jnp.asarray([1.0, 2.0])
    uncond = jnp.asarray([0.5, 1.0])
    out = classifier_free_guidance(text, uncond, 10.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(text + 10.0 * (text - uncond)))


def test_backbone_is_gated_on_diffusers():
    with pytest.raises(ImportError, match="diffusers"):
        StableDiffusionGuidance()


@pytest.fixture
def embeds():
    keys = ("base", "top", "side", "back", "front")
    return {k: jnp.full((2, 4, 8), float(i)) for i, k in enumerate(keys)}


def test_positional_discrete(embeds):
    p = PositionalTextEmbeddings(embeds, "discrete")
    assert float(p(20.0, 0.0)[0, 0, 0]) == 1.0  # low vertical angle -> top
    assert float(p(80.0, 0.0)[0, 0, 0]) == 4.0  # front
    assert float(p(80.0, 90.0)[0, 0, 0]) == 2.0  # side
    assert float(p(80.0, 180.0)[0, 0, 0]) == 3.0  # back
    assert float(p(80.0, 270.0)[0, 0, 0]) == 2.0  # side
    assert float(p(80.0, 359.0)[0, 0, 0]) == 4.0  # wraps to front
    assert float(p(80.0, -90.0)[0, 0, 0]) == 2.0  # negative angle wraps


def test_positional_interpolated_blends(embeds):
    p = PositionalTextEmbeddings(embeds, "interpolated")
    # at vert=90 the top term vanishes; horiz=45 is half front half side
    v = float(p(90.0, 45.0)[0, 0, 0])
    assert v == pytest.approx(0.5 * 4.0 + 0.5 * 2.0)
    # at vert=0 everything is the top embed
    assert float(p(0.0, 45.0)[0, 0, 0]) == pytest.approx(1.0)


def test_positional_off_and_validation(embeds):
    assert float(PositionalTextEmbeddings(embeds, "off")(10.0, 10.0)[0, 0, 0]) == 0.0
    with pytest.raises(ValueError, match="missing"):
        PositionalTextEmbeddings({"base": embeds["base"]}, "off")
    with pytest.raises(ValueError, match="unknown"):
        PositionalTextEmbeddings(embeds, "nope")
