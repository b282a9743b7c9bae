"""LPIPS / FID machinery tests (random-backbone mode)."""

import jax
import numpy as np
import jax.numpy as jnp

from neurad_tpu.model_components.perceptual import load_vgg19_params, vgg_perceptual_loss
from neurad_tpu.utils.eval_metrics import fid, fid_suite_shifts, lpips


def test_lpips_zero_for_identical():
    params = load_vgg19_params(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32))
    d_same = float(lpips(params, img, img))
    d_diff = float(lpips(params, img, 1.0 - img))
    assert d_same < 1e-6
    assert d_diff > d_same


def test_vgg_perceptual_loss_orders():
    params = load_vgg19_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    near = a + 0.01
    far = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    l_near = float(vgg_perceptual_loss(params, near, a))
    l_far = float(vgg_perceptual_loss(params, far, a))
    assert l_near < l_far


def test_fid_discriminates():
    rng = np.random.default_rng(2)
    real = [rng.uniform(size=(32, 32, 3)).astype(np.float32) for _ in range(6)]
    same_dist = [rng.uniform(size=(32, 32, 3)).astype(np.float32) for _ in range(6)]
    shifted = [np.clip(r * 0.2, 0, 1) for r in real]
    params = load_vgg19_params(jax.random.PRNGKey(0))
    f_same = fid(real, same_dist, params)
    f_shift = fid(real, shifted, params)
    assert f_shift > f_same


def test_fid_suite_shifts_signs():
    s = fid_suite_shifts(-1)
    assert s["lane_shift_2m"] == (-2.0, 0.0)
    assert s["vertical_shift_1m"] == (0.0, 1.0)
