"""Nerfacto model tests: forward, losses, grad flow, lidar variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurad_tpu.core.structs import RayBundle
from neurad_tpu.models.nerfacto import NerfactoModel

AABB = ((-10.0, -10.0, -10.0), (10.0, 10.0, 10.0))


def _bundle(n=16, key=0):
    rng = np.random.default_rng(key)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.1),
        directions=jnp.asarray(dirs.astype(np.float32)),
        pixel_area=jnp.full((n, 1), 1e-5),
        camera_indices=jnp.zeros((n, 1), dtype=jnp.int32),
        nears=jnp.full((n, 1), 0.1),
        fars=jnp.full((n, 1), 30.0),
    )


@pytest.fixture(scope="module")
def small_model():
    model = NerfactoModel(aabb=AABB, num_images=2, num_proposal_samples=(16, 8), num_nerf_samples=8)
    bundle = _bundle()
    params = model.init(jax.random.PRNGKey(0), bundle, True, jax.random.PRNGKey(1))
    return model, params, bundle


def test_forward_shapes(small_model):
    model, params, bundle = small_model
    out = model.apply(params, bundle, True, jax.random.PRNGKey(2))
    assert out["rgb"].shape == (16, 3)
    assert out["depth"].shape == (16, 1)
    assert out["accumulation"].shape == (16, 1)
    assert len(out["weights_list"]) == 3
    rgb = np.asarray(out["rgb"])
    assert (rgb >= 0).all() and (rgb <= 1.001).all()


def test_losses_and_grads(small_model):
    model, params, bundle = small_model
    batch = {"image": jnp.asarray(np.random.default_rng(3).uniform(size=(16, 3)).astype(np.float32))}

    def loss(p):
        out = model.apply(p, bundle, True, jax.random.PRNGKey(2))
        total, metrics = model.apply(p, out, batch, method=NerfactoModel.compute_losses)
        return total, metrics

    (total, metrics), grads = jax.value_and_grad(loss, has_aux=True)(params)
    assert np.isfinite(float(total))
    assert {"rgb_loss", "interlevel_loss", "distortion_loss", "psnr"} <= set(metrics)
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


def test_lidar_nerfacto_depth_loss():
    model = NerfactoModel(
        aabb=AABB, num_proposal_samples=(8, 8), num_nerf_samples=8,
        use_lidar_losses=True, use_gradient_scaling=True,
    )
    bundle = _bundle(8)
    params = model.init(jax.random.PRNGKey(0), bundle, True, jax.random.PRNGKey(1))
    out = model.apply(params, bundle, True, jax.random.PRNGKey(2))
    batch = {"distance": jnp.full((8, 1), 5.0)}
    total, metrics = model.apply(params, out, batch, method=NerfactoModel.compute_losses)
    assert "depth_loss" in metrics and np.isfinite(float(total))
