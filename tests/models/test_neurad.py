"""NeuRAD model tests: forward shapes, loss computation, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurad_tpu.core.structs import RayBundle
from neurad_tpu.fields.neurad_encoding import ActorSettings, StaticSettings
from neurad_tpu.model_components.dynamic_actors import actor_data_from_trajectories, empty_actor_data
from neurad_tpu.models.neurad import NeuRADModel, SamplingSettings

TINY_STATIC = StaticSettings(num_levels=3, base_res=16, max_res=64, log2_hashmap_size=10, hashgrid_dim=4)
TINY_PROP = StaticSettings(num_levels=2, base_res=16, max_res=32, log2_hashmap_size=9, hashgrid_dim=1)
TINY_ACTOR = ActorSettings(num_levels=2, base_res=16, max_res=32, log2_hashmap_size=9, hashgrid_dim=4)
TINY_SAMPLING = SamplingSettings(num_proposal_samples=(8, 8), num_nerf_samples=4)

PATCH = 2  # 2x2 ray patches
UP = 3


def _actor():
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)).copy()
    poses[:, :3, 3] = [10.0, 0.0, 0.0]
    return {
        "poses": poses,
        "timestamps": np.array([0.0, 10.0]),
        "dims": np.array([2.0, 2.0, 2.0]),
        "symmetric": False,
        "deformable": False,
    }


def _model(actor_data=None):
    return NeuRADModel(
        actor_data=actor_data if actor_data is not None else empty_actor_data(),
        static_scale=60.0,
        num_sensors=2,
        duration=10.0,
        num_train_images=4,
        sampling=TINY_SAMPLING,
        field_static=TINY_STATIC,
        field_actor=TINY_ACTOR,
        proposal_static=(TINY_PROP, TINY_PROP),
        proposal_actor=ActorSettings(num_levels=2, base_res=16, max_res=32, log2_hashmap_size=9, hashgrid_dim=1),
        appearance_dim=4,
        max_actors_per_ray=2,
    )


def _bundle(n_cam_patches=2, n_lidar=8, key=0):
    rng = np.random.default_rng(key)
    n_cam = n_cam_patches * PATCH * PATCH
    n = n_cam + n_lidar
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = rng.normal(size=(n, 3)) * 0.1
    # guarantee actor hits: a few rays start inside the actor box at (10,0,0)
    origins[:4] = np.array([10.0, 0.0, 0.0]) + rng.normal(size=(4, 3)) * 0.2
    dirs[:4] = np.array([1.0, 0.0, 0.0])
    ranges = rng.uniform(5.0, 40.0, size=(n_lidar, 1)).astype(np.float32)
    metadata = {
        "sensor_idxs": jnp.asarray(np.concatenate([np.zeros((n_cam, 1)), np.ones((n_lidar, 1))]), dtype=jnp.int32),
        "directions_norm": jnp.asarray(np.concatenate([np.ones((n_cam, 1)), ranges])),
        "did_return": jnp.asarray(
            np.concatenate([np.ones((n_cam, 1), dtype=bool), rng.uniform(size=(n_lidar, 1)) > 0.2])
        ),
    }
    bundle = RayBundle(
        origins=jnp.asarray(origins),
        directions=jnp.asarray(dirs),
        pixel_area=jnp.full((n, 1), 1e-5),
        camera_indices=jnp.zeros((n, 1), dtype=jnp.int32),
        nears=jnp.full((n, 1), 0.1),
        fars=jnp.full((n, 1), 100.0),
        times=jnp.asarray(rng.uniform(0, 10, size=(n, 1)).astype(np.float32)),
        metadata=metadata,
    )
    batch = {
        "image": jnp.asarray(rng.uniform(size=(n_cam_patches, PATCH * UP, PATCH * UP, 3)).astype(np.float32)),
        "distance": jnp.asarray(ranges),
        "did_return": metadata["did_return"][n_cam:],
        "intensity": jnp.asarray(rng.uniform(size=(n_lidar, 1)).astype(np.float32)),
    }
    return bundle, batch, n_cam


@pytest.fixture(scope="module")
def model_setup():
    model = _model(actor_data_from_trajectories([_actor()]))
    bundle, batch, n_cam = _bundle()
    params = model.init(
        jax.random.PRNGKey(0), bundle, (PATCH, PATCH), n_cam, True, jax.random.PRNGKey(1),
        method=NeuRADModel.get_outputs,
    )
    return model, params, bundle, batch, n_cam


def test_forward_shapes(model_setup):
    model, params, bundle, batch, n_cam = model_setup
    out = model.apply(params, bundle, (PATCH, PATCH), n_cam, True, jax.random.PRNGKey(2),
                      method=NeuRADModel.get_outputs)
    n = bundle.origins.shape[0]
    assert out["rgb"].shape == (n_cam // (PATCH * PATCH), PATCH * UP, PATCH * UP, 3)
    assert out["intensity"].shape == (n - n_cam, 1)
    assert out["ray_drop_logits"].shape == (n - n_cam, 1)
    assert out["depth"].shape == (n, 1)
    assert out["accumulation"].shape == (n, 1)
    assert out["interlevel_per_ray"].shape == (n,)
    assert out["distortion_per_ray"].shape == (n,)
    assert out["carving_per_ray"].shape == (n,)
    rgb = np.asarray(out["rgb"])
    assert (rgb >= 0).all() and (rgb <= 1).all()


def test_losses_finite(model_setup):
    model, params, bundle, batch, n_cam = model_setup

    def loss_fn(p):
        out = model.apply(p, bundle, (PATCH, PATCH), n_cam, True, jax.random.PRNGKey(2),
                          method=NeuRADModel.get_outputs)
        total, metrics = model.apply(p, out, batch, n_cam, method=NeuRADModel.compute_losses)
        return total, metrics

    (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # all major loss heads present
    for k in ["rgb_loss", "depth_loss", "intensity_loss", "ray_drop_loss", "carving_loss",
              "interlevel_loss", "distortion_loss", "depth_loss_0", "carving_loss_1", "psnr"]:
        assert k in metrics, f"missing {k}"
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


def test_grads_reach_all_components(model_setup):
    model, params, bundle, batch, n_cam = model_setup

    def loss_fn(p):
        out = model.apply(p, bundle, (PATCH, PATCH), n_cam, True, jax.random.PRNGKey(2),
                          method=NeuRADModel.get_outputs)
        total, _ = model.apply(p, out, batch, n_cam, method=NeuRADModel.compute_losses)
        return total

    grads = jax.grad(loss_fn)(params)["params"]
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    zero_paths = [jax.tree_util.keystr(k) for k, v in flat if float(jnp.abs(v).sum()) == 0.0]
    # trajectory params and hash tables must all receive gradient
    for needle in ["static_hash_table", "actor_positions", "rgb_decoder", "lidar_decoder", "appearance_embedding"]:
        assert not any(needle in z for z in zero_paths), f"zero grad at {needle}: {zero_paths}"


def test_eval_forward_no_rng(model_setup):
    model, params, bundle, batch, n_cam = model_setup
    out = model.apply(params, bundle, (PATCH, PATCH), n_cam, method=NeuRADModel.get_outputs)
    assert "interlevel_per_ray" not in out
    assert np.isfinite(np.asarray(out["depth"])).all()
