"""DynamicActors tests (`nerfstudio/model_components/dynamic_actors.py` semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.model_components.dynamic_actors import (
    ActorEdits,
    DynamicActors,
    actor_data_from_trajectories,
    empty_actor_data,
)


def _traj(t0=0.0, speed=1.0):
    ts = np.array([t0, t0 + 1.0, t0 + 2.0])
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (3, 4, 4)).copy()
    poses[:, 0, 3] = speed * (ts - t0)  # moving along +x
    return {
        "poses": poses,
        "timestamps": ts,
        "dims": np.array([2.0, 4.0, 1.5]),
        "symmetric": True,
        "deformable": False,
    }


def test_actor_data_population():
    data = actor_data_from_trajectories([_traj(), _traj(t0=1.0, speed=2.0)])
    assert data.n_actors == 2
    assert data.n_times == 4  # {0,1,2,3}
    assert data.present[:, 0].tolist() == [True, True, True, False]
    assert data.present[:, 1].tolist() == [False, True, True, True]


def test_boxes2world_interpolation():
    data = actor_data_from_trajectories([_traj()])
    actors = DynamicActors(data=data)
    params = actors.init(jax.random.PRNGKey(0), jnp.array([0.5]))
    b2w, valid = actors.apply(params, jnp.array([0.5, 1.5]))
    assert b2w.shape == (2, 1, 4, 4)
    # x position lerped: 0.5 at t=0.5, 1.5 at t=1.5
    np.testing.assert_allclose(np.asarray(b2w[:, 0, 0, 3]), [0.5, 1.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2w[:, 0, :3, :3]), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-5)
    assert bool(valid.all())


def test_boxes2world_differentiable():
    data = actor_data_from_trajectories([_traj()])
    actors = DynamicActors(data=data)
    params = actors.init(jax.random.PRNGKey(0), jnp.array([0.5]))

    def loss(p):
        b2w, _ = actors.apply(p, jnp.array([0.5]))
        return jnp.sum(b2w[..., 0, 3])

    g = jax.grad(loss)(params)
    gp = g["params"]["actor_positions"]
    # gradient flows to the two bracketing timesteps
    assert float(jnp.abs(gp).sum()) > 0


def test_actor_bounds_padding():
    data = actor_data_from_trajectories([_traj()])
    actors = DynamicActors(data=data)
    params = actors.init(jax.random.PRNGKey(0), jnp.array([0.0]))
    bounds = actors.apply(params, method=DynamicActors.actor_bounds)
    np.testing.assert_allclose(np.asarray(bounds[0]), [1.25, 2.25, 0.85], atol=1e-6)


def test_edits_shift():
    data = actor_data_from_trajectories([_traj()])
    actors = DynamicActors(data=data)
    params = actors.init(jax.random.PRNGKey(0), jnp.array([0.0]))
    edits = ActorEdits(lateral=1.0)
    b2w, _ = actors.apply(params, jnp.array([0.0]), edits, method=DynamicActors.get_boxes2world)
    # identity rotation: lateral=x shift of 1
    np.testing.assert_allclose(float(b2w[0, 0, 0, 3]), 1.0, atol=1e-5)


def test_empty_actors():
    data = empty_actor_data()
    actors = DynamicActors(data=data)
    params = actors.init(jax.random.PRNGKey(0), jnp.array([0.0]))
    b2w, valid = actors.apply(params, jnp.array([0.0]))
    assert b2w.shape == (1, 0, 4, 4)


def test_velocities():
    traj = _traj()
    traj["linear_velocities_global"] = np.tile(np.array([[1.0, 0.0, 0.0]]), (3, 1))
    traj["angular_velocities_local"] = np.zeros((3, 3))
    data = actor_data_from_trajectories([traj])
    actors = DynamicActors(data=data)
    params = actors.init(jax.random.PRNGKey(0), jnp.array([0.0]))
    vels = actors.apply(params, jnp.array([0.5]), method=DynamicActors.get_velocities)
    np.testing.assert_allclose(np.asarray(vels[0, 0, :3]), [1.0, 0.0, 0.0], atol=1e-5)
