"""NeuRAD hash encoding tests: actor association + feature merge semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.core.structs import GaussiansStd
from neurad_tpu.fields.neurad_encoding import ActorSettings, NeuRADHashEncoding, StaticSettings
from neurad_tpu.model_components.dynamic_actors import DynamicActors, actor_data_from_trajectories, empty_actor_data

SMALL_STATIC = StaticSettings(num_levels=4, base_res=16, max_res=128, log2_hashmap_size=12, hashgrid_dim=4)
SMALL_ACTOR = ActorSettings(num_levels=2, base_res=16, max_res=64, log2_hashmap_size=10, hashgrid_dim=4)


def _actor_at(x, y, z, dims=(2.0, 2.0, 2.0)):
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 4, 4)).copy()
    poses[:, :3, 3] = [x, y, z]
    return {
        "poses": poses,
        "timestamps": np.array([0.0, 10.0]),
        "dims": np.array(dims),
        "symmetric": False,
        "deformable": False,
    }


def _gaussians(ray_points):
    """ray_points: [R, S, 3] -> GaussiansStd with M=1 multisample."""
    mean = jnp.asarray(ray_points)[:, :, None, :]
    std = jnp.full(mean.shape[:-1] + (1,), 0.01)
    return GaussiansStd(mean=mean, std=std)


def _encoding(data, **kw):
    actors = DynamicActors(data=data)
    kw.setdefault("static", SMALL_STATIC)
    kw.setdefault("actor", SMALL_ACTOR)
    return NeuRADHashEncoding(actors=actors, static_scale=100.0, **kw)


def test_no_actors_static_only():
    enc = _encoding(empty_actor_data())
    pts = np.random.default_rng(0).normal(size=(4, 8, 3)) * 10
    g = _gaussians(pts)
    times = jnp.zeros((4, 1))
    dirs = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (4, 8, 3))
    params = enc.init(jax.random.PRNGKey(0), g, times, dirs)
    feats, out_dirs = enc.apply(params, g, times, dirs)
    assert feats.shape == (4, 8, SMALL_STATIC.num_levels * SMALL_STATIC.hashgrid_dim)
    np.testing.assert_allclose(np.asarray(out_dirs), np.asarray(dirs))


def test_actor_samples_get_actor_features():
    # one actor at (5,0,0); ray along +x through it
    data = actor_data_from_trajectories([_actor_at(5.0, 0.0, 0.0)])
    enc = _encoding(data)
    s = 16
    ts = np.linspace(0.0, 10.0, s)
    pts = np.stack([np.stack([ts, np.zeros(s), np.zeros(s)], -1)])  # [1, S, 3] along x
    g = _gaussians(pts)
    times = jnp.zeros((1, 1))
    dirs = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (1, s, 3))
    params = enc.init(jax.random.PRNGKey(0), g, times, dirs)
    feats, _ = enc.apply(params, g, times, dirs)

    # features at in-actor samples must differ from the disable_actors result
    enc_off = _encoding(data, disable_actors=True)
    feats_off, _ = enc_off.apply(params, g, times, dirs)
    inside = np.abs(ts - 5.0) < 1.0  # bounds 1.0+padding
    diff = np.abs(np.asarray(feats) - np.asarray(feats_off)).sum(-1)
    assert (diff[0][inside] > 0).all(), "in-actor samples should use actor grid"
    far_outside = np.abs(ts - 5.0) > 2.0
    np.testing.assert_allclose(diff[0][far_outside], 0.0, atol=1e-7)


def test_actor_feature_padding_zero():
    # actor grid out dim (2*4=8) < static (4*4=16): padded features must be 0 beyond 8
    data = actor_data_from_trajectories([_actor_at(5.0, 0.0, 0.0)])
    enc = _encoding(data)
    pts = np.array([[[5.0, 0.0, 0.0]]])  # single sample dead-center
    # need >=2 samples for the line test; duplicate
    pts = np.repeat(pts, 2, axis=1)
    g = _gaussians(pts)
    times = jnp.zeros((1, 1))
    params = enc.init(jax.random.PRNGKey(0), g, times, None)
    feats, _ = enc.apply(params, g, times, None)
    np.testing.assert_allclose(np.asarray(feats[0, 0, 8:]), 0.0, atol=1e-7)


def test_direction_transform_in_actor_frame():
    # actor rotated 90deg about z: world +x dir becomes -y (wait: w2b = R^T) in box frame
    traj = _actor_at(5.0, 0.0, 0.0)
    rot = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=np.float32)
    traj["poses"][:, :3, :3] = rot
    data = actor_data_from_trajectories([traj])
    enc = _encoding(data)
    s = 4
    ts = np.linspace(4.5, 5.5, s)
    pts = np.stack([np.stack([ts, np.zeros(s), np.zeros(s)], -1)])
    g = _gaussians(pts)
    times = jnp.zeros((1, 1))
    dirs = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (1, s, 3))
    params = enc.init(jax.random.PRNGKey(0), g, times, dirs)
    _, out_dirs = enc.apply(params, g, times, dirs)
    # w2b rotation = R^T: R^T @ (1,0,0) = (0,-1,0)
    np.testing.assert_allclose(np.asarray(out_dirs[0, 0]), [0.0, -1.0, 0.0], atol=1e-5)


def test_flip_augmentation_changes_x():
    data = actor_data_from_trajectories([_actor_at(5.0, 0.0, 0.0)])
    enc = _encoding(data, actor=ActorSettings(
        num_levels=2, base_res=16, max_res=64, log2_hashmap_size=10, hashgrid_dim=4, flip_prob=1.0
    ))
    s = 4
    ts = np.linspace(4.5, 5.5, s)
    pts = np.stack([np.stack([ts, np.zeros(s), np.zeros(s)], -1)])
    g = _gaussians(pts)
    times = jnp.zeros((1, 1))
    dirs = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (1, s, 3))
    params = enc.init(jax.random.PRNGKey(0), g, times, dirs)
    _, dirs_flipped = enc.apply(params, g, times, dirs, True, jax.random.PRNGKey(1))
    _, dirs_plain = enc.apply(params, g, times, dirs)
    np.testing.assert_allclose(np.asarray(dirs_flipped[..., 0]), -np.asarray(dirs_plain[..., 0]), atol=1e-6)


def test_encoding_jits_and_grads():
    data = actor_data_from_trajectories([_actor_at(5.0, 0.0, 0.0)])
    enc = _encoding(data)
    s = 8
    pts = np.random.default_rng(1).normal(size=(2, s, 3)) * 5
    g = _gaussians(pts)
    times = jnp.zeros((2, 1))
    dirs = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (2, s, 3))
    params = enc.init(jax.random.PRNGKey(0), g, times, dirs)

    @jax.jit
    def loss(p):
        feats, _ = enc.apply(p, g, times, dirs)
        return jnp.sum(feats**2)

    grads = jax.grad(loss)(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads))
    assert np.isfinite(total) and total > 0


def test_compaction_overflow_falls_back_to_static():
    """When more samples hit actor boxes than the compaction capacity, the
    overflowed samples must keep their STATIC features (not all-zero rows)."""
    # huge actor so every sample of every ray is inside its box
    data = actor_data_from_trajectories([_actor_at(0.0, 0.0, 0.0, dims=(500.0, 500.0, 500.0))])
    enc = _encoding(data, actor_compaction=8)
    r, s = 16, 128  # r*s = 2048 hits, cap = max(128, 2048//8) = 256
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 50, size=(r, s, 3)).astype(np.float32)
    g = _gaussians(pts)
    times = jnp.zeros((r, 1))
    params = enc.init(jax.random.PRNGKey(0), g, times, None)
    feats, _ = enc.apply(params, g, times, None)

    enc_off = _encoding(data, disable_actors=True)
    feats_off, _ = enc_off.apply(params, g, times, None)

    f = np.asarray(feats).reshape(r * s, -1)
    f_off = np.asarray(feats_off).reshape(r * s, -1)
    is_actor = np.abs(f - f_off).sum(-1) > 1e-9
    n_actor = int(is_actor.sum())
    assert 0 < n_actor <= 256, f"expected <=cap actor-encoded samples, got {n_actor}"
    # every other sample must EQUAL the static encoding — never a zero row
    others = f[~is_actor]
    np.testing.assert_allclose(others, f_off[~is_actor], atol=0)
    assert (np.abs(others).sum(-1) > 0).all(), "overflowed samples were zeroed"


def test_compact_merge_matches_scatter_set_form():
    """`_compact_merge` (inverse-gather + custom VJP) must equal the plain
    scatter-set + covered + where formulation — values AND gradients — incl.
    the overflow case where flat_hit has more hits than capacity."""
    import jax
    import jax.numpy as jnp

    from neurad_tpu.fields.neurad_encoding import _compact_merge

    rng = np.random.default_rng(5)
    n, cap, f_a, f_out = 96, 16, 4, 8
    static = jnp.asarray(rng.normal(size=(n, f_out)).astype(np.float32))
    sel = jnp.asarray(rng.normal(size=(cap, f_a)).astype(np.float32))
    flat_hit = jnp.asarray(rng.uniform(size=n) < 0.4)  # ~38 hits > cap=16: overflow
    top_idx = jnp.asarray(
        np.argsort(-flat_hit.astype(np.float32) - rng.uniform(size=n) * 0.01)[:cap].astype(np.int32)
    )

    def ref(static, sel):
        actor = jnp.zeros((n, f_a)).at[top_idx].set(sel)
        actor = jnp.pad(actor, ((0, 0), (0, f_out - f_a)))
        covered = jnp.zeros((n,), bool).at[top_idx].set(flat_hit[top_idx])
        m = (flat_hit & covered)[:, None]
        return jnp.where(m, actor, static)

    out = _compact_merge(static, sel, top_idx, flat_hit)
    want = ref(static, sel)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6, atol=1e-7)

    proj = jnp.asarray(rng.normal(size=(n, f_out)).astype(np.float32))
    g = jax.grad(lambda a, b: jnp.sum(_compact_merge(a, b, top_idx, flat_hit) * proj), (0, 1))(static, sel)
    gw = jax.grad(lambda a, b: jnp.sum(ref(a, b) * proj), (0, 1))(static, sel)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gw[0]), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(gw[1]), rtol=1e-6, atol=1e-7)
