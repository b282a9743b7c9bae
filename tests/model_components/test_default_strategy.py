"""ADDefaultStrategy (fixed-capacity grow/split/prune) invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.model_components.strategy import (
    DEAD_OPACITY,
    DEAD_SCALE,
    DefaultStrategyConfig,
    alive_mask,
    default_refine,
    kill_slots,
    reset_opacities,
    should_refine_default,
)

CFG = DefaultStrategyConfig(prune_opa=0.005, grow_grad2d=0.1, grow_scale3d=0.01, prune_scale3d=10.0)


def _params(n=16, n_dead=8, opacity=2.0, scale=-3.0):
    """n slots, last n_dead dead. scale=-3 -> exp ~ 0.05 (big vs grow_scale3d*1)."""
    alive = np.arange(n) < (n - n_dead)
    return {
        "means": jnp.asarray(np.random.default_rng(0).normal(size=(n, 3)).astype(np.float32)),
        "scales": jnp.where(alive[:, None], scale, DEAD_SCALE),
        "quats": jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 4)),
        "opacities": jnp.where(alive, opacity, DEAD_OPACITY),
        "features": jnp.arange(n, dtype=jnp.float32)[:, None] * jnp.ones((n, 4)),
        "id": jnp.full((n,), 100, jnp.int32),  # static (>= n_actors)
    }


def test_alive_mask_roundtrip():
    p = _params()
    assert int(alive_mask(p).sum()) == 8
    p2 = kill_slots(p, jnp.arange(16) < 4)
    assert int(alive_mask(p2).sum()) == 4


def test_prune_low_opacity():
    p = _params()
    # slot 0 nearly transparent
    p["opacities"] = p["opacities"].at[0].set(-8.0)
    new, _ = default_refine(jax.random.PRNGKey(0), p, jnp.zeros(16), CFG, 1.0, step=600)
    a = np.asarray(alive_mask(new))
    assert not a[0], "low-opacity gaussian must be pruned"
    assert a[1:8].all()


def test_grow_duplicate_small_high_grad():
    p = _params(scale=-6.0)  # exp(-6) ~ 0.0025 <= grow_scale3d -> duplicate
    grad = jnp.zeros(16).at[2].set(1.0)  # only slot 2 above threshold
    new, _ = default_refine(jax.random.PRNGKey(0), p, grad, CFG, 1.0, step=600)
    a = np.asarray(alive_mask(new))
    assert a.sum() == 9, f"expected one duplicate, alive={a.sum()}"
    # the duplicate carries slot 2's features
    dup_slots = np.where(a & (np.arange(16) >= 8))[0]
    assert len(dup_slots) == 1
    np.testing.assert_allclose(np.asarray(new["features"][dup_slots[0]]), np.asarray(p["features"][2]))
    np.testing.assert_allclose(np.asarray(new["means"][dup_slots[0]]), np.asarray(p["means"][2]))


def test_grow_split_big_high_grad():
    p = _params(scale=0.0)  # exp(0)=1 > grow_scale3d -> split
    grad = jnp.zeros(16).at[3].set(1.0)
    new, _ = default_refine(jax.random.PRNGKey(0), p, grad, CFG, 1.0, step=600)
    a = np.asarray(alive_mask(new))
    assert a.sum() == 9
    # both halves have scales / 1.6
    new_slot = np.where(a & (np.arange(16) >= 8))[0][0]
    np.testing.assert_allclose(np.asarray(new["scales"][3]), 0.0 - np.log(1.6), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new["scales"][new_slot]), 0.0 - np.log(1.6), atol=1e-5)
    # halves moved off the original mean (sampled)
    assert np.abs(np.asarray(new["means"][3]) - np.asarray(p["means"][3])).sum() > 0


def test_capacity_respected():
    p = _params(n=8, n_dead=1, scale=-6.0)
    grad = jnp.ones(8)  # everyone wants to grow, only 1 free slot
    new, _ = default_refine(jax.random.PRNGKey(0), p, grad, CFG, 1.0, step=600)
    assert int(alive_mask(new).sum()) == 8  # capacity, not 7+7


def test_actor_never_culled_to_zero():
    p = _params()
    p["id"] = jnp.where(jnp.arange(16) < 4, 0, 100).astype(jnp.int32)  # slots 0-3 actor 0
    # every actor gaussian far outside its box
    p["means"] = p["means"].at[:4].set(jnp.array([50.0, 0.0, 0.0]))
    bounds = jnp.asarray([[1.0, 1.0, 1.0]])
    new, _ = default_refine(
        jax.random.PRNGKey(0), p, jnp.zeros(16), CFG, 1.0, step=600, actor_bounds=bounds, n_actors=1
    )
    a = np.asarray(alive_mask(new))
    assert a[:4].sum() >= 1, "actor must never be culled to zero gaussians"
    assert a[:4].sum() < 4, "outside-box actor gaussians should be mostly pruned"


def test_opacity_reset():
    p = _params(opacity=3.0)
    new = reset_opacities(p, CFG)
    op = np.asarray(jax.nn.sigmoid(new["opacities"][:8]))
    np.testing.assert_allclose(op, 0.01, rtol=1e-4)
    # dead slots untouched
    np.testing.assert_allclose(np.asarray(new["opacities"][8:]), DEAD_OPACITY)


def test_should_refine_default_schedule():
    cfg = DefaultStrategyConfig(refine_start_iter=500, refine_stop_iter=1000, refine_every=100, reset_every=3000)
    assert should_refine_default(600, cfg)
    assert not should_refine_default(650, cfg)
    assert not should_refine_default(400, cfg)
    assert not should_refine_default(1000, cfg)


def test_optimizer_moments_zeroed_at_touched_slots():
    p = _params(scale=-6.0)
    grad = jnp.zeros(16).at[2].set(1.0)
    moments = {"means": jnp.ones((16, 3))}
    new, m = default_refine(
        jax.random.PRNGKey(0), p, grad, CFG, 1.0, step=600, opt_state_moments=moments
    )
    a = np.asarray(alive_mask(new))
    dup_slot = np.where(a & (np.arange(16) >= 8))[0][0]
    assert np.asarray(m["means"][dup_slot]).sum() == 0.0
    assert np.asarray(m["means"][1]).sum() == 3.0  # untouched slot keeps moments
