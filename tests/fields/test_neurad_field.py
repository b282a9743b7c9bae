"""NeuRAD field tests: output shapes, SDF->alpha range, proposal density positivity."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.core.structs import RayBundle
from neurad_tpu.fields.neurad_encoding import ActorSettings, StaticSettings
from neurad_tpu.fields.neurad_field import NeuRADField, NeuRADProposalField, SigmoidDensity
from neurad_tpu.model_components.dynamic_actors import DynamicActors, empty_actor_data
from neurad_tpu.model_components.ray_samplers import UNIFORM, spaced_sampler

SMALL_STATIC = StaticSettings(num_levels=4, base_res=16, max_res=128, log2_hashmap_size=12, hashgrid_dim=4)
SMALL_ACTOR = ActorSettings(num_levels=2, base_res=16, max_res=64, log2_hashmap_size=10, hashgrid_dim=4)


def _samples(r=4, s=8):
    bundle = RayBundle(
        origins=jnp.zeros((r, 3)),
        directions=jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (r, 3)),
        pixel_area=jnp.full((r, 1), 1e-4),
        nears=jnp.full((r, 1), 1.0),
        fars=jnp.full((r, 1), 20.0),
        times=jnp.zeros((r, 1)),
        camera_indices=jnp.zeros((r, 1), dtype=jnp.int32),
    )
    return spaced_sampler(bundle, s, UNIFORM)


def test_field_outputs():
    actors = DynamicActors(data=empty_actor_data())
    field = NeuRADField(actors=actors, static_scale=50.0, static=SMALL_STATIC, actor=SMALL_ACTOR)
    rs = _samples()
    params = field.init(jax.random.PRNGKey(0), rs)
    out = field.apply(params, rs)
    assert out.features.shape == (4, 8, 32)
    assert out.sdf.shape == (4, 8, 1)
    assert out.alphas.shape == (4, 8, 1)
    a = np.asarray(out.alphas)
    assert (a >= 0).all() and (a <= 1).all()


def test_proposal_field_density_positive():
    actors = DynamicActors(data=empty_actor_data())
    field = NeuRADProposalField(
        actors=actors,
        static_scale=50.0,
        static=StaticSettings(num_levels=3, base_res=16, max_res=64, log2_hashmap_size=10, hashgrid_dim=1),
        actor=SMALL_ACTOR,
    )
    rs = _samples()
    params = field.init(jax.random.PRNGKey(0), rs)
    dens = field.apply(params, rs)
    assert dens.shape == (4, 8, 1)
    assert (np.asarray(dens) > 0).all()


def test_sigmoid_density_monotone():
    sd = SigmoidDensity(init_beta=20.0)
    params = sd.init(jax.random.PRNGKey(0), jnp.zeros((1, 1)))
    sdf = jnp.array([[-1.0], [0.0], [1.0]])
    a = np.asarray(sd.apply(params, sdf))
    assert a[0, 0] > a[1, 0] > a[2, 0]
    np.testing.assert_allclose(a[1, 0], 0.5, atol=1e-5)


def test_field_grad_flows():
    actors = DynamicActors(data=empty_actor_data())
    field = NeuRADField(actors=actors, static_scale=50.0, static=SMALL_STATIC, actor=SMALL_ACTOR)
    rs = _samples()
    params = field.init(jax.random.PRNGKey(0), rs)

    @jax.jit
    def loss(p):
        out = field.apply(p, rs)
        return jnp.mean(out.features**2) + jnp.mean(out.alphas)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
