"""Splatfacto (static 3DGS + SH) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.models.splatfacto import SplatfactoConfig, SplatfactoModel, random_init_gaussians


def test_splatfacto_render_and_loss():
    init = random_init_gaussians(256, extent=8.0, sh_degree=2)
    model = SplatfactoModel(init_params=init, config=SplatfactoConfig(sh_degree=2, max_per_tile=64))
    c2w = jnp.eye(4)[:3].at[2, 3].set(10.0)  # looking down -z from z=10
    K = jnp.array([[30.0, 0.0, 16.0], [0.0, 30.0, 12.0], [0.0, 0.0, 1.0]])
    params = model.init(jax.random.PRNGKey(0), c2w, K, 32, 24)
    out = model.apply(params, c2w, K, 32, 24)
    assert out["rgb"].shape == (24, 32, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    gt = jnp.full((24, 32, 3), 0.3)

    def loss_fn(p):
        o = model.apply(p, c2w, K, 32, 24)
        total, m = model.apply(p, o, gt, method=SplatfactoModel.loss)
        return total

    g = jax.grad(loss_fn)(params)["params"]
    assert float(jnp.abs(g["sh_dc"]).sum()) > 0
    assert float(jnp.abs(g["means"]).sum()) > 0
    assert np.isfinite(sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)))
