"""Field activations (`nerfstudio/field_components/activations.py`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp with clamped-input backward (`activations.py` TruncExp): forward exp(x),
    backward grad * exp(clamp(x, -15, 15)) — prevents fp blowups in density heads."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
