"""MLP (flax.linen) — the framework's counterpart of tcnn FullyFusedMLP / torch MLP.

Counterpart of `nerfstudio/field_components/mlp.py:60-294`. On TPU the MXU already
fuses matmul chains under XLA, so the default path is plain linen Dense layers in
bfloat16-friendly widths; a Pallas fused-MLP kernel can be slotted in behind the
same interface if profiling shows XLA off speed-of-light for width<128 chains.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """Multi-layer perceptron with optional skip connections (`mlp.py:60-183`).

    num_layers counts Dense layers (reference semantics: num_layers=2 means one
    hidden layer). out_activation=None yields raw outputs.
    """

    out_dim: int
    num_layers: int = 2
    layer_width: int = 64
    skip_connections: Tuple[int, ...] = ()
    activation: Callable = nn.relu
    out_activation: Optional[Callable] = None
    # bf16 compute with fp32 params/outputs: the reference trains its whole
    # forward under torch.autocast fp16 (`engine/trainer.py:551`); tcnn's
    # FullyFusedMLP is natively half precision
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.compute_dtype
        if dt is not None:
            x = x.astype(dt)
        inp = x
        skips = set(self.skip_connections)
        h = x
        for i in range(self.num_layers - 1):
            if i in skips and i > 0:
                h = jnp.concatenate([h, inp], axis=-1)
            h = nn.Dense(self.layer_width, name=f"hidden_{i}", dtype=dt)(h)
            h = self.activation(h)
        out = nn.Dense(self.out_dim, name="output", dtype=dt)(h)
        out = out.astype(jnp.float32)
        if self.out_activation is not None:
            out = self.out_activation(out)
        return out
