"""Residual conv blocks for RGB decoders (flax, NHWC).

TPU-native counterpart of `nerfstudio/model_components/cnns.py:19-66`
(BasicBlock / BottleneckBlock). NHWC layout (XLA's native conv layout on TPU).
The reference normalizes with BatchNorm2d; stateful running averages break the
pure-function training step, so the default here is GroupNorm (equivalent
regularization for these shallow 32-channel decoders); set norm='batch' to get
flax BatchNorm with a mutable `batch_stats` collection if exact parity is needed.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def _make_norm(norm: str, train: bool):
    if norm == "group":
        return nn.GroupNorm(num_groups=8)
    if norm == "batch":
        return nn.BatchNorm(use_running_average=not train)
    return lambda x: x


class BasicBlock(nn.Module):
    """Basic residual block (`cnns.py:35-46`): conv-norm-relu-conv-norm + skip.

    Convs compute in bf16 (fp32 params) — the reference's whole forward runs
    under torch.autocast fp16 (`engine/trainer.py:551`); norms stay fp32."""

    dim: int
    kernel_size: int = 7
    norm: str = "group"  # 'group' | 'batch' | 'none'
    # bf16 by default; parity tests pass fp32 to compare against the torch oracle
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.compute_dtype
        x = x.astype(dt)
        in_dim = x.shape[-1]
        res = x if in_dim == self.dim else nn.Conv(self.dim, (1, 1), dtype=dt)(x)
        k = (self.kernel_size, self.kernel_size)
        h = nn.Conv(self.dim, k, padding="SAME", dtype=dt)(x)
        h = _make_norm(self.norm, train)(h.astype(jnp.float32)).astype(dt)
        h = nn.relu(h)
        h = nn.Conv(self.dim, k, padding="SAME", dtype=dt)(h)
        h = _make_norm(self.norm, train)(h.astype(jnp.float32)).astype(dt)
        return nn.relu(res + h).astype(jnp.float32)


class BottleneckBlock(nn.Module):
    """Bottleneck residual block (`cnns.py:49-66`)."""

    dim: int
    kernel_size: int = 3
    channel_multiplier: int = 1
    norm: str = "group"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_dim = x.shape[-1]
        res = x if in_dim == self.dim else nn.Conv(self.dim, (1, 1))(x)
        mid = self.channel_multiplier * self.dim
        k = (self.kernel_size, self.kernel_size)
        h = nn.Conv(mid, (1, 1))(x)
        h = _make_norm(self.norm, train)(h)
        h = nn.relu(h)
        h = nn.Conv(mid, k, padding="SAME")(h)
        h = _make_norm(self.norm, train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (1, 1))(h)
        h = _make_norm(self.norm, train)(h)
        return nn.relu(res + h)


class RGBDecoderCNN(nn.Module):
    """NeuRAD's patch RGB decoder (`models/neurad.py:201-216`): 1x1 conv -> 2x
    BasicBlock(k7) -> ConvTranspose(stride=upsample) -> 2x BasicBlock(k7) ->
    1x1 conv -> sigmoid. Input [B, H, W, C_feat+appearance]; output
    [B, H*up, W*up, 3]."""

    hidden_dim: int = 32
    upsample_factor: int = 3
    norm: str = "group"
    # None = fp32 end-to-end (parity mode); default bf16 matches the blocks
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dt = self.compute_dtype or jnp.float32
        block = lambda: BasicBlock(self.hidden_dim, 7, self.norm, compute_dtype=dt)
        h = nn.relu(nn.Conv(self.hidden_dim, (1, 1), dtype=dt)(x.astype(dt)))
        h = block()(h, train)
        h = block()(h, train)
        up = self.upsample_factor
        h = nn.ConvTranspose(self.hidden_dim, (up, up), strides=(up, up), dtype=dt)(h.astype(dt))
        h = block()(h, train)
        h = block()(h, train)
        # fp32 head: a bf16 1x1 conv + sigmoid quantizes RGB to ~2^-9 absolute
        # (a ~50 dB PSNR ceiling, coarser than the reference's fp16 autocast);
        # the 3-channel head is cheap so the bf16 win stays in the blocks.
        return nn.sigmoid(nn.Conv(3, (1, 1), dtype=jnp.float32)(h.astype(jnp.float32)))
