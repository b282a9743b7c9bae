"""Encodings as flax.linen modules: hash grid, spherical harmonics, NeRF frequency.

Counterpart of `nerfstudio/field_components/encodings.py` (HashEncoding 311,
SHEncoding 760, NeRFEncoding 99). The hash table is a linen param; the functional
core lives in `neurad_tpu.ops.hash_encoding` so kernels and tests share it.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from neurad_tpu.core.structs import GaussiansStd
from neurad_tpu.ops import hash_encoding as he
from neurad_tpu.ops.spherical_harmonics import components_from_spherical_harmonics


class HashEncoding(nn.Module):
    """Multi-res hash encoding (`encodings.py:311-470`), 3D or 4D input.

    Inputs are positions in [0,1]^D. When called with a GaussiansStd it applies the
    NeuRAD per-level anti-aliasing downweighting and averages over multisamples
    (`field_components/neurad_encoding.py:265-268,297-304`).
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    n_input_dims: int = 3
    hash_init_scale: float = 0.001
    cell_packed: bool = False  # TPU fast path: one row per cell (see ops/hash_encoding)

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    def setup(self):
        # cell packing widens rows by 2^D; entries divide by 2^D for constant bytes
        packing = 2**self.n_input_dims if self.cell_packed else 1
        self.table_size = max(2**self.log2_hashmap_size // packing, 1)
        scales_np = he.level_scales(self.num_levels, self.min_res, self.max_res)
        self.scales = jnp.asarray(scales_np)
        # per-level tables, dense-sized for coarse levels + bucket-packed rows
        # for big levels (see ops/hash_encoding)
        _, self.dense_res, self.bucket_pack = he.level_layout(
            scales_np, self.n_input_dims, self.table_size, self.cell_packed
        )
        # 1-D param leaves, 2-D views at the use site (see ops/hash_encoding
        # flatten_tables: prevents a per-step optimizer relayout pathology)
        shapes = he.table_physical_shapes(
            scales_np, self.n_input_dims, self.table_size, self.features_per_level,
            cell_packed=self.cell_packed,
        )
        flat = self.param(
            "hash_table",
            lambda key: he.flatten_tables(he.init_hash_tables(
                key, scales_np, self.n_input_dims, self.table_size, self.features_per_level,
                self.hash_init_scale, cell_packed=self.cell_packed,
            )),
        )
        self.hash_table = he.unflatten_tables(flat, shapes)

    def __call__(self, positions) -> jnp.ndarray:
        if isinstance(positions, GaussiansStd):
            return he.hash_encode_gaussians(
                positions.mean, positions.std, self.hash_table, self.scales,
                cell_packed=self.cell_packed, dense_res=self.dense_res, bucket_pack=self.bucket_pack,
            )
        return he.hash_encode(
            positions, self.hash_table, self.scales, cell_packed=self.cell_packed,
            dense_res=self.dense_res, bucket_pack=self.bucket_pack,
        )

    def encode_with_level_weights(self, positions: jnp.ndarray, level_weights: Optional[jnp.ndarray]) -> jnp.ndarray:
        return he.hash_encode(
            positions, self.hash_table, self.scales, level_weights=level_weights,
            cell_packed=self.cell_packed, dense_res=self.dense_res, bucket_pack=self.bucket_pack,
        )


class SHEncoding(nn.Module):
    """Spherical harmonic direction encoding (`encodings.py:760-805`)."""

    levels: int = 4

    @property
    def out_dim(self) -> int:
        return self.levels**2

    def __call__(self, directions: jnp.ndarray) -> jnp.ndarray:
        return components_from_spherical_harmonics(self.levels, directions)


class NeRFEncoding(nn.Module):
    """Sinusoidal frequency encoding (`encodings.py:99-194`)."""

    in_dim: int = 3
    num_frequencies: int = 10
    min_freq_exp: float = 0.0
    max_freq_exp: float = 8.0
    include_input: bool = False

    @property
    def out_dim(self) -> int:
        d = self.in_dim * self.num_frequencies * 2
        return d + (self.in_dim if self.include_input else 0)

    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        freqs = 2.0 ** jnp.linspace(self.min_freq_exp, self.max_freq_exp, self.num_frequencies)
        scaled = in_tensor[..., None] * freqs  # [..., D, F]
        scaled = scaled.reshape(in_tensor.shape[:-1] + (-1,))
        encoded = jnp.concatenate([jnp.sin(2.0 * jnp.pi * scaled), jnp.cos(2.0 * jnp.pi * scaled)], axis=-1)
        if self.include_input:
            encoded = jnp.concatenate([encoded, in_tensor], axis=-1)
        return encoded
