"""Nerfacto field: hashgrid + density MLP + SH-dir color head + appearance.

TPU-native counterpart of `nerfstudio/fields/nerfacto_field.py:44`
(NerfactoField).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurad_tpu.core.scene_box import SceneBox
from neurad_tpu.core.structs import RaySamples
from neurad_tpu.fields.activations import trunc_exp
from neurad_tpu.fields.encodings import HashEncoding, SHEncoding
from neurad_tpu.fields.mlp import MLP
from neurad_tpu.fields.neurad_field import get_normalized_directions
from neurad_tpu.fields.spatial_distortions import scene_contraction


class NerfactoOutputs(NamedTuple):
    density: jnp.ndarray  # [R, S, 1]
    rgb: jnp.ndarray  # [R, S, 3]


class NerfactoField(nn.Module):
    """The nerfacto field (`nerfacto_field.py:44-200`)."""

    aabb: tuple
    num_images: int = 1
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 32
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    use_scene_contraction: bool = True
    use_average_appearance_embedding: bool = True

    def setup(self):
        self.encoding = HashEncoding(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
        )
        self.direction_encoding = SHEncoding(levels=4)
        self.mlp_base = MLP(
            out_dim=1 + self.geo_feat_dim, num_layers=self.num_layers, layer_width=self.hidden_dim
        )
        self.mlp_head = MLP(
            out_dim=3,
            num_layers=self.num_layers_color,
            layer_width=self.hidden_dim_color,
            out_activation=nn.sigmoid,
        )
        if self.appearance_embedding_dim > 0:
            self.appearance_embedding = nn.Embed(self.num_images, self.appearance_embedding_dim)

    def get_density(self, ray_samples: RaySamples) -> jnp.ndarray:
        density, _ = self._density_and_embedding(ray_samples)
        return density

    def _density_and_embedding(self, ray_samples: RaySamples):
        positions = ray_samples.frustums.get_positions()
        if self.use_scene_contraction:
            positions = (scene_contraction(positions) + 2.0) / 4.0
        else:
            positions = SceneBox.get_normalized_positions(positions, jnp.asarray(self.aabb))
        feats = self.encoding(positions)
        h = self.mlp_base(feats)
        density = trunc_exp(h[..., :1])
        return density, h[..., 1:]

    def __call__(self, ray_samples: RaySamples, train: bool = False) -> NerfactoOutputs:
        density, embedding = self._density_and_embedding(ray_samples)
        directions = get_normalized_directions(ray_samples.frustums.directions)
        d_enc = self.direction_encoding(directions)
        head_in = [d_enc, embedding]
        if self.appearance_embedding_dim > 0:
            if ray_samples.camera_indices is not None:
                idx = ray_samples.camera_indices[..., 0].astype(jnp.int32)
                embed = self.appearance_embedding(idx)
            else:
                embed = jnp.broadcast_to(
                    jnp.mean(self.appearance_embedding.embedding, axis=0),
                    density.shape[:-1] + (self.appearance_embedding_dim,),
                )
            head_in.append(embed)
        rgb = self.mlp_head(jnp.concatenate(head_in, axis=-1))
        return NerfactoOutputs(density=density, rgb=rgb)
