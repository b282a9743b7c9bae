"""Proposal density fields for nerfacto-family models.

TPU-native counterpart of `nerfstudio/fields/density_fields.py:35`
(HashMLPDensityField): small hashgrid + MLP -> trunc_exp density.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from neurad_tpu.core.scene_box import SceneBox
from neurad_tpu.core.structs import RaySamples
from neurad_tpu.fields.activations import trunc_exp
from neurad_tpu.fields.encodings import HashEncoding
from neurad_tpu.fields.mlp import MLP
from neurad_tpu.fields.spatial_distortions import scene_contraction


class HashMLPDensityField(nn.Module):
    """Density-only proposal field (`density_fields.py:35-118`)."""

    aabb: tuple  # ((xmin,ymin,zmin),(xmax,ymax,zmax)) static
    num_layers: int = 2
    hidden_dim: int = 16
    num_levels: int = 5
    base_res: int = 16
    max_res: int = 256
    log2_hashmap_size: int = 18
    features_per_level: int = 2
    use_scene_contraction: bool = True
    use_linear: bool = False

    def setup(self):
        self.encoding = HashEncoding(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
        )
        if self.use_linear:
            self.head = nn.Dense(1)
        else:
            self.head = MLP(out_dim=1, num_layers=self.num_layers, layer_width=self.hidden_dim)

    def get_density(self, ray_samples: RaySamples) -> jnp.ndarray:
        positions = ray_samples.frustums.get_positions()
        aabb = jnp.asarray(self.aabb)
        if self.use_scene_contraction:
            positions = scene_contraction(positions)
            positions = (positions + 2.0) / 4.0
        else:
            positions = SceneBox.get_normalized_positions(positions, aabb)
        feats = self.encoding(positions)
        return trunc_exp(self.head(feats))

    def __call__(self, ray_samples: RaySamples) -> jnp.ndarray:
        return self.get_density(ray_samples)
