"""Nerfacto + lidar-nerfacto models.

TPU-native counterpart of `nerfstudio/models/nerfacto.py:52` (NerfactoModel) and
`nerfstudio/models/lidar_nerfacto.py:35` (LidarNerfactoModel = nerfacto + DS-NeRF
lidar depth loss + distance-squared gradient scaling).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurad_tpu.cameras.camera_optimizers import CameraOptimizer
from neurad_tpu.core.structs import RayBundle
from neurad_tpu.fields.density_fields import HashMLPDensityField
from neurad_tpu.fields.nerfacto_field import NerfactoField
from neurad_tpu.model_components import losses as L
from neurad_tpu.model_components.ray_samplers import UNIFORM_LIN_DISP_PIECEWISE, proposal_sampler
from neurad_tpu.ops import rendering as R


class NerfactoModel(nn.Module):
    """Nerfacto (`nerfacto.py:52-431`): hashgrid field + 2 proposal density fields."""

    aabb: tuple  # static ((mins),(maxs))
    num_images: int = 1
    num_proposal_samples: Tuple[int, ...] = (256, 96)
    num_nerf_samples: int = 48
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    camera_opt_mode: str = "off"
    appearance_embedding_dim: int = 32
    background_color: str = "last_sample"
    # lidar-nerfacto extras (`lidar_nerfacto.py:35-137`)
    use_lidar_losses: bool = False
    depth_sigma: float = 0.05
    depth_loss_mult: float = 1e-3
    use_gradient_scaling: bool = False

    def setup(self):
        self.field = NerfactoField(
            aabb=self.aabb,
            num_images=self.num_images,
            appearance_embedding_dim=self.appearance_embedding_dim,
        )
        self.proposal_networks = [
            HashMLPDensityField(aabb=self.aabb, max_res=128, log2_hashmap_size=17, name="proposal_0"),
            HashMLPDensityField(aabb=self.aabb, max_res=256, log2_hashmap_size=17, name="proposal_1"),
        ]
        self.camera_optimizer = CameraOptimizer(num_cameras=self.num_images, mode=self.camera_opt_mode)

    def get_outputs(
        self, ray_bundle: RayBundle, train: bool = False, rng: Optional[jax.Array] = None
    ) -> Dict[str, jnp.ndarray]:
        ray_bundle = self.camera_optimizer.apply_to_raybundle(ray_bundle)
        nears = ray_bundle.nears if ray_bundle.nears is not None else jnp.full_like(ray_bundle.pixel_area, 0.05)
        fars = ray_bundle.fars if ray_bundle.fars is not None else jnp.full_like(ray_bundle.pixel_area, 1000.0)
        ray_bundle = ray_bundle.replace(nears=nears, fars=fars)

        density_fns = [p.get_density for p in self.proposal_networks]
        ray_samples, weights_list, samples_list = proposal_sampler(
            ray_bundle,
            density_fns,
            self.num_proposal_samples,
            self.num_nerf_samples,
            spacing=UNIFORM_LIN_DISP_PIECEWISE,
            key=rng,
            single_jitter=True,
        )
        field_out = self.field(ray_samples, train=train)
        if self.use_gradient_scaling:
            mids = (ray_samples.frustums.starts + ray_samples.frustums.ends) / 2.0
            density = L.gradient_scaling_by_distance_squared(field_out.density, mids)
            rgb_s = L.gradient_scaling_by_distance_squared(field_out.rgb, mids)
        else:
            density, rgb_s = field_out.density, field_out.rgb

        weights = R.render_weights_from_density(density, ray_samples.deltas)
        accumulation = R.accumulate_along_rays(weights)
        rgb = R.accumulate_along_rays(weights, rgb_s)
        if self.background_color == "last_sample":
            rgb = rgb + rgb_s[..., -1, :] * (1.0 - accumulation)
        mids = (ray_samples.frustums.starts + ray_samples.frustums.ends) / 2.0
        depth = R.render_depth_expected(weights, mids)

        outputs = {"rgb": rgb, "accumulation": accumulation, "depth": depth}
        for i, (pw, ps) in enumerate(zip(weights_list, samples_list)):
            pmids = (ps.frustums.starts + ps.frustums.ends) / 2.0
            outputs[f"prop_depth_{i}"] = R.render_depth_expected(pw, pmids)
        if train:
            outputs["weights_list"] = list(weights_list) + [weights]
            outputs["sdist_list"] = [
                L.ray_samples_to_sdist(s.spacing_starts, s.spacing_ends) for s in samples_list
            ] + [L.ray_samples_to_sdist(ray_samples.spacing_starts, ray_samples.spacing_ends)]
            if self.use_lidar_losses:
                outputs["ray_samples_mids"] = mids
                outputs["weights"] = weights
        return outputs

    def __call__(self, ray_bundle: RayBundle, train: bool = False, rng=None):
        return self.get_outputs(ray_bundle, train, rng)

    def compute_losses(
        self, outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """MSE rgb + interlevel + distortion (`nerfacto.py:300-360`), plus DS-NeRF
        lidar depth loss for lidar-nerfacto (`lidar_nerfacto.py:57-137`)."""
        loss_dict: Dict[str, jnp.ndarray] = {}
        metrics: Dict[str, jnp.ndarray] = {}
        if "image" in batch:
            rgb = outputs["rgb"]
            loss_dict["rgb_loss"] = jnp.mean((batch["image"] - rgb) ** 2)
            metrics["psnr"] = L.psnr(jax.lax.stop_gradient(rgb), batch["image"])
        if "weights_list" in outputs:
            loss_dict["interlevel_loss"] = self.interlevel_loss_mult * L.interlevel_loss(
                outputs["weights_list"], outputs["sdist_list"]
            )
            loss_dict["distortion_loss"] = self.distortion_loss_mult * L.distortion_loss(
                outputs["weights_list"], outputs["sdist_list"]
            )
        if self.use_lidar_losses and "distance" in batch and "weights" in outputs:
            sigma = jnp.asarray(self.depth_sigma)
            loss_dict["depth_loss"] = self.depth_loss_mult * L.ds_nerf_depth_loss(
                outputs["weights"], batch["distance"], outputs["ray_samples_mids"],
                outputs["ray_samples_mids"] * 0 + 1.0, sigma,
            )
        if self.camera_opt_mode != "off":
            loss_dict["camera_opt_regularizer"] = self.camera_optimizer.regularization_loss()
        total = sum(loss_dict.values(), jnp.zeros(()))
        metrics.update({k: jax.lax.stop_gradient(v) for k, v in loss_dict.items()})
        return total, metrics
