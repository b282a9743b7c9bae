"""Splatfacto: upstream-style static 3D gaussian splatting with SH colors.

TPU-native counterpart of `nerfstudio/models/splatfacto.py:150` (SplatfactoModel,
`gsplat.rasterization` with sh_degree): per-gaussian SH coefficients are
evaluated at the camera-center view direction (gsplat convention) and rasterized
with the same tile pipeline as SplatAD.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.model_components import losses as L
from neurad_tpu.ops import gaussian_rasterize as GR
from neurad_tpu.ops import gaussians as G
from neurad_tpu.ops.spherical_harmonics import components_from_spherical_harmonics


@dataclasses.dataclass(frozen=True)
class SplatfactoConfig:
    sh_degree: int = 3
    tile_size: int = 16
    max_per_tile: int = 256
    max_tiles_per_gaussian: int = 16
    near_plane: float = 0.2
    eps2d: float = 0.3
    ssim_lambda: float = 0.2
    background_color: Tuple[float, float, float] = (0.1490, 0.1647, 0.2157)
    # same backend landscape as SplatAD: 'pallas' fwd+bwd VMEM kernels win the
    # v5e A/B (PERFORMANCE.md); CPU mesh auto-falls back to 'xla' above 64 tiles
    rasterize_backend: str = "pallas"


def random_init_gaussians(num_points: int, extent: float = 10.0, seed: int = 0, sh_degree: int = 3):
    """Random-init splat params (`splatfacto.py:220-280` random seeding path)."""
    rng = np.random.default_rng(seed)
    n_sh = (sh_degree + 1) ** 2
    quats = np.zeros((num_points, 4), dtype=np.float32)
    quats[:, 0] = 1.0
    return {
        "means": (rng.uniform(-0.5, 0.5, (num_points, 3)) * extent).astype(np.float32),
        "scales": np.full((num_points, 3), np.log(extent / num_points ** (1 / 3)), dtype=np.float32),
        "quats": quats,
        "sh_dc": rng.normal(0, 0.1, (num_points, 3)).astype(np.float32),
        "sh_rest": np.zeros((num_points, (n_sh - 1) * 3), dtype=np.float32),
        "opacities": np.full((num_points,), np.log(0.1 / 0.9), dtype=np.float32),
    }


class SplatfactoModel(nn.Module):
    """Static 3DGS model (`splatfacto.py:150-760`)."""

    init_params: dict  # from random_init_gaussians or point seeding
    config: SplatfactoConfig = SplatfactoConfig()

    def setup(self):
        for k, v in self.init_params.items():
            setattr(self, k, self.param(k, lambda _, vv=v: jnp.asarray(vv)))

    def _sh_colors(self, camera_pos: jnp.ndarray) -> jnp.ndarray:
        """Evaluate SH at per-gaussian view dirs from the camera center."""
        dirs = self.means - camera_pos
        dirs = dirs / jnp.clip(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8, None)
        levels = self.config.sh_degree + 1
        basis = components_from_spherical_harmonics(levels, dirs)  # [N, L^2]
        n_sh = levels**2
        coeffs = jnp.concatenate([self.sh_dc, self.sh_rest], axis=-1).reshape(-1, n_sh, 3)
        rgb = jnp.einsum("nk,nkc->nc", basis, coeffs)
        return jnp.clip(rgb + 0.5, 0.0, 1.0)

    def render(
        self,
        c2w_opengl: jnp.ndarray,
        K: jnp.ndarray,
        width: int,
        height: int,
        means2d_offset: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """means2d_offset: zeros [N,2] whose gradient is d(loss)/d(means2d) —
        the absgrad signal gsplat reads off the projected tensor's retained
        grad; here it rides the normal grad computation as an extra argument."""
        cfg = self.config
        flip = jnp.diag(jnp.array([1.0, -1.0, -1.0]))
        r_cv = c2w_opengl[:3, :3] @ flip
        r_wc = r_cv.T
        t_wc = -r_wc @ c2w_opengl[:3, 3]
        viewmat = jnp.eye(4).at[:3, :3].set(r_wc).at[:3, 3].set(t_wc)

        covar6 = G.quat_scale_to_covar6(self.quats, jnp.exp(self.scales))
        proj = G.project_gaussians_camera(
            self.means, covar6=covar6, viewmat=viewmat, K=K, width=width, height=height,
            near_plane=cfg.near_plane, eps2d=cfg.eps2d,
        )
        if means2d_offset is not None:
            proj = proj._replace(means2d=proj.means2d + means2d_offset)
        colors = self._sh_colors(c2w_opengl[:3, 3])
        rgb, depth, alpha = GR.rasterize_camera(
            proj,
            colors,
            jax.nn.sigmoid(self.opacities),
            width,
            height,
            tile_size=cfg.tile_size,
            max_per_tile=cfg.max_per_tile,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            backend=cfg.rasterize_backend,
        )
        bg = jnp.asarray(cfg.background_color)
        rgb = jnp.clip(rgb + (1.0 - alpha) * bg, 0.0, 1.0)
        return {
            "rgb": rgb,
            "depth": depth,
            "accumulation": alpha,
            "radii": jax.lax.stop_gradient(proj.radii),
        }

    def __call__(self, c2w, K, width, height):
        return self.render(c2w, K, width, height)

    def loss(self, outputs: Dict[str, jnp.ndarray], gt_image: jnp.ndarray):
        cfg = self.config
        l1 = jnp.mean(jnp.abs(outputs["rgb"] - gt_image))
        ssim_val = L.ssim(outputs["rgb"], gt_image)
        total = (1 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * (1 - ssim_val)
        return total, {
            "main_loss": total,
            "psnr": L.psnr(jax.lax.stop_gradient(outputs["rgb"]), gt_image),
            "ssim": jax.lax.stop_gradient(ssim_val),
        }
