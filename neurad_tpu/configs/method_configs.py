"""Method presets: full training configurations by name.

TPU-native counterpart of `nerfstudio/configs/method_configs.py` (method_configs
dict 49, neurad preset 395-433, *-scaleopt / scaled variants 451-545). tyro isn't
available in this image, so presets are plain dataclasses resolved by name with
dotted-path CLI overrides (`scripts/train.py`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

from neurad_tpu.data.datamanager import ADDataManagerConfig
from neurad_tpu.engine.optimizers import NEURAD_OPTIMIZER_GROUPS, OptimizerGroupConfig
from neurad_tpu.engine.trainer import TrainerConfig
from neurad_tpu.models.neurad import LossSettings, SamplingSettings
from neurad_tpu.pipelines.ad_pipeline import ADPipelineConfig


@dataclasses.dataclass
class MethodConfig:
    """One method's full training setup (reference TrainerConfig preset)."""

    method_name: str
    trainer: TrainerConfig
    pipeline: object  # ADPipelineConfig | SplatADPipelineConfig
    dataparser: str = "synthetic"
    description: str = ""
    pipeline_type: str = "ad"  # 'ad' (ray-based) | 'splatad' (full-sensor)

    def build_pipeline(self, outputs):
        if self.pipeline_type == "splatad":
            from neurad_tpu.pipelines.splatad_pipeline import SplatADPipeline

            return SplatADPipeline(outputs, self.pipeline)
        if self.pipeline_type == "splatfacto":
            from neurad_tpu.pipelines.splatfacto_pipeline import SplatfactoPipeline

            return SplatfactoPipeline(outputs, self.pipeline)
        from neurad_tpu.pipelines.ad_pipeline import ADPipeline

        return ADPipeline(outputs, self.pipeline)


def _scaled(cfg: MethodConfig, scale: float, newname: str) -> MethodConfig:
    """Scale training length (`method_configs.py:451-462` _scaled_neurad_training)."""
    import copy

    out = copy.deepcopy(cfg)
    out.method_name = newname
    t = out.trainer
    t.max_num_iterations = int((t.max_num_iterations - 1) * scale + 1)
    t.steps_per_eval_batch = int(t.steps_per_eval_batch * scale)
    t.steps_per_save = int(t.steps_per_save * scale)
    for g in out.pipeline.optimizer_groups.values():
        object.__setattr__(g, "max_steps", int((g.max_steps - 1) * scale + 1)) if dataclasses.is_dataclass(g) else None
    return out


def _neurad() -> MethodConfig:
    """The `neurad` preset (`method_configs.py:395-433`)."""
    return MethodConfig(
        method_name="neurad",
        description="NeuRAD: neural feature field for dynamic AD scenes",
        trainer=TrainerConfig(
            max_num_iterations=20001,
            steps_per_eval_batch=500,
            steps_per_save=2000,
            steps_per_log=100,
        ),
        pipeline=ADPipelineConfig(
            datamanager=ADDataManagerConfig(num_cam_patches=40, patch_size=32, num_lidar_rays=16384),
            model_overrides=dict(sampling=SamplingSettings()),
            optimizer_groups=dict(NEURAD_OPTIMIZER_GROUPS),
        ),
    )


def _neurad_parity() -> MethodConfig:
    """`neurad-parity`: reference-faithful end-to-end — hashgrid proposal
    fields (`density_fields.py:35`), face-shared corner entries
    (cell_packed=False), the reference's hashed-every-level table layout
    (parity=True), fp32 table reads and fp32 field MLPs. ~3x slower on TPU
    than the `neurad` TPU-first defaults; use when matching the reference's
    numerics matters more than throughput (see PERFORMANCE.md quality A/B:
    the TPU defaults measure within noise of this config on PSNR/SSIM)."""
    from neurad_tpu.fields.neurad_encoding import ActorSettings, StaticSettings

    cfg = _neurad()
    cfg.method_name = "neurad-parity"
    cfg.description = "NeuRAD with reference-exact architecture + numerics (slower on TPU)"
    cfg.pipeline.model_overrides = dict(
        cfg.pipeline.model_overrides,
        proposal_mode="hashgrid",
        compute_fp32=True,
        # NOTE: decoder norm stays "group" — the reference's BatchNorm2d needs
        # mutable running-stats state that the pure train step doesn't carry;
        # rgb_decoder_norm="batch" exists for the torch-oracle parity tests
        # (tests/test_full_model_parity.py), which handle the mutable
        # batch_stats collection explicitly.
        field_static=StaticSettings(cell_packed=False, parity=True),
        field_actor=ActorSettings(flip_prob=0.25, cell_packed=False, parity=True),
        proposal_static=(
            StaticSettings(
                log2_hashmap_size=20, num_levels=6, max_res=4096, base_res=128,
                hashgrid_dim=1, cell_packed=False, parity=True,
            ),
        ) * 2,
        proposal_actor=ActorSettings(
            log2_hashmap_size=15, num_levels=4, base_res=64, max_res=1024,
            hashgrid_dim=1, cell_packed=False, parity=True,
        ),
    )
    # the unpacked 8-corner gathers need rematerialization at the full batch
    cfg.pipeline.train_ray_chunk = 8192
    return cfg


def _neurad_tiny() -> MethodConfig:
    """Small config for CPU smoke runs and CI."""
    from neurad_tpu.fields.neurad_encoding import ActorSettings, StaticSettings

    return MethodConfig(
        method_name="neurad-tiny",
        description="Tiny NeuRAD for CPU smoke testing",
        trainer=TrainerConfig(max_num_iterations=200, steps_per_eval_batch=100, steps_per_save=10**9,
                              steps_per_log=20),
        pipeline=ADPipelineConfig(
            datamanager=ADDataManagerConfig(num_cam_patches=4, patch_size=6, num_lidar_rays=256),
            model_overrides=dict(
                # VGG perceptual off in the tiny preset only: its conv stack is
                # ~13x the tiny model's CPU step cost (full presets keep 0.05)
                loss=LossSettings(vgg_mult=0.0),
                sampling=SamplingSettings(num_proposal_samples=(12, 8), num_nerf_samples=6, sky_distance=1000.0),
                field_static=StaticSettings(num_levels=4, base_res=16, max_res=256, log2_hashmap_size=13, hashgrid_dim=4),
                field_actor=ActorSettings(num_levels=2, base_res=16, max_res=64, log2_hashmap_size=11, hashgrid_dim=4),
                proposal_static=(
                    StaticSettings(num_levels=2, base_res=16, max_res=128, log2_hashmap_size=11, hashgrid_dim=1),
                    StaticSettings(num_levels=2, base_res=16, max_res=128, log2_hashmap_size=11, hashgrid_dim=1),
                ),
                proposal_actor=ActorSettings(num_levels=2, base_res=16, max_res=64, log2_hashmap_size=9, hashgrid_dim=1),
                appearance_dim=4,
                max_actors_per_ray=1,
            ),
            optimizer_groups={
                "fields": OptimizerGroupConfig(lr=5e-3, warmup_steps=0),
                "hashgrids": OptimizerGroupConfig(lr=5e-3, warmup_steps=0),
                "cnn": OptimizerGroupConfig(lr=5e-3, warmup_steps=0),
                "trajectory_opt": OptimizerGroupConfig(lr=1e-4, warmup_steps=0),
                "camera_opt": OptimizerGroupConfig(lr=1e-4, warmup_steps=0),
            },
        ),
    )


def _splatad() -> MethodConfig:
    """The `splatad` preset (`method_configs.py:300-358`)."""
    from neurad_tpu.pipelines.splatad_pipeline import SplatADPipelineConfig

    return MethodConfig(
        method_name="splatad",
        description="SplatAD: rolling-shutter gaussian splatting with camera+lidar",
        pipeline_type="splatad",
        trainer=TrainerConfig(
            max_num_iterations=30001,
            steps_per_eval_batch=500,
            steps_per_save=2000,
            steps_per_log=100,
        ),
        pipeline=SplatADPipelineConfig(),
    )


def _splatad_tiny() -> MethodConfig:
    from neurad_tpu.data.full_image_datamanager import FullImageLidarDataManagerConfig
    from neurad_tpu.model_components.strategy import MCMCStrategyConfig
    from neurad_tpu.models.splatad import SplatADConfig
    from neurad_tpu.pipelines.splatad_pipeline import SplatADPipelineConfig

    return MethodConfig(
        method_name="splatad-tiny",
        description="Tiny SplatAD for CPU smoke testing",
        pipeline_type="splatad",
        trainer=TrainerConfig(max_num_iterations=100, steps_per_eval_batch=50, steps_per_save=10**9,
                              steps_per_log=10),
        pipeline=SplatADPipelineConfig(
            datamanager=FullImageLidarDataManagerConfig(max_lidar_points=512),
            model=SplatADConfig(num_downscales=0, feature_dim=8, appearance_dim=4, max_per_tile=64, lidar_max_per_tile=32),
            mcmc=MCMCStrategyConfig(cap_max=2048, refine_start_iter=10, refine_every=25),
            cap_max=2048,
        ),
    )


def _splatad_default() -> MethodConfig:
    """splatad with the reference ADDefaultStrategy (absgrad grow/split/prune,
    actor-aware culling) instead of MCMC (`strategy.py:18-126`)."""
    from neurad_tpu.pipelines.splatad_pipeline import SplatADPipelineConfig

    return MethodConfig(
        method_name="splatad-default",
        description="SplatAD with Default (absgrad) densification strategy",
        pipeline_type="splatad",
        trainer=TrainerConfig(
            max_num_iterations=30001,
            steps_per_eval_batch=500,
            steps_per_save=2000,
            steps_per_log=100,
        ),
        pipeline=SplatADPipelineConfig(strategy="default"),
    )


def _splatfacto() -> MethodConfig:
    """Upstream-style static 3DGS with Default-strategy densification
    (`nerfstudio/models/splatfacto.py:150-760`)."""
    from neurad_tpu.pipelines.splatfacto_pipeline import SplatfactoPipelineConfig

    return MethodConfig(
        method_name="splatfacto",
        description="Static 3D gaussian splatting (SH colors, camera only)",
        pipeline_type="splatfacto",
        trainer=TrainerConfig(
            max_num_iterations=30001,
            steps_per_eval_batch=500,
            steps_per_save=2000,
            steps_per_log=100,
        ),
        pipeline=SplatfactoPipelineConfig(),
    )


def _nerfacto(lidar: bool = False, name: str = "nerfacto") -> MethodConfig:
    """The nerfacto / lidar-nerfacto presets (`method_configs.py:60-200`)."""
    return MethodConfig(
        method_name=name,
        description="Nerfacto: hashgrid field + proposal density fields"
        + (" + lidar depth loss" if lidar else ""),
        trainer=TrainerConfig(max_num_iterations=30001, steps_per_eval_batch=500, steps_per_save=2000),
        pipeline=ADPipelineConfig(
            datamanager=ADDataManagerConfig(
                num_cam_patches=64, patch_size=8, num_lidar_rays=4096 if lidar else 0,
                rgb_upsample_factor=1,
            ),
            model="lidar-nerfacto" if lidar else "nerfacto",
            optimizer_groups={
                "fields": OptimizerGroupConfig(lr=1e-2, lr_final=1e-4, max_steps=30001),
                "hashgrids": OptimizerGroupConfig(lr=1e-2, lr_final=1e-4, max_steps=30001),
                "camera_opt": OptimizerGroupConfig(lr=1e-4, lr_final=1e-5, warmup_steps=2500),
                "trajectory_opt": OptimizerGroupConfig(lr=1e-3),
                "cnn": OptimizerGroupConfig(lr=1e-3),
            },
        ),
    )


def _neurad_scaleopt() -> MethodConfig:
    """neurad-scaleopt: per-axis-weighted SO3xR3 camera optimization, tuned for
    nuScenes (`method_configs.py:437-449`)."""
    cfg = _neurad()
    cfg.method_name = "neurad-scaleopt"
    cfg.description = "NeuRAD with per-axis-scaled camera pose optimization (nuScenes)"
    cfg.pipeline.model_overrides = dict(
        cfg.pipeline.model_overrides,
        camera_opt_mode="SO3xR3",
        # xtrans, ytrans, ztrans, xrot, yrot, zrot (`method_configs.py:440-448`)
        camera_opt_weights=(0.01, 0.01, 0.01, 1.0, 1.0, 1.0),
        camera_opt_trans_penalty=(1e-2, 1e-2, 1e-3),
    )
    return cfg


_REGISTRY: Dict[str, Callable[[], MethodConfig]] = {
    "neurad": _neurad,
    "nerfacto": _nerfacto,
    "nerfacto-lidar": lambda: _nerfacto(lidar=True, name="nerfacto-lidar"),
    "neurad-tiny": _neurad_tiny,
    "neurad-paper": lambda: _scaled(_neurad(), 4.0, "neurad-paper"),
    "neurad-parity": _neurad_parity,
    "neurader": lambda: _scaled(_neurad(), 2.0, "neurader"),
    "neuradest": lambda: _scaled(_neurad(), 0.25, "neuradest"),
    "splatad": _splatad,
    "splatad-default": _splatad_default,
    "splatad-tiny": _splatad_tiny,
    "splatfacto": _splatfacto,
    "neurad-scaleopt": _neurad_scaleopt,
}


def get_method_config(name: str) -> MethodConfig:
    if name not in _REGISTRY:
        # known external methods get install instructions instead of a bare
        # unknown-method error (`configs/external_methods.py`)
        from neurad_tpu.configs.external_methods import get_external_methods

        ext = get_external_methods()
        if name in ext:
            raise KeyError(f"method {name!r} is an external method.\n{ext[name].instructions}")
        raise KeyError(f"unknown method {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]()


def all_methods() -> Dict[str, str]:
    return {n: f().description for n, f in _REGISTRY.items()}


def register_method(name: str, factory: Callable[[], MethodConfig]) -> None:
    """Plugin-style method registration (`plugins/registry.py:34`)."""
    _REGISTRY[name] = factory


def get_dataparser(name: str, **kwargs):
    """Dataparser registry (extended as parsers are added)."""
    if name == "synthetic":
        from neurad_tpu.data.dataparsers.synthetic import SyntheticDataParserConfig

        return SyntheticDataParserConfig(**kwargs).setup()
    if name == "pandaset":
        from neurad_tpu.data.dataparsers.pandaset import PandaSetDataParserConfig

        return PandaSetDataParserConfig(**kwargs).setup()
    if name == "nuscenes":
        from neurad_tpu.data.dataparsers.nuscenes import NuScenesDataParserConfig

        return NuScenesDataParserConfig(**kwargs).setup()
    if name == "kitti":
        from neurad_tpu.data.dataparsers.kitti import KittiMotDataParserConfig

        return KittiMotDataParserConfig(**kwargs).setup()
    if name == "argoverse2":
        from neurad_tpu.data.dataparsers.argoverse2 import Argoverse2DataParserConfig

        return Argoverse2DataParserConfig(**kwargs).setup()
    if name == "zod":
        from neurad_tpu.data.dataparsers.zod import ZodDataParserConfig

        return ZodDataParserConfig(**kwargs).setup()
    if name == "waymo":
        from neurad_tpu.data.dataparsers.waymo import WaymoDataParserConfig

        return WaymoDataParserConfig(**kwargs).setup()
    raise KeyError(f"unknown dataparser {name!r}")
