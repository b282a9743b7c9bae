"""NeuRAD neural feature fields (flax).

TPU-native counterpart of `nerfstudio/fields/neurad_field.py` (NeuRADField 78,
NeuRADProposalField 185) and `nerfstudio/model_components/utils.py:21`
(SigmoidDensity). The MLPs are plain Dense chains in MXU-friendly widths — XLA
fuses the hashgrid-lookup → matmul chain; no Pallas needed at these widths.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neurad_tpu.core.structs import RaySamples
from neurad_tpu.fields.activations import trunc_exp
from neurad_tpu.fields.mlp import MLP
from neurad_tpu.fields.neurad_encoding import ActorSettings, NeuRADHashEncoding, StaticSettings
from neurad_tpu.model_components.dynamic_actors import DynamicActors
from neurad_tpu.ops.spherical_harmonics import components_from_spherical_harmonics


class SigmoidDensity(nn.Module):
    """SDF -> alpha via learnable-slope sigmoid (`model_components/utils.py:21-41`)."""

    init_beta: float = 20.0
    beta_min: float = 1e-4
    learnable_beta: bool = True

    @nn.compact
    def __call__(self, sdf: jnp.ndarray) -> jnp.ndarray:
        if self.learnable_beta:
            beta_param = self.param("beta", lambda _: jnp.asarray([self.init_beta]))
            beta = jnp.abs(beta_param) + self.beta_min
        else:
            beta = self.init_beta
        return jax.nn.sigmoid(-sdf * beta)


class FieldOutputs(NamedTuple):
    """Field head outputs (reference FieldHeadNames dict, `neurad_field.py:150-160`)."""

    features: jnp.ndarray  # [R, S, nff_out_dim]
    alphas: Optional[jnp.ndarray] = None  # [R, S, 1] (use_sdf path)
    sdf: Optional[jnp.ndarray] = None  # [R, S, 1]
    density: Optional[jnp.ndarray] = None  # [R, S, 1] (trunc_exp path)


def get_normalized_directions(directions: jnp.ndarray) -> jnp.ndarray:
    """SH-encoding input normalization (`fields/base_field.py`): [-1,1] -> [0,1]."""
    return (directions + 1.0) / 2.0


class NeuRADField(nn.Module):
    """The main neural feature field (`neurad_field.py:78-182`).

    hashgrid -> mlp_geo(2 layers, 32 wide) -> (sdf | density, geo embedding 32) ;
    SH(4)-encoded actor-frame directions -> mlp_feature(3x32) + residual.
    """

    actors: DynamicActors
    static_scale: float
    static: StaticSettings = StaticSettings()
    actor: ActorSettings = ActorSettings(flip_prob=0.25)
    geo_hidden_dim: int = 32
    geo_num_layers: int = 2
    nff_hidden_dim: int = 32
    nff_num_layers: int = 3
    nff_out_dim: int = 32
    num_multisamples: int = 1
    use_sdf: bool = True
    sdf_beta: float = 20.0
    learnable_beta: bool = True
    require_actor_grad: bool = True
    max_actors_per_ray: int = 4
    sh_levels: int = 4
    # batch-capacity divisor of the compacted actor lookup (0 = dense path);
    # exposed so callers needing batch-size-independent outputs can disable it
    actor_compaction: int = 8
    # MLP compute dtype; None = fp32 end-to-end (reference-exact numerics for
    # the torch-oracle parity tests / parity preset), bf16 default matches the
    # reference's fp16-autocast training (`engine/trainer.py:551`)
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    def setup(self):
        self.hashgrid = NeuRADHashEncoding(
            actors=self.actors,
            static_scale=self.static_scale,
            static=self.static,
            actor=self.actor,
            require_actor_grad=self.require_actor_grad,
            max_actors_per_ray=self.max_actors_per_ray,
            actor_compaction=self.actor_compaction,
        )
        self.mlp_geo = MLP(
            out_dim=self.nff_out_dim + 1, num_layers=self.geo_num_layers, layer_width=self.geo_hidden_dim,
            compute_dtype=self.compute_dtype,
        )
        self.mlp_feature = MLP(
            out_dim=self.nff_out_dim, num_layers=self.nff_num_layers, layer_width=self.nff_hidden_dim,
            compute_dtype=self.compute_dtype,
        )
        if self.use_sdf:
            self.sdf_to_alpha = SigmoidDensity(init_beta=self.sdf_beta, learnable_beta=self.learnable_beta)

    def __call__(
        self,
        ray_samples: RaySamples,
        train: bool = False,
        flip_rng: Optional[jax.Array] = None,
        edits=None,
    ) -> FieldOutputs:
        gaussians = ray_samples.frustums.get_fast_isotropic_gaussian(self.num_multisamples)
        features, directions = self.hashgrid(
            gaussians,
            ray_samples.times if ray_samples.times is not None else jnp.zeros_like(ray_samples.deltas[..., 0, :]),
            ray_samples.frustums.directions,
            train=train,
            flip_rng=flip_rng,
            edits=edits,
        )

        # flatten [R, S, .] -> [R*S, .] through the MLP stack: batched 3-D
        # dot_generals produce transposed ([S, R, C]) cotangents whose
        # relayout back to sample-major lowered as a 32-step while-loop of
        # dynamic-update-slices feeding the hashgrid backward (~15 ms/step at
        # the 57k-ray bench config, round-4 trace); clean 2-D matmuls keep
        # every cotangent n-major (same fix as MLPProposalField.get_density)
        batch_shape = features.shape[:-1]
        feats2 = features.reshape(-1, features.shape[-1])
        geo = self.mlp_geo(feats2)  # [N, 1 + nff_out_dim]
        geo_out, geo_embedding = geo[..., :1], geo[..., 1:]
        dir_embedding = components_from_spherical_harmonics(
            self.sh_levels, get_normalized_directions(directions)
        ).reshape(geo.shape[0], -1)
        feature = geo_embedding + self.mlp_feature(jnp.concatenate([geo_embedding, dir_embedding], axis=-1))
        feature = feature.reshape(batch_shape + (feature.shape[-1],))
        geo_out = geo_out.reshape(batch_shape + (1,))

        if self.use_sdf:
            return FieldOutputs(features=feature, sdf=geo_out, alphas=self.sdf_to_alpha(geo_out))
        return FieldOutputs(features=feature, density=trunc_exp(geo_out))


class MLPProposalField(nn.Module):
    """Matmul-native proposal density: fourier features + small MLP.

    TPU-first redesign of the proposal field (`neurad_field.py:185-216`).
    The hashgrid proposal's cost on TPU is pure gather/scatter latency
    (~11-15 ns/row; the two proposal rounds evaluate 128+64 samples/ray
    through 6-level grids = ~33M latency-bound rows per train step). A
    proposal field only needs a coarse density estimate to place samples
    (mip-NeRF 360 uses a small MLP proposal for the same job), so this
    variant trades table capacity for MXU throughput: positions are
    scene-contracted, fourier-encoded (plus low-frequency time features so
    dynamic actors register as time-varying density), and decoded by a
    2-layer MLP — everything lowers to batched bf16 matmuls.
    """

    static_scale: float
    num_freqs: int = 10
    num_time_freqs: int = 4
    time_scale: float = 0.25  # rad/s base angular rate for time features
    hidden_dim: int = 128
    num_layers: int = 2

    def setup(self):
        self.mlp = MLP(out_dim=self.hidden_dim, num_layers=self.num_layers, layer_width=self.hidden_dim)
        # Near-zero init => initial density ~= trunc_exp(0) = 1 everywhere, i.e.
        # a UNIFORM proposal at step 0. The hashgrid proposal gets this for free
        # (tables init at ~1e-4); with O(1) fourier features a default-init
        # decoder makes trunc_exp span orders of magnitude and the PDF sampler
        # collapses all samples onto random density spikes before training.
        self.density_decoder = nn.Dense(1, use_bias=False, kernel_init=nn.initializers.normal(1e-4))

    def get_density(self, ray_samples: RaySamples, edits=None) -> jnp.ndarray:
        from neurad_tpu.fields.spatial_distortions import scaled_scene_contraction_gaussian

        gaussians = ray_samples.frustums.get_fast_isotropic_gaussian(1)
        g = scaled_scene_contraction_gaussian(gaussians, self.static_scale)
        x = g.mean.squeeze(-2)  # [R, S, 3] in [0, 1]
        times = ray_samples.times if ray_samples.times is not None else jnp.zeros_like(ray_samples.deltas[..., 0, :])
        t = jnp.broadcast_to(times.reshape(times.shape[0], -1, 1)[:, :1, :], x.shape[:-1] + (1,))

        # NOTE round-4: a [R,S,3]->[R*S,3] flatten was tried here (like
        # NeuRADField) and MEASURED SLOWER (+31 ms/step): the fourier chain's
        # S-minor layouts fuse fine, and the extra reshape materializations
        # cost more than they save. Kept 3-D.
        octaves = 2.0 ** jnp.arange(self.num_freqs, dtype=x.dtype) * jnp.pi
        ang = x[..., None] * octaves  # [R, S, 3, F]
        t_oct = 2.0 ** jnp.arange(self.num_time_freqs, dtype=x.dtype) * self.time_scale
        t_ang = t[..., None] * t_oct  # [R, S, 1, Ft]
        feats = jnp.concatenate(
            [
                x,
                jnp.sin(ang).reshape(x.shape[:-1] + (-1,)),
                jnp.cos(ang).reshape(x.shape[:-1] + (-1,)),
                jnp.sin(t_ang).reshape(x.shape[:-1] + (-1,)),
                jnp.cos(t_ang).reshape(x.shape[:-1] + (-1,)),
            ],
            axis=-1,
        )
        return trunc_exp(self.density_decoder(self.mlp(feats)))

    def __call__(self, ray_samples: RaySamples, edits=None) -> jnp.ndarray:
        return self.get_density(ray_samples, edits=edits)


class NeuRADProposalField(nn.Module):
    """Density-only proposal field (`neurad_field.py:185-216`): hashgrid -> bias-free
    linear -> trunc_exp."""

    actors: DynamicActors
    static_scale: float
    static: StaticSettings = StaticSettings(
        log2_hashmap_size=20, num_levels=6, max_res=4096, base_res=128, hashgrid_dim=1
    )
    actor: ActorSettings = ActorSettings(
        log2_hashmap_size=15, num_levels=4, base_res=64, max_res=1024, hashgrid_dim=1
    )
    max_actors_per_ray: int = 4
    actor_compaction: int = 8

    def setup(self):
        self.hashgrid = NeuRADHashEncoding(
            actors=self.actors,
            static_scale=self.static_scale,
            static=self.static,
            actor=self.actor,
            require_actor_grad=False,  # no trajectory grads through proposals (`neurad_field.py:199`)
            max_actors_per_ray=self.max_actors_per_ray,
            actor_compaction=self.actor_compaction,
        )
        self.density_decoder = nn.Dense(1, use_bias=False)

    def get_density(self, ray_samples: RaySamples, edits=None) -> jnp.ndarray:
        gaussians = ray_samples.frustums.get_fast_isotropic_gaussian(1)
        feats, _ = self.hashgrid(
            gaussians,
            ray_samples.times if ray_samples.times is not None else jnp.zeros_like(ray_samples.deltas[..., 0, :]),
            None,
            edits=edits,
        )
        # 2-D through the decoder (see NeuRADField.__call__: 3-D dot_generals
        # hand the hashgrid backward a transposed cotangent)
        out = trunc_exp(self.density_decoder(feats.reshape(-1, feats.shape[-1])))
        return out.reshape(feats.shape[:-1] + (1,))

    def __call__(self, ray_samples: RaySamples, edits=None) -> jnp.ndarray:
        return self.get_density(ray_samples, edits=edits)
