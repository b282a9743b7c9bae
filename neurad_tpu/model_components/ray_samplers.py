"""Ray samplers: spaced, PDF (inverse-CDF), and proposal-network hierarchical sampling.

Counterpart of `nerfstudio/model_components/ray_samplers.py` (SpacedSampler family
55-252, PDFSampler 255-376, ProposalNetworkSampler 569-666, PowerSampler 838-852).
Functional, jit-friendly design: samplers are pure functions of (bundle, rng key);
the spacing transform is an explicit `Spacing` object of static callables instead of
a closure stored inside RaySamples.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from neurad_tpu.core.math_utils import inv_power_fn, power_fn
from neurad_tpu.core.structs import RayBundle, RaySamples


@dataclasses.dataclass(frozen=True)
class Spacing:
    """A monotone spacing transform s(t) and its inverse (static, not traced)."""

    fn: Callable[[jnp.ndarray], jnp.ndarray]
    fn_inv: Callable[[jnp.ndarray], jnp.ndarray]

    def to_euclidean(self, x: jnp.ndarray, nears: jnp.ndarray, fars: jnp.ndarray) -> jnp.ndarray:
        """spacing_to_euclidean_fn (`ray_samplers.py:119-121`): inv(x·s_far + (1-x)·s_near)."""
        s_near, s_far = self.fn(nears), self.fn(fars)
        return self.fn_inv(x * s_far + (1.0 - x) * s_near)


UNIFORM = Spacing(lambda x: x, lambda x: x)
LIN_DISP = Spacing(lambda x: 1.0 / jnp.clip(x, 1e-10, None), lambda x: 1.0 / jnp.clip(x, 1e-10, None))
SQRT = Spacing(jnp.sqrt, lambda x: x**2)
LOG = Spacing(jnp.log, jnp.exp)
# UniformLinDispPiecewise (`ray_samplers.py:231-252`): uniform in [0,1], lin-disp beyond.
UNIFORM_LIN_DISP_PIECEWISE = Spacing(
    lambda x: jnp.where(x < 1, x / 2.0, 1.0 - 1.0 / (2.0 * jnp.clip(x, 1e-10, None))),
    lambda x: jnp.where(x < 0.5, 2.0 * x, 1.0 / jnp.clip(2.0 - 2.0 * x, 1e-10, None)),
)


def power_spacing(lambda_: float = -1.5, scaling: float = 2.0) -> Spacing:
    """ZipNeRF PowerSampler spacing (`ray_samplers.py:838-852`). NeuRAD uses
    lambda=-1, scaling=0.1 (`models/neurad.py:98-117`)."""
    return Spacing(
        fn=lambda x: power_fn(x * scaling, lambda_),
        fn_inv=lambda x: inv_power_fn(x, lambda_) / scaling,
    )


def spaced_sampler(
    bundle: RayBundle,
    num_samples: int,
    spacing: Spacing = UNIFORM,
    key: Optional[jax.Array] = None,
    single_jitter: bool = False,
) -> RaySamples:
    """Sample bins according to a spacing function (`ray_samplers.py:80-130`).

    Stratified jitter is applied iff `key` is not None (training).
    """
    num_rays = bundle.origins.shape[0]
    bins = jnp.linspace(0.0, 1.0, num_samples + 1)[None, :]  # [1, S+1]

    if key is not None:
        shape = (num_rays, 1) if single_jitter else (num_rays, num_samples + 1)
        t_rand = jax.random.uniform(key, shape)
        bin_centers = (bins[..., 1:] + bins[..., :-1]) / 2.0
        bin_upper = jnp.concatenate([bin_centers, bins[..., -1:]], -1)
        bin_lower = jnp.concatenate([bins[..., :1], bin_centers], -1)
        bins = bin_lower + (bin_upper - bin_lower) * t_rand
    else:
        bins = jnp.broadcast_to(bins, (num_rays, num_samples + 1))

    euclidean_bins = spacing.to_euclidean(bins, bundle.nears, bundle.fars)  # [R, S+1]
    return bundle.get_ray_samples(
        bin_starts=euclidean_bins[..., :-1, None],
        bin_ends=euclidean_bins[..., 1:, None],
        spacing_starts=bins[..., :-1, None],
        spacing_ends=bins[..., 1:, None],
    )


def pdf_sampler(
    bundle: RayBundle,
    ray_samples: RaySamples,
    weights: jnp.ndarray,
    num_samples: int,
    spacing: Spacing,
    key: Optional[jax.Array] = None,
    single_jitter: bool = False,
    include_original: bool = False,
    histogram_padding: float = 0.01,
    eps: float = 1e-5,
) -> RaySamples:
    """Inverse-CDF resampling (`ray_samplers.py:255-376`), static shapes throughout."""
    num_bins = num_samples + 1
    w = weights[..., 0] + histogram_padding  # [R, S]

    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    padding = jax.nn.relu(eps - w_sum)
    w = w + padding / w.shape[-1]
    w_sum = w_sum + padding

    pdf = w / w_sum
    cdf = jnp.minimum(jnp.ones_like(pdf), jnp.cumsum(pdf, axis=-1))
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, S+1]

    u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins)
    u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_bins,))
    if key is not None:
        shape = cdf.shape[:-1] + ((1,) if single_jitter else (num_bins,))
        u = u + jax.random.uniform(key, shape) / num_bins
    else:
        u = u + 1.0 / (2 * num_bins)

    existing_bins = jnp.concatenate(
        [ray_samples.spacing_starts[..., 0], ray_samples.spacing_ends[..., -1:, 0]], axis=-1
    )  # [R, S+1]

    # torch.searchsorted(..., side="right") = #elements cdf[i] <= u, computed as
    # one dense comparison reduction; the 4 neighbor lookups use the gather-free
    # one-hot reduction (core/math_utils.take_along_small — TPU fast path)
    from neurad_tpu.core.math_utils import searchsorted_dense, take_along_small

    inds = searchsorted_dense(cdf, u, side="right")
    below = jnp.clip(inds - 1, 0, existing_bins.shape[-1] - 1)
    above = jnp.clip(inds, 0, existing_bins.shape[-1] - 1)
    cdf_g0 = take_along_small(cdf, below)
    bins_g0 = take_along_small(existing_bins, below)
    cdf_g1 = take_along_small(cdf, above)
    bins_g1 = take_along_small(existing_bins, above)

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0)), 0.0, 1.0)
    bins = bins_g0 + t * (bins_g1 - bins_g0)

    if include_original:
        bins = jnp.sort(jnp.concatenate([existing_bins, bins], axis=-1), axis=-1)

    bins = jax.lax.stop_gradient(bins)
    euclidean_bins = spacing.to_euclidean(bins, bundle.nears, bundle.fars)

    return bundle.get_ray_samples(
        bin_starts=euclidean_bins[..., :-1, None],
        bin_ends=euclidean_bins[..., 1:, None],
        spacing_starts=bins[..., :-1, None],
        spacing_ends=bins[..., 1:, None],
    )


def merge_ray_samples_sorted(a: RaySamples, b: RaySamples) -> RaySamples:
    """Merge two sample sets per ray, sorted by depth (static-shape counterpart of
    `cameras/rays.py:370-393` merge_raysamples: same rays, concatenated sample
    axes, re-sorted by frustum start)."""
    import jax

    starts = jnp.concatenate([a.frustums.starts, b.frustums.starts], axis=-2)
    order = jnp.argsort(starts[..., 0], axis=-1)

    def sort_leaf(xa, xb):
        x = jnp.concatenate([xa, xb], axis=-2)
        return jnp.take_along_axis(x, order[..., None], axis=-2)

    merged = jax.tree.map(sort_leaf, a, b)
    # recompute deltas from the sorted bin edges
    new_starts = merged.frustums.starts
    new_ends = merged.frustums.ends
    return merged.replace(deltas=new_ends - new_starts)


def neus_sampler(
    bundle: RayBundle,
    sdf_fn,
    num_samples: int = 64,
    num_samples_importance: int = 64,
    num_upsample_steps: int = 4,
    base_variance: float = 64.0,
    key: Optional[jax.Array] = None,
    single_jitter: bool = True,
) -> RaySamples:
    """NeuS SDF-guided hierarchical sampling (`ray_samplers.py:669-836`),
    static-shape: fixed upsample rounds, alphas from the s-density of the SDF,
    PDF resampling merged+sorted per round."""
    samples = spaced_sampler(bundle, num_samples, UNIFORM, key=key, single_jitter=single_jitter)
    n_extra = num_samples_importance // num_upsample_steps
    keys = jax.random.split(key, num_upsample_steps) if key is not None else [None] * num_upsample_steps
    for step in range(num_upsample_steps):
        sdf = jax.lax.stop_gradient(sdf_fn(samples))  # [R, S, 1]
        inv_s = base_variance * 2**step
        # NeuS section 3.2 alpha from adjacent SDF estimates
        prev_sdf, next_sdf = sdf[..., :-1, :], sdf[..., 1:, :]
        deltas = samples.deltas[..., :-1, :]
        mid_sdf = (prev_sdf + next_sdf) * 0.5
        cos_val = jnp.clip((next_sdf - prev_sdf) / jnp.clip(deltas, 1e-6, None), -1e3, 0.0)
        prev_esti = mid_sdf - cos_val * deltas * 0.5
        next_esti = mid_sdf + cos_val * deltas * 0.5
        prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
        next_cdf = jax.nn.sigmoid(next_esti * inv_s)
        alphas = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
        weights, _ = RaySamples.get_weights_and_transmittance_from_alphas(alphas)
        new = pdf_sampler(
            bundle, samples, weights, n_extra, UNIFORM, key=keys[step], single_jitter=single_jitter,
            histogram_padding=1e-5,
        )
        samples = merge_ray_samples_sorted(samples, new)
    return samples


def proposal_sampler(
    bundle: RayBundle,
    density_fns: Sequence[Callable[[RaySamples], jnp.ndarray]],
    num_proposal_samples_per_ray: Tuple[int, ...],
    num_nerf_samples_per_ray: int,
    spacing: Spacing = UNIFORM_LIN_DISP_PIECEWISE,
    key: Optional[jax.Array] = None,
    single_jitter: bool = True,
    anneal: float = 1.0,
    stop_proposal_grad: bool = False,
) -> Tuple[RaySamples, List[jnp.ndarray], List[RaySamples]]:
    """Hierarchical proposal sampling (`ray_samplers.py:569-666`).

    density_fns[i] takes full RaySamples (the reference's `pass_ray_samples=True`
    path used by NeuRAD, `models/neurad.py:443-455`) and returns [R, S, 1] density.
    `stop_proposal_grad` replaces the reference's update_sched no-grad scheme: pass
    True on steps where proposal nets should not receive gradients. The PDF rounds
    reuse the initial sampler's spacing, exactly like the reference (PDFSampler
    resamples via the propagated `spacing_to_euclidean_fn`).
    """
    n = len(density_fns)
    weights_list: List[jnp.ndarray] = []
    samples_list: List[RaySamples] = []
    weights = None
    ray_samples = None

    keys = jax.random.split(key, n + 1) if key is not None else [None] * (n + 1)
    for i_level in range(n + 1):
        is_prop = i_level < n
        num_samples = num_proposal_samples_per_ray[i_level] if is_prop else num_nerf_samples_per_ray
        if i_level == 0:
            ray_samples = spaced_sampler(
                bundle, num_samples, spacing, key=keys[0], single_jitter=single_jitter
            )
        else:
            annealed = weights**anneal
            ray_samples = pdf_sampler(
                bundle,
                ray_samples,
                annealed,
                num_samples,
                spacing,
                key=keys[i_level],
                single_jitter=single_jitter,
            )
        if is_prop:
            density = density_fns[i_level](ray_samples)
            if stop_proposal_grad:
                density = jax.lax.stop_gradient(density)
            weights = ray_samples.get_weights(density)
            weights_list.append(weights)
            samples_list.append(ray_samples)

    return ray_samples, weights_list, samples_list
