"""Ray/sample pytree structures.

TPU-native equivalent of the reference's TensorDataclass + ray containers
(`nerfstudio/utils/tensor_dataclass.py:28`, `nerfstudio/cameras/rays.py:33,142,251`).
Instead of a mutable dataclass-of-tensors with bespoke broadcasting, these are
immutable `flax.struct` pytrees; generic reshaping/indexing/concatenation is done
with `jax.tree.map` helpers (`tree_getitem`, `tree_reshape`, `tree_cat`), which give
the same numpy-style semantics with zero custom machinery and full jit/pjit
compatibility (everything here is a pytree of fixed-shape arrays).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct


def tree_getitem(tree: Any, idx: Any) -> Any:
    """Index every array leaf of a pytree: `bundle[idx]` semantics of TensorDataclass."""
    return jax.tree.map(lambda x: x[idx], tree)


def tree_reshape(tree: Any, batch_shape: tuple, batch_ndim_fn: Optional[Callable] = None) -> Any:
    """Reshape the leading (batch) dims of every leaf to `batch_shape`.

    Each leaf keeps its own trailing feature dims: a leaf of shape (*old_batch, d)
    becomes (*batch_shape, d). `batch_ndim_fn(leaf)` may override how many trailing
    dims are feature dims (default 1).
    """

    def _reshape(x):
        nfeat = batch_ndim_fn(x) if batch_ndim_fn is not None else 1
        feat = x.shape[x.ndim - nfeat :] if nfeat > 0 else ()
        return x.reshape(tuple(batch_shape) + tuple(feat))

    return jax.tree.map(_reshape, tree)


def tree_flatten_batch(tree: Any) -> Any:
    """Flatten all batch dims into one (leaves keep their last dim as features)."""
    return jax.tree.map(lambda x: x.reshape(-1, x.shape[-1]) if x.ndim > 1 else x.reshape(-1), tree)


def tree_cat(trees: list, axis: int = 0) -> Any:
    """Concatenate pytrees leaf-wise (TensorDataclass.cat, tensor_dataclass.py:310)."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=axis), *trees)


def tree_size(tree: Any) -> int:
    """Number of batch elements (product of batch dims of the first leaf)."""
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return 0
    x = leaves[0]
    n = 1
    for d in x.shape[:-1] if x.ndim > 1 else x.shape:
        n *= d
    return n


@struct.dataclass
class GaussiansStd:
    """Isotropic gaussian (mean + scalar std) used for hashgrid anti-aliasing.

    Mirrors `nerfstudio/utils/math.py:115` (GaussiansStd).
    """

    mean: jnp.ndarray  # [*batch, num_multisamples, 3]
    std: jnp.ndarray  # [*batch, num_multisamples, 1]


@struct.dataclass
class Frustums:
    """Conical frustums along rays (`nerfstudio/cameras/rays.py:33`)."""

    origins: jnp.ndarray  # [*batch, 3]
    directions: jnp.ndarray  # [*batch, 3] (unit)
    starts: jnp.ndarray  # [*batch, 1]
    ends: jnp.ndarray  # [*batch, 1]
    pixel_area: jnp.ndarray  # [*batch, 1] (at distance 1 from origin)

    def get_positions(self) -> jnp.ndarray:
        """Midpoint of each frustum (`rays.py:55-62`)."""
        return self.origins + self.directions * (self.starts + self.ends) / 2.0

    def get_start_positions(self) -> jnp.ndarray:
        return self.origins + self.directions * self.starts

    def get_fast_isotropic_gaussian(self, num_multisamples: int) -> GaussiansStd:
        """Fast isotropic gaussian approximation of the frustum (`rays.py:109-124`).

        Places `num_multisamples` points evenly inside (starts, ends); std is the
        cube root of (cross-section area * multisample spacing), i.e. an isotropic
        blob of the same volume as the frustum slice.
        """
        multisample_dist = (self.ends - self.starts) / (num_multisamples + 1)  # [*b, 1]
        ts = jnp.arange(1, num_multisamples + 1, dtype=self.ends.dtype)  # [m]
        t = self.starts + ts * multisample_dist  # [*b, m]
        mean = self.origins[..., None, :] + self.directions[..., None, :] * t[..., :, None]  # [*b, m, 3]
        frust_crossection_area = self.pixel_area[..., None, :] * (t[..., :, None] ** 2)
        std = (frust_crossection_area * multisample_dist[..., None, :]) ** (1.0 / 3.0)
        return GaussiansStd(mean=mean, std=std)


@struct.dataclass
class RaySamples:
    """Samples along rays (`nerfstudio/cameras/rays.py:142`).

    The reference stores `spacing_to_euclidean_fn` as a python callable; callables
    don't belong in a jit-traced pytree, so spacing bins are stored as arrays and the
    spacing transform lives with the sampler that created the samples.
    """

    frustums: Frustums
    deltas: jnp.ndarray  # [*batch, num_samples, 1]
    spacing_starts: Optional[jnp.ndarray] = None  # [*batch, num_samples, 1] in [0,1]
    spacing_ends: Optional[jnp.ndarray] = None
    camera_indices: Optional[jnp.ndarray] = None  # [*batch, 1] int32
    times: Optional[jnp.ndarray] = None  # [*batch, 1]
    metadata: dict = struct.field(default_factory=dict)

    def get_weights(self, densities: jnp.ndarray) -> jnp.ndarray:
        """Volume-rendering weights from densities (`rays.py:188-210`).

        weights_i = (1 - exp(-delta_i * sigma_i)) * exp(-sum_{j<i} delta_j * sigma_j)
        """
        delta_density = self.deltas * densities
        alphas = 1.0 - jnp.exp(-delta_density)
        trans = jnp.cumsum(delta_density[..., :-1, :], axis=-2)
        trans = jnp.concatenate([jnp.zeros_like(trans[..., :1, :]), trans], axis=-2)
        trans = jnp.exp(-trans)
        weights = alphas * trans
        return jnp.nan_to_num(weights)

    @staticmethod
    def get_weights_and_transmittance_from_alphas(alphas: jnp.ndarray):
        """Weights from per-sample alphas (`rays.py:227-248`): exclusive cumprod of (1-alpha)."""
        trans = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(alphas[..., :1, :]), 1.0 - alphas + 1e-7], axis=-2), axis=-2
        )
        weights = alphas * trans[..., :-1, :]
        return weights, trans


@struct.dataclass
class RayBundle:
    """A bundle of rays (`nerfstudio/cameras/rays.py:251`).

    `metadata` is a plain dict pytree; AD models use keys `is_lidar` [*b,1] bool,
    `did_return` [*b,1] bool, `directions_norm` [*b,1] (lidar ranges) as in
    `cameras/lidars.py:446-447`.
    """

    origins: jnp.ndarray  # [*batch, 3]
    directions: jnp.ndarray  # [*batch, 3]
    pixel_area: jnp.ndarray  # [*batch, 1]
    camera_indices: Optional[jnp.ndarray] = None  # [*batch, 1] int32
    nears: Optional[jnp.ndarray] = None  # [*batch, 1]
    fars: Optional[jnp.ndarray] = None  # [*batch, 1]
    times: Optional[jnp.ndarray] = None  # [*batch, 1]
    metadata: dict = struct.field(default_factory=dict)

    @property
    def shape(self):
        return self.origins.shape[:-1]

    def __len__(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    def get_ray_samples(
        self,
        bin_starts: jnp.ndarray,
        bin_ends: jnp.ndarray,
        spacing_starts: Optional[jnp.ndarray] = None,
        spacing_ends: Optional[jnp.ndarray] = None,
    ) -> RaySamples:
        """Produce RaySamples between bin edges (`rays.py:321-368`)."""
        deltas = bin_ends - bin_starts
        num_samples = bin_starts.shape[-2]
        broadcast = lambda x: (
            None if x is None else jnp.broadcast_to(x[..., None, :], x.shape[:-1] + (num_samples, x.shape[-1]))
        )
        return RaySamples(
            frustums=Frustums(
                origins=broadcast(self.origins),
                directions=broadcast(self.directions),
                starts=bin_starts,
                ends=bin_ends,
                pixel_area=broadcast(self.pixel_area),
            ),
            deltas=deltas,
            spacing_starts=spacing_starts,
            spacing_ends=spacing_ends,
            camera_indices=broadcast(self.camera_indices) if self.camera_indices is not None else None,
            times=broadcast(self.times) if self.times is not None else None,
            metadata={k: v for k, v in self.metadata.items()},
        )

    def reshape(self, shape: tuple) -> "RayBundle":
        return tree_reshape(self, shape)

    def flatten(self) -> "RayBundle":
        return tree_reshape(self, (-1,))
