"""NeuRAD hash encoding: static world grid + 4D dynamic-actor grid, merged per sample.

TPU-native counterpart of `nerfstudio/field_components/neurad_encoding.py`
(NeuRADHashEncoding 85, actor association 226-263, feature merge 184-185,
std-rescaling 297-304). The reference's association uses `torch.nonzero` twice
(dynamic shapes); here it is redesigned as a fixed-capacity, fully dense pipeline:

1. Per ray, line-to-actor-center distance over ALL actors [R, A], eligibility =
   (distance < actor radius) & present-at-time (`neurad_encoding.py:233-241`).
2. `top_k` selects K=max_actors_per_ray nearest eligible actors per ray — static
   shape [R, K] instead of a jagged nonzero list.
3. Every sample is tested against its ray's K candidate boxes ([R, S, K] in-box
   mask, `neurad_encoding.py:250-259`); the first hit wins (the reference keeps an
   arbitrary duplicate too, see its NOTE at 260-262).
4. Actor features are computed densely for ALL samples in the chosen actor's frame
   (4D grid: actor_id/n_actors as 4th coord, `neurad_encoding.py:270-281`) and
   merged with a `where` on the hit mask — no scatter, no dynamic shapes. The
   wasted lookups on static samples are the price of static shapes; the actor grid
   is ~2x smaller than the static grid so this costs <35% extra gather traffic.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neurad_tpu.core.structs import GaussiansStd
from neurad_tpu.fields.spatial_distortions import scaled_scene_contraction_gaussian
from neurad_tpu.model_components.dynamic_actors import ActorEdits, DynamicActors
from neurad_tpu.ops import hash_encoding as he

EPS = 1.0e-7


@jax.custom_vjp
def _compact_merge(features_flat, sel_feats, top_idx, flat_hit):
    """Merge compacted actor features back into the dense feature array.

    out[i] = sel_feats[j] (zero-padded to F) where top_idx[j] == i and
    flat_hit[i], else features_flat[i].

    `top_idx` comes from top_k, so it is INJECTIVE — the merge is expressible
    as one narrow width-1 scatter (the inverse index map) plus a gather from
    the small [cap, Fa] table, and its exact backward is a gather too:
    d_sel[j] = g[top_idx[j]] * hit. The previous `.at[top_idx].set(feats)`
    form cost 29.6 ms/step of wide scatter-set (XLA adds a u32 companion
    scatter for last-writer-wins semantics) + 9.2 ms of backward scatter at
    the 57k-ray bench config; this form measures ~8 ms total (round 4).
    """
    out, _ = _compact_merge_fwd(features_flat, sel_feats, top_idx, flat_hit)
    return out


def _compact_merge_inv(top_idx, flat_hit, n, cap):
    # inverse map: dense position -> compacted slot, `cap` (sentinel) elsewhere
    slot = jnp.where(flat_hit[top_idx], jnp.arange(cap, dtype=jnp.int32), cap)
    return jnp.full((n,), cap, jnp.int32).at[top_idx].set(slot)


def _compact_merge_fwd(features_flat, sel_feats, top_idx, flat_hit):
    n, f_out = features_flat.shape
    cap, f_a = sel_feats.shape
    # same invariant as the reference's F.pad + index-write merge
    # (`neurad_encoding.py:184-185`): actor features are zero-padded UP to the
    # static width, never truncated
    assert f_a <= f_out, (
        f"actor feature width {f_a} exceeds static width {f_out}: "
        "configure the actor grid with num_levels*hashgrid_dim <= the static grid's"
    )
    inv = _compact_merge_inv(top_idx, flat_hit, n, cap)
    table = jnp.concatenate([sel_feats, jnp.zeros((1, f_a), sel_feats.dtype)], axis=0)
    actor_rows = jnp.take(table, inv, axis=0)  # [n, f_a]
    if f_out > f_a:
        actor_rows = jnp.pad(actor_rows, ((0, 0), (0, f_out - f_a)))
    hit_eff = (inv < cap)[:, None]
    out = jnp.where(hit_eff, actor_rows.astype(features_flat.dtype), features_flat)
    return out, (top_idx, flat_hit, hit_eff, cap, f_a)


def _compact_merge_bwd(res, g):
    top_idx, flat_hit, hit_eff, cap, f_a = res
    d_static = jnp.where(hit_eff, 0.0, g)
    # injective merge: each compacted slot j landed at exactly top_idx[j]
    d_sel = jnp.take(g[:, :f_a], top_idx, axis=0) * flat_hit[top_idx][:, None]
    return d_static, d_sel, None, None


_compact_merge.defvjp(_compact_merge_fwd, _compact_merge_bwd)


class StaticSettings(NamedTuple):
    """Static-world grid settings (`neurad_encoding.py:35-47`).

    cell_packed stores a cell's 8 corner features in one table row: one gather
    per sample-level instead of 8. XLA's TPU gather is row-latency-bound, so
    this is ~8x faster; corner features become per-cell (the MLP absorbs the
    face discontinuity like it absorbs hash collisions). Default ON — the
    TPU-native layout.
    """

    hashgrid_dim: int = 4
    num_levels: int = 8
    base_res: int = 32
    max_res: int = 8192
    log2_hashmap_size: int = 22
    cell_packed: bool = True
    # parity=True reproduces the reference torch fallback EXACTLY: every level
    # hashed into 2^log2_hashmap_size entries (no dense sizing, no bucket
    # packing) and fp32 table reads. Set cell_packed=False alongside. Used by
    # the torch-oracle parity tests and the reference-faithful preset.
    parity: bool = False
    # fp32 table reads WITHOUT the parity layout change (quality-A/B knob:
    # isolates the bf16-read numerics from the dense-sizing/packing layout)
    gather_f32: bool = False
    # EXACT consecutive-run dedup of the backward table-gradient scatters on
    # dense coarse levels (ops/hash_encoding._run_dedup_scatter) — pure perf
    # knob, measured on TPU before enabling by default
    run_dedup: bool = False
    # scatter-free sorted segmented-sum table gradients for levels with at
    # most this many UNPACKED bucket rows (0 = off); exact — see
    # ops/hash_encoding._segsum_dense_grad. At bench shapes this covers the
    # two coarse dense levels (36k/358k rows), whose scatter-adds otherwise
    # cost the full 14.6 ns/row serial floor (~26 ms each at 1.8M rows).
    segsum_grad_rows: int = 0


class ActorSettings(NamedTuple):
    """Actor grid settings (`neurad_encoding.py:50-68`)."""

    flip_prob: float = 0.5
    actor_scale: float = 10.0
    hashgrid_dim: int = 4
    num_levels: int = 4
    base_res: int = 64
    max_res: int = 1024
    log2_hashmap_size: int = 17
    cell_packed: bool = True
    parity: bool = False
    gather_f32: bool = False


class NeuRADHashEncoding(nn.Module):
    """Merged static+actor hash encoding (`neurad_encoding.py:85-304`).

    Call with gaussians [R, S, M(multisample), 3]-mean / [R, S, M, 1]-std,
    times [R, 1], optional directions [R, S, 3]. Returns (features [R, S, F],
    directions-possibly-in-actor-frame).
    """

    actors: DynamicActors
    static_scale: float
    static: StaticSettings = StaticSettings()
    actor: ActorSettings = ActorSettings()
    disable_actors: bool = False
    require_actor_grad: bool = True
    max_actors_per_ray: int = 4
    # actor-grid lookups only run for a fixed-capacity top-K subset of samples
    # (capacity = num_samples // actor_compaction): actor boxes cover a few % of
    # samples in AD scenes, and the reference gathers them sparsely too
    # (`neurad_encoding.py:226-263`). 0 disables compaction (dense lookups).
    actor_compaction: int = 8

    @property
    def out_dim(self) -> int:
        return self.static.num_levels * self.static.hashgrid_dim

    def setup(self):
        s, a = self.static, self.actor
        # log2_hashmap_size counts FEATURE-SLOT capacity; cell packing widens rows
        # by 2^D, so the entry count divides by 2^D to keep table bytes constant.
        self.static_table_size = max(2**s.log2_hashmap_size // (8 if s.cell_packed else 1), 1)
        static_scales_np = he.level_scales(s.num_levels, s.base_res, s.max_res)
        self.static_scales = jnp.asarray(static_scales_np)
        # per-level tables: dense-sized coarse levels + independent per-level
        # gradient scatters (see ops/hash_encoding.init_hash_tables)
        _, self.static_dense_res, self.static_pack = he.level_layout(
            static_scales_np, 3, self.static_table_size, s.cell_packed, force_hash=s.parity
        )
        # tables are stored as 1-D param leaves and viewed 2-D at the use site
        # (see ops/hash_encoding.flatten_tables: kills a 76 ms/step optimizer
        # relayout pathology XLA produces for 2-D fp32 masters)
        static_shapes = he.table_physical_shapes(
            static_scales_np, 3, self.static_table_size, s.hashgrid_dim,
            cell_packed=s.cell_packed, force_hash=s.parity,
        )
        static_flat = self.param(
            "static_hash_table",
            lambda key: he.flatten_tables(he.init_hash_tables(
                key, static_scales_np, 3, self.static_table_size, s.hashgrid_dim,
                cell_packed=s.cell_packed, force_hash=s.parity,
            )),
        )
        self.static_table = he.unflatten_tables(static_flat, static_shapes)
        self.actor_table_size = max(2**a.log2_hashmap_size // (16 if a.cell_packed else 1), 1)
        actor_scales_np = he.level_scales(a.num_levels, a.base_res, a.max_res)
        self.actor_scales = jnp.asarray(actor_scales_np)
        _, self.actor_dense_res, self.actor_pack = he.level_layout(
            actor_scales_np, 4, self.actor_table_size, a.cell_packed, force_hash=a.parity
        )
        actor_shapes = he.table_physical_shapes(
            actor_scales_np, 4, self.actor_table_size, a.hashgrid_dim,
            cell_packed=a.cell_packed, force_hash=a.parity,
        )
        actor_flat = self.param(
            "actor_hash_table",
            lambda key: he.flatten_tables(he.init_hash_tables(
                key, actor_scales_np, 4, self.actor_table_size, a.hashgrid_dim,
                cell_packed=a.cell_packed, force_hash=a.parity,  # 4D grid
            )),
        )
        self.actor_table = he.unflatten_tables(actor_flat, actor_shapes)

    def __call__(
        self,
        positions: GaussiansStd,
        times: jnp.ndarray,
        directions: Optional[jnp.ndarray] = None,
        train: bool = False,
        flip_rng: Optional[jax.Array] = None,
        edits: Optional[ActorEdits] = None,
        actor_to_id: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        # ---- static world features (`neurad_encoding.py:167-171,265-268`) ----
        static_g = scaled_scene_contraction_gaussian(positions, self.static_scale)
        static_gather_dtype = None if (self.static.parity or self.static.gather_f32) else jnp.bfloat16
        # run-dedup of the backward scatters along the sample axis (dense
        # coarse levels only; exact — see ops/hash_encoding._run_dedup_scatter).
        # positions are [R, S, M, D]: runs reset every S*M flat entries.
        seg = int(np.prod(static_g.mean.shape[1:-1])) if self.static.run_dedup else 0
        features = he.hash_encode_gaussians(
            static_g.mean, static_g.std, self.static_table, self.static_scales,
            cell_packed=self.static.cell_packed, dense_res=self.static_dense_res, bucket_pack=self.static_pack,
            gather_dtype=static_gather_dtype, run_dedup_seg=seg,
            segsum_max_rows=self.static.segsum_grad_rows,
        )  # [R, S, L*F]

        if self.disable_actors or self.actors.n_actors == 0:
            return features, directions

        # ---- actor association (fixed-capacity redesign of 226-263) ----
        # per-ray time = first sample's time (reference `times[:, 0]`, line 189)
        ray_times = times.reshape(times.shape[0], -1)[:, 0]
        boxes2world, valid = self.actors.get_boxes2world(ray_times, edits=edits)  # [R,A,4,4],[R,A]
        if not self.require_actor_grad:
            boxes2world = jax.lax.stop_gradient(boxes2world)

        bounds = self.actors.actor_bounds()  # [A, 3]
        radii = jnp.linalg.norm(bounds, axis=-1)  # [A]
        sample_pos = positions.mean.mean(-2)  # [R, S, 3] multisample-average

        p0 = sample_pos[:, 0, :]  # [R, 3]
        line_dir = sample_pos[:, -1, :] - p0
        line_dir = line_dir / (jnp.linalg.norm(line_dir, axis=-1, keepdims=True) + EPS)
        vec = boxes2world[..., :3, 3] - p0[:, None, :]  # [R, A, 3]
        dist_to_line = jnp.linalg.norm(jnp.cross(vec, line_dir[:, None, :]), axis=-1)  # [R, A]
        eligible = (dist_to_line < radii[None, :]) & valid

        k = min(self.max_actors_per_ray, self.actors.n_actors)
        score = jnp.where(eligible, -dist_to_line, -jnp.inf)
        top_score, cand_idx = jax.lax.top_k(score, k)  # [R, K]
        cand_ok = jnp.isfinite(top_score)

        take = lambda arr: jnp.take_along_axis(arr, cand_idx.reshape(cand_idx.shape + (1,) * (arr.ndim - 2)), axis=1)
        cand_b2w = take(boxes2world)  # [R, K, 4, 4]
        # rigid inverse: R^T, -R^T t
        rot_t = jnp.swapaxes(cand_b2w[..., :3, :3], -1, -2)  # [R, K, 3, 3]
        inv_t = -jnp.einsum("rkij,rkj->rki", rot_t, cand_b2w[..., :3, 3])

        # in-box test for all samples vs all candidates (`neurad_encoding.py:250-259`).
        # Positions are computed in EVERY candidate frame ([R,S,K,M,3]) and the
        # winning candidate selected by a one-hot contraction over K: gathering
        # per-sample 3x3 matrices instead materializes a [R*S,3,3] tensor whose
        # (3,3) trailing dims tile catastrophically on TPU (measured ~180 ms/step
        # in the round-2 xplane trace).
        pos_km = (
            jnp.einsum("rkij,rsmj->rskmi", rot_t, positions.mean) + inv_t[:, None, :, None, :]
        )  # [R, S, K, M, 3]
        pos_in_box = pos_km.mean(-2)  # [R, S, K, 3] multisample-average
        cand_bounds = bounds[cand_idx]  # [R, K, 3]
        inside = jnp.all(jnp.abs(pos_in_box) < cand_bounds[:, None], axis=-1)  # [R, S, K]
        inside = inside & cand_ok[:, None, :]

        hit = jnp.any(inside, axis=-1)  # [R, S]
        first = jnp.argmax(inside, axis=-1)  # [R, S] first candidate hit
        from neurad_tpu.core.math_utils import take_along_small

        sample_actor = take_along_small(cand_idx, first)  # [R, S] (gather-free, K small)
        onehot = jax.nn.one_hot(first, k, dtype=pos_km.dtype)  # [R, S, K]

        # ---- transform to actor frame (+ random flip, `neurad_encoding.py:203-219`) ----
        pos_actor = jnp.einsum("rsk,rskmi->rsmi", onehot, pos_km)  # [R, S, M, 3]
        if directions is not None:
            dirs_k = jnp.einsum("rkij,rsj->rski", rot_t, directions)  # [R, S, K, 3]
            dirs_actor = jnp.einsum("rsk,rski->rsi", onehot, dirs_k)
            dirs_actor = dirs_actor / (jnp.linalg.norm(dirs_actor, axis=-1, keepdims=True) + EPS)
        else:
            dirs_actor = None

        if train and self.actor.flip_prob > EPS and flip_rng is not None:
            ray_flip = jnp.where(
                jax.random.uniform(flip_rng, (hit.shape[0],)) < self.actor.flip_prob, -1.0, 1.0
            )
            pos_actor = pos_actor.at[..., 0].multiply(ray_flip[:, None, None])
            if dirs_actor is not None:
                dirs_actor = dirs_actor.at[..., 0].multiply(ray_flip[:, None])

        if dirs_actor is not None and directions is not None:
            directions = jnp.where(hit[..., None], dirs_actor, directions)

        # ---- 4D actor grid lookup (`neurad_encoding.py:270-281`) ----
        actor_g = scaled_scene_contraction_gaussian(
            GaussiansStd(mean=pos_actor, std=positions.std), self.actor.actor_scale
        )
        if actor_to_id is None:
            actor_ids = sample_actor
        else:
            actor_ids = actor_to_id[sample_actor]
        id_coord = actor_ids.astype(features.dtype) / self.actors.n_actors  # [R, S]
        mean4 = jnp.concatenate(
            [actor_g.mean, jnp.broadcast_to(id_coord[..., None, None], actor_g.mean.shape[:-1] + (1,))],
            axis=-1,
        )
        r, s = hit.shape
        if self.actor_compaction > 0 and r * s > 256:
            # compacted lookup: gather the (at most) capacity samples that hit an
            # actor box, encode only those, scatter features back densely.
            # NOTE round-2 A/B (benchmarks, fwd+bwd at train shapes): this
            # narrow-zeros-set + covered + where pattern runs 7.1 ms vs 49.7 ms
            # for the "obvious" gather-merge-scatter-set alternative — XLA
            # gives the [R*S, F] scatter-set a pathological transposed tiling
            # when its input is the live feature buffer.
            cap = max(128, (r * s) // self.actor_compaction)
            flat_hit = hit.reshape(-1)
            flat_mean4 = mean4.reshape(r * s, *mean4.shape[2:])
            flat_std = actor_g.std.reshape(r * s, *actor_g.std.shape[2:])
            _, top_idx = jax.lax.top_k(flat_hit.astype(jnp.float32), cap)
            sel_feats = he.hash_encode_gaussians(
                flat_mean4[top_idx], flat_std[top_idx], self.actor_table, self.actor_scales,
                cell_packed=self.actor.cell_packed, dense_res=self.actor_dense_res, bucket_pack=self.actor_pack,
                gather_dtype=None if (self.actor.parity or self.actor.gather_f32) else jnp.bfloat16,
            )  # [cap, La*Fa]
            # inverse-gather merge with an exact gather-based backward (the
            # previous wide scatter-set + covered-mask form cost ~39 ms/step
            # at bench shapes); overflow (> cap box hits) keeps STATIC
            # features for the dropped samples, exactly as before.
            merged = _compact_merge(
                features.reshape(r * s, features.shape[-1]), sel_feats, top_idx, flat_hit
            )
            return merged.reshape(r, s, -1), directions

        actor_feats = he.hash_encode_gaussians(
            mean4, actor_g.std, self.actor_table, self.actor_scales,
            cell_packed=self.actor.cell_packed, dense_res=self.actor_dense_res, bucket_pack=self.actor_pack,
            gather_dtype=None if (self.actor.parity or self.actor.gather_f32) else jnp.bfloat16,
        )  # [R, S, La*Fa]
        pad = self.out_dim - actor_feats.shape[-1]
        if pad > 0:
            actor_feats = jnp.pad(actor_feats, [(0, 0)] * (actor_feats.ndim - 1) + [(0, pad)])
        features = jnp.where(hit[..., None], actor_feats, features)
        return features, directions
