"""Multi-resolution hash encoding (iNGP), 3D and 4D, functional core.

TPU-native replacement for tiny-cuda-nn's HashGrid encoding
(reference call sites: `nerfstudio/field_components/encodings.py:311-470`,
4D actor grid at `field_components/neurad_encoding.py:112-131`).

Design notes (TPU-first):
- One flat table [num_levels * table_size, F]; per-level offset like the reference.
- Corner enumeration is vectorized over a static [2^D, D] binary matrix instead of
  the reference's 8 unrolled hash calls — XLA fuses hashing + weights into one
  elementwise block, and the only expensive op is the table gather (take along
  axis 0), which XLA lowers to a TPU dynamic-gather.
- Backward through gather is scatter-add into the table, which XLA also handles;
  the table is fp32 (tcnn stores fp16 — we keep fp32 master and can cast reads
  to bf16 later if HBM-bound).
- All shapes static; positions expected in [0, 1]^D (same contract as tcnn).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Same spatial-hash primes as the reference 3D fallback (`encodings.py:415-421`),
# extended with tcnn's 4th prime for 4D grids.
_PRIMES = (1, 2654435761, 805459861, 3674653429)


def level_scales(num_levels: int, min_res: int, max_res: int) -> np.ndarray:
    """Per-level grid resolutions: floor(min_res * growth^level) (`encodings.py:348-350`)."""
    if num_levels > 1:
        growth = np.exp((np.log(max_res) - np.log(min_res)) / (num_levels - 1))
    else:
        growth = 1.0
    return np.floor(min_res * growth ** np.arange(num_levels)).astype(np.float32)


def init_hash_table(
    key: jax.Array,
    num_levels: int,
    table_size: int,
    features_per_level: int,
    scale: float = 0.001,
    corners_packed: int = 1,
) -> jnp.ndarray:
    """Uniform(-1, 1) * scale init (`encodings.py:382-386`).

    corners_packed=2^D stores all corner features of a CELL in one row (row
    width 2^D * F): one gather per (sample, level) instead of 2^D — the
    TPU-native layout, since XLA's gather is row-latency-bound (~23ns/row on
    v5e regardless of row width up to ~32B).
    """
    shape = (num_levels * table_size, features_per_level * corners_packed)
    return (jax.random.uniform(key, shape, minval=-1.0, maxval=1.0) * scale).astype(jnp.float32)


# XLA's gather on v5e falls off a cliff once the operand exceeds ~400k ROWS
# (measured: 467 M rows/s at [393216, 64] = 50 MB, 88 M rows/s at [524288, 64]
# — row count, NOT bytes, is the threshold). Levels with more buckets than
# this pack `bucket_pack` buckets per physical row and select the sub-row
# after the gather; scatter-add is row-width-free so the backward is unharmed.
_FAST_GATHER_MAX_ROWS = 2**18


def level_layout(
    scales: "np.ndarray", d: int, max_rows: int, cell_packed: bool, force_hash: bool = False
) -> Tuple[Tuple[int, ...], Tuple[Optional[int], ...], Tuple[int, ...]]:
    """Per-level (buckets, dense_res, bucket_pack).

    buckets = logical table entries (tcnn sizing rule, see `level_rows`);
    bucket_pack = how many buckets share one physical row so the row count
    stays under the measured v5e fast-gather threshold.

    force_hash=True hashes EVERY level into `max_rows` entries with no bucket
    packing — the layout of the reference's torch fallback
    (`encodings.py:406-466`), used by the torch-oracle parity tests and the
    reference-faithful presets.
    """
    if force_hash:
        return (max_rows,) * len(scales), (None,) * len(scales), (1,) * len(scales)
    rows, dense = level_rows(scales, d, max_rows, cell_packed)
    packs = []
    for r in rows:
        pack = 1
        while r // pack > _FAST_GATHER_MAX_ROWS:
            pack *= 2
        packs.append(pack)
    return rows, dense, tuple(packs)


def level_rows(
    scales: "np.ndarray", d: int, max_rows: int, cell_packed: bool
) -> Tuple[Tuple[int, ...], Tuple[Optional[int], ...]]:
    """tcnn-style per-level table sizing: a level whose DENSE grid fits under
    `max_rows` gets exactly (res+pad)^d rows and collision-free linear indexing;
    only finer levels hash into `max_rows` rows (tcnn `grid.h` does the same:
    `std::min(1u << log2_hashmap_size, grid_volume)`; the reference inherits it
    through tiny-cuda-nn at `encodings.py:370-373`).

    On TPU this is also the PERFORMANCE fix for coarse levels: XLA's
    gather/scatter throughput falls off ~5x once the operand outgrows VMEM
    scale (measured: 755 M rows/s at 0.3 MB -> 95 M at 33 MB), so right-sizing
    coarse levels keeps most of the per-step table traffic in the fast domain.

    Returns (rows_per_level, dense_res_per_level); dense_res is None for
    hashed levels. `cell_packed` rows index CELLS (res+1 per dim), unpacked
    rows index grid CORNERS (res+2 per dim, the +1 corner of the last cell).
    """
    rows, dense = [], []
    for s in np.asarray(scales):
        res = int(np.floor(float(s))) + (1 if cell_packed else 2)
        if res**d <= max_rows:
            rows.append(res**d)
            dense.append(res)
        else:
            rows.append(max_rows)
            dense.append(None)
    return tuple(rows), tuple(dense)


def init_hash_tables(
    key: jax.Array,
    scales: "np.ndarray",
    d: int,
    max_rows: int,
    features_per_level: int,
    scale: float = 0.001,
    cell_packed: bool = False,
    force_hash: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Per-level tables as a TUPLE of [rows_l, F_row] arrays.

    Separate arrays (not one concatenated [L*T, F]) right-size each level's
    gather operand (dense coarse levels stay in the fast-gather domain) and
    let the gradient pytree skip the concatenate. NOTE (round-3 correction):
    the independent per-level backward scatters do NOT overlap in practice —
    an honest microbenchmark (all outputs live, `benchmarks/scatter_matmul.py`
    strategy J) measures 6 per-level scatters at the same ~68 M rows/s as one
    fused scatter; the round-2 "~480 M rows/s aggregate" figure was a
    dead-code-elimination artifact. The layout is kept for the gather-side
    wins, not the scatter side.
    """
    rows, _, packs = level_layout(scales, d, max_rows, cell_packed, force_hash)
    f_row = features_per_level * ((2**d) if cell_packed else 1)
    keys = jax.random.split(key, len(rows))
    return tuple(
        (jax.random.uniform(k, (-(-r // p), f_row * p), minval=-1.0, maxval=1.0) * scale).astype(jnp.float32)
        for k, r, p in zip(keys, rows, packs)
    )


def table_physical_shapes(
    scales: "np.ndarray",
    d: int,
    max_rows: int,
    features_per_level: int,
    cell_packed: bool = False,
    force_hash: bool = False,
) -> Tuple[Tuple[int, int], ...]:
    """Per-level physical [rows, f_row] shapes matching `init_hash_tables`."""
    rows, _, packs = level_layout(scales, d, max_rows, cell_packed, force_hash)
    f_row = features_per_level * ((2**d) if cell_packed else 1)
    return tuple((-(-r // p), f_row * p) for r, p in zip(rows, packs))


def flatten_tables(tables: Tuple[jnp.ndarray, ...]) -> Tuple[jnp.ndarray, ...]:
    """Store hash tables as 1-D PARAM leaves (reshape to 2-D at the use site).

    Load-bearing on TPU (measured, round 3): with 2-D fp32 master tables XLA's
    layout assignment gave the scatter-add gradient {1,0} (row-major) but the
    param/mu/nu Adam state {0,1} (column-major), and reconciled them EVERY STEP
    with strided 8-column async slice-copies at ~180 MB/s — 76 ms/step of pure
    relayout on the dense level alone (6x 12.7 ms `slice-start` ops in the
    trace). A 1-D leaf has exactly one possible layout, so the optimizer
    update is forced to stay elementwise; the 2-D view needed by the forward
    gather rides the existing fp32->bf16 cast copy for free."""
    return tuple(t.reshape(-1) for t in tables)


def unflatten_tables(flat: Tuple[jnp.ndarray, ...], shapes: Tuple[Tuple[int, int], ...]) -> Tuple[jnp.ndarray, ...]:
    """Views of 1-D table leaves in their physical [rows, f_row] shapes."""
    return tuple(t.reshape(s) for t, s in zip(flat, shapes))


@functools.partial(jax.jit, static_argnums=(1,))
def _hash(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Spatial hash of integer coords [..., D] -> [...] (`encodings.py:406-421`)."""
    d = coords.shape[-1]
    primes = jnp.asarray(_PRIMES[:d], dtype=jnp.uint32)
    x = (coords.astype(jnp.uint32) * primes)
    h = x[..., 0]
    for i in range(1, d):
        h = h ^ x[..., i]
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def _corner_offsets(d: int) -> np.ndarray:
    """[2^D, D] binary corner offsets."""
    corners = np.arange(2**d)
    return np.stack([(corners >> i) & 1 for i in range(d)], axis=-1).astype(np.int32)


def _dense_index(coords: jnp.ndarray, res: int) -> jnp.ndarray:
    """Collision-free linear index for a dense level: [..., D] -> [...].

    Same contract as tcnn's dense branch (`grid.h` grid_index): row-major
    strides over a res^D grid. Coords are clipped defensively (positions are
    in [0,1]^D by the scene-contraction contract, but fp rounding can land
    exactly on the upper face).
    """
    c = jnp.clip(coords, 0, res - 1)
    idx = c[..., 0]
    for i in range(1, coords.shape[-1]):
        idx = idx * res + c[..., i]
    return idx.astype(jnp.int32)


# Gradient accumulators larger than this run in bf16 (tcnn accumulates its
# hash-table grads in fp16 the same way): measured on v5e, XLA's scatter-add
# into a 67 MB fp32 buffer runs at 11 M rows/s vs 66 M rows/s into the 33 MB
# bf16 buffer — operand size, not element count, is what falls off the cliff.
_FP32_ACCUM_MAX_BYTES = 32 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_levels(table_size: int, read_bf16: bool, table: jnp.ndarray, idx: tuple) -> tuple:
    """Per-level table gather: [num_levels * table_size, F] x (L x [*b]) -> (L x [*b, F]).

    CRITICAL TPU layout decisions (v5e, measured):
    - XLA's gather throughput is a function of OPERAND SIZE — ~430 M rows/s
      against an 0.25 MB table, ~300 M at 8 MB, ~84 M at 33 MB, and ~40 M
      against the 537 MB all-levels table the naive layout produces. Gathering
      each level against its own <=33 MB slice (bf16 read, matching tcnn's
      fp16 feature storage) keeps every operand in the fast domain. Same trick
      in the backward: per-level scatter-add with a per-level accumulator,
      bf16 when the fp32 buffer would exceed 32 MB.
    - idx is a TUPLE of per-level index arrays in their natural sample-major
      shape, NOT a stacked [L, n] array: stacking requires a [n, L] -> [L, n]
      transpose whose T(1,128)-tiled row slices cost ~10 ms each at train
      shapes (~50-100 ms/step of pure relayout copies in the round-2 trace).
    """
    return _gather_levels_impl(table_size, read_bf16, table, idx)


def _gather_levels_impl(table_size, read_bf16, table, idx):
    outs = []
    for l, idx_l in enumerate(idx):
        tbl = jax.lax.slice_in_dim(table, l * table_size, (l + 1) * table_size, axis=0)
        if read_bf16:
            tbl = tbl.astype(jnp.bfloat16)
        outs.append(jnp.take(tbl, idx_l, axis=0).astype(table.dtype))
    return tuple(outs)


def _gather_levels_fwd(table_size, read_bf16, table, idx):
    out = _gather_levels_impl(table_size, read_bf16, table, idx)
    # zero-size probe carries the table's width/dtype through the residuals
    # (residual leaves must be JAX types)
    return out, (idx, jnp.zeros((0, table.shape[-1]), table.dtype))


def _gather_levels_bwd(table_size, read_bf16, res, g):
    idx, probe = res
    f, dtype = probe.shape[-1], probe.dtype
    accum_dtype = jnp.float32
    if table_size * f * 4 > _FP32_ACCUM_MAX_BYTES:
        accum_dtype = jnp.bfloat16
    parts = []
    for idx_l, g_l in zip(idx, g):
        dt = jnp.zeros((table_size, f), accum_dtype).at[idx_l].add(g_l.astype(accum_dtype))
        parts.append(dt.astype(dtype))
    return jnp.concatenate(parts, axis=0), None


_gather_levels.defvjp(_gather_levels_fwd, _gather_levels_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gather_levels_multi(
    read_bf16: bool, shapes: tuple, segsum_max_rows: int, tables: tuple, idx: tuple
) -> tuple:
    """Per-level gather against a TUPLE of per-level tables: the TPU fast path.

    vs the single-array `_gather_levels` (kept for the legacy [L*T, F] layout):
    - each level's operand is right-sized (dense coarse levels are KBs-MBs, in
      the ~750 M rows/s gather domain; only hashed fine levels pay the ~95 M
      rows/s big-operand rate);
    - the backward emits one INDEPENDENT scatter-add per level with its own
      accumulator and returns them as a tuple — XLA overlaps independent
      scatters (~480 M rows/s aggregate, measured on v5e at train shapes);
      concatenating them into one buffer serializes the same scatters to
      ~64 M rows/s (the dominant cost of the round-2 step).
    """
    return _gather_levels_multi_impl(read_bf16, tables, idx)


def _gather_levels_multi_impl(read_bf16, tables, idx):
    # bf16 reads STAY bf16: the interpolation downstream runs in bf16 (tcnn
    # computes the whole encoding in fp16), so the backward cotangent arrives
    # bf16-native — round 3 traced 18 ms/step of fp32->bf16 converts plus a
    # 10 ms fp32 outer-product mul on the [n, f_row] update tensors when the
    # gather cast back to fp32 here.
    outs = []
    for tbl, idx_l in zip(tables, idx):
        src = tbl.astype(jnp.bfloat16) if read_bf16 else tbl
        outs.append(jnp.take(src, idx_l, axis=0))
    return tuple(outs)


def _gather_levels_multi_fwd(read_bf16, shapes, segsum_max_rows, tables, idx):
    return _gather_levels_multi_impl(read_bf16, tables, idx), idx


def _segsum_rows(bucket, upd, n_rows: int, bf16_payload: bool):
    """Scatter-free per-bucket sums for ARBITRARY update rows (no rank-1
    structure): the f update columns ride the sort directly (packed pairs in
    bf16 mode). Same sort + fp32 prefix-sum + dense boundary-diff scheme as
    `_segsum_dense_grad`; used by the unpacked/parity gather path where each
    corner row is its own update."""
    n, f = upd.shape
    if bf16_payload:
        u16 = upd.astype(jnp.bfloat16)
        if f % 2:
            u16 = jnp.concatenate([u16, jnp.zeros((n, 1), jnp.bfloat16)], axis=-1)
        packed = jax.lax.bitcast_convert_type(u16.reshape(n, -1, 2), jnp.int32)
    else:
        packed = jax.lax.bitcast_convert_type(upd.astype(jnp.float32), jnp.int32)
    cols = packed.shape[-1]
    ops = jax.lax.sort(
        (bucket.astype(jnp.int32), *[packed[:, k] for k in range(cols)]),
        num_keys=1, is_stable=False,
    )
    si = ops[0]
    stacked = jnp.stack(ops[1:], axis=-1)
    if bf16_payload:
        pay = jax.lax.bitcast_convert_type(stacked, jnp.bfloat16).reshape(n, -1)[:, :f]
    else:
        pay = jax.lax.bitcast_convert_type(stacked, jnp.float32)
    csum = jnp.cumsum(pay.astype(jnp.float32), axis=0)
    csum_pad = jnp.concatenate([jnp.zeros((1, f), jnp.float32), csum], axis=0)
    starts = jnp.searchsorted(si, jnp.arange(n_rows + 1, dtype=si.dtype), method="sort")
    return csum_pad[starts[1:]] - csum_pad[starts[:-1]]  # [T, f] fp32


def _gather_levels_multi_bwd(read_bf16, shapes, segsum_max_rows, idx, g):
    parts = []
    for idx_l, g_l, shape in zip(idx, g, shapes):
        if segsum_max_rows and shape[0] <= segsum_max_rows:
            n = int(np.prod(g_l.shape[:-1]))
            dt = _segsum_rows(
                idx_l.reshape(n), g_l.reshape(n, shape[1]), shape[0], bf16_payload=read_bf16
            )
            parts.append(dt)
            continue
        # fp32 accumulation when the buffer is small enough (all dense levels),
        # bf16 beyond (tcnn accumulates its table grads in fp16 the same way)
        accum_dtype = jnp.float32 if shape[0] * shape[1] * 4 <= _FP32_ACCUM_MAX_BYTES else jnp.bfloat16
        dt = jnp.zeros(shape, accum_dtype).at[idx_l].add(g_l.astype(accum_dtype))
        parts.append(dt.astype(jnp.float32))
    return tuple(parts), None


_gather_levels_multi.defvjp(_gather_levels_multi_fwd, _gather_levels_multi_bwd)


def _run_dedup_scatter(bucket, upd, n_rows, seg: int):
    """Scatter-add with consecutive-run dedup (no sort).

    Samples along a ray visit coarse cells in order, so duplicate buckets are
    CONSECUTIVE in the flat [R*S*M] layout (runs reset at ray boundaries every
    `seg` entries, which also bounds run length so the 5-step masked scan is
    exact). Run totals are accumulated by a segmented Hillis-Steele scan, and
    only each run's LAST row is scattered — the rest point one past the end
    and are dropped by the scatter's out-of-bounds semantics. Pays off iff
    dropped rows are cheap (benchmarks/scatter_oob.py) and the level is
    coarse enough for real duplication.
    """
    n = bucket.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    same = jnp.concatenate([jnp.zeros((1,), bool), (bucket[1:] == bucket[:-1]) & (pos[1:] % seg != 0)])
    run_id = jnp.cumsum((~same).astype(jnp.int32))
    s = upd
    d = 1
    while d < seg:
        ok = jnp.concatenate([jnp.zeros((d,), bool), run_id[d:] == run_id[:-d]])
        shifted = jnp.concatenate([jnp.zeros((d,) + s.shape[1:], s.dtype), s[:-d]])
        s = s + jnp.where(ok[:, None], shifted, 0)
        d *= 2
    is_last = jnp.concatenate([~same[1:], jnp.ones((1,), bool)])
    bucket_eff = jnp.where(is_last, bucket, n_rows)  # OOB rows are dropped
    return jnp.zeros((n_rows, s.shape[-1]), s.dtype).at[bucket_eff].add(s)


def _segsum_dense_grad(bucket, w2, g2, n_rows_unpacked: int, bf16_payload: bool):
    """EXACT per-bucket table-gradient sums with NO scatter: sort + fp32
    prefix-sum + boundary differences, output DENSE over all buckets.

    The scatter-add floor is ~14.6 ns/UPDATE-ROW of serialized conflict-safe
    RMW (PERFORMANCE.md; `benchmarks/scatter_oob.py` shows dropped rows cost
    the same, which kills every capped/windowed scheme on hot buckets). For
    levels whose UNPACKED bucket count T is small (the dense coarse levels:
    36k/358k buckets vs 1.8M update rows at bench shapes) the whole reduction
    can instead be:

      sort rows by bucket (bitonic, ~3 ms at 1.8M keys; the rank-1 update
      structure w (x) g means only the C+f factor columns ride the sort as
      packed int32 pairs, not the C*f-wide update) ->
      build updates post-sort -> fp32 running prefix-sum ->
      per-bucket sum = csum[start(t+1)] - csum[start(t)], a 2T-row gather
      with starts from one `searchsorted` (method="sort": one extra merge
      sort, not 21 binary-search gather rounds).

    Gradient equality with the scatter path is exact up to fp32 summation
    order (prefix-sum vs scatter order); the boundary DIFFERENCE loses
    ~log2(prefix/|row|) mantissa bits on long streams — still far above the
    bf16 accumulators large tables use. Window/one-hot matmul alternatives
    were rejected by arithmetic: their window+compare cost scales with
    cap x T, and production fine levels have T (4.19M unpacked) >= n (1.8M),
    unlike the T=131k microbenchmark regime where 1.75x was measured
    (`benchmarks/scatter_matmul.py`).
    """
    n = bucket.shape[0]
    C, f = w2.shape[-1], g2.shape[-1]
    if bf16_payload:
        # pack bf16 pairs -> int32 sort operands ((C+f) even for d in (3,4));
        # same quantization point as the scatter path's bf16 update build
        payload = jnp.concatenate([w2.astype(jnp.bfloat16), g2.astype(jnp.bfloat16)], axis=-1)
        packed = jax.lax.bitcast_convert_type(payload.reshape(n, (C + f) // 2, 2), jnp.int32)
    else:
        payload = jnp.concatenate([w2.astype(jnp.float32), g2.astype(jnp.float32)], axis=-1)
        packed = jax.lax.bitcast_convert_type(payload, jnp.int32)
    cols = packed.shape[-1]
    ops = jax.lax.sort(
        (bucket.astype(jnp.int32), *[packed[:, k] for k in range(cols)]),
        num_keys=1, is_stable=False,
    )
    si = ops[0]
    stacked = jnp.stack(ops[1:], axis=-1)
    if bf16_payload:
        pay_s = jax.lax.bitcast_convert_type(stacked, jnp.bfloat16).reshape(n, C + f)
    else:
        pay_s = jax.lax.bitcast_convert_type(stacked, jnp.float32)
    w_s, g_s = pay_s[..., :C], pay_s[..., C:]
    # sample-major [n, C*f] rank-1 updates, built AFTER the sort (2-D slices
    # only — see _interp_gather_cp layout notes)
    upd = jnp.concatenate([w_s[:, c : c + 1] * g_s for c in range(C)], axis=-1)
    csum = jnp.cumsum(upd.astype(jnp.float32), axis=0)
    csum_pad = jnp.concatenate([jnp.zeros((1, C * f), jnp.float32), csum], axis=0)
    starts = jnp.searchsorted(
        si, jnp.arange(n_rows_unpacked + 1, dtype=si.dtype), method="sort"
    )
    return csum_pad[starts[1:]] - csum_pad[starts[:-1]]  # [T, C*f] fp32


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _interp_gather_cp(read_bf16, shapes, pks, n_corners, f, dedup, tables, idx, subs, w):
    """Fused gather + bucket-select + corner-interpolation for CELL-PACKED
    levels, with a hand-written backward (the TPU hot path).

    Autodiff through the select+interp built the [n, pk*C*f] scatter updates in
    a transposed [C*f, n] layout that XLA lowered as a 64-iteration while loop
    of dynamic-update-slices plus a relayout copy — ~200 ms/step of pure data
    movement at the 57k-ray bench config (round-4 trace). It also scattered the
    FULL packed row width even though the non-selected bucket's update is
    identically zero. This VJP instead:

    - builds updates sample-major as the outer product w[n,C] (x) g[n,f]
      (shape [n, C*f], half the packed width), and
    - scatter-adds them into the UNPACKED [rows*pk, C*f] view of the table at
      the logical bucket index (a free row-major bitcast of the [rows, pk*C*f]
      physical layout) — scatter cost grows with row width (PERFORMANCE.md
      width rules), so halving the row is ~2x on the dominant op of the step.

    Args:
        shapes: per-level PHYSICAL table shapes (rows, pk*C*f).
        pks: per-level buckets-per-physical-row.
        tables: tuple of [rows_l, width_l] tables.
        idx: tuple of [...] physical row indices.
        subs: tuple of [...] sub-bucket indices (zeros where pk == 1).
        w: tuple of [..., C] fp32 corner interpolation weights.
    Returns:
        tuple of [..., f] per-level features in the table-read dtype.
    """
    outs, _ = _interp_gather_cp_impl(read_bf16, shapes, pks, n_corners, f, tables, idx, subs, w)
    return outs


def _interp_gather_cp_impl(read_bf16, shapes, pks, n_corners, f, tables, idx, subs, w):
    # Everything stays 2-D [n, k]: any [n, C, f] intermediate gets an n-MINOR
    # layout from XLA ({1,0,2} tiling), and the reshape back to the scatter's
    # n-major [n, C*f] then lowers as a C*f-iteration while loop of
    # dynamic-update-slices (~19 ms/level at bench shapes, round-4 trace).
    # Unrolled slice-wise ops over C (8/16) and pk (<=2) keep n major.
    f_row = n_corners * f
    outs, feats_sel = [], []
    for l, (tbl, idx_l, sub_l, w_l) in enumerate(zip(tables, idx, subs, w)):
        src = tbl.astype(jnp.bfloat16) if read_bf16 else tbl
        rows = jnp.take(src, idx_l, axis=0)  # [..., pk*f_row]
        pk = pks[l]
        if pk > 1:
            # bucket select without a [.., pk, f_row] reshape: mask-and-add
            # the pk column slices (pk is 2 in practice)
            acc = None
            for p in range(pk):
                m = (sub_l == p).astype(rows.dtype)[..., None]
                part = rows[..., p * f_row : (p + 1) * f_row] * m
                acc = part if acc is None else acc + part
            rows = acc  # [..., f_row]
        wl = w_l.astype(rows.dtype)
        # out[.., j] = sum_c rows[.., c*f+j] * w[.., c]  (2-D slice contraction)
        o = None
        for c in range(n_corners):
            term = rows[..., c * f : (c + 1) * f] * wl[..., c : c + 1]
            o = term if o is None else o + term
        outs.append(o)
        feats_sel.append(rows)
    return tuple(outs), tuple(feats_sel)


def _interp_gather_cp_fwd(read_bf16, shapes, pks, n_corners, f, dedup, tables, idx, subs, w):
    outs, feats_sel = _interp_gather_cp_impl(read_bf16, shapes, pks, n_corners, f, tables, idx, subs, w)
    # feats_sel is the fwd's own intermediate — saving it costs no extra
    # compute and spares the backward a second row-latency-bound gather
    return outs, (idx, subs, w, feats_sel)


def _interp_gather_cp_bwd(read_bf16, shapes, pks, n_corners, f, dedup, res, g):
    idx, subs, w, feats_sel = res
    f_row = n_corners * f
    dtables, dws = [], []
    for l, g_l in enumerate(g):
        rows_phys, width = shapes[l]
        pk = pks[l]
        feats = feats_sel[l]  # [..., C*f], sample-major
        gl = g_l.astype(feats.dtype)
        gf = g_l.astype(jnp.float32)
        # d/dw[.., c] = sum_j feats[.., c*f+j] * g[.., j] — fp32 accumulation
        # (feeds position/trajectory gradients); 2-D slices only (see impl).
        dw_cols = [
            jnp.sum(feats[..., c * f : (c + 1) * f].astype(jnp.float32) * gf, axis=-1, keepdims=True)
            for c in range(n_corners)
        ]
        dws.append(jnp.concatenate(dw_cols, axis=-1).astype(w[l].dtype))
        bucket = idx[l] * pk + subs[l] if pk > 1 else idx[l]
        n = int(np.prod(g_l.shape[:-1]))
        accum_dtype = (
            jnp.float32 if rows_phys * width * 4 <= _FP32_ACCUM_MAX_BYTES else jnp.bfloat16
        )
        if dedup[l] == "segsum":
            # scatter-free exact segmented sum (coarse levels; see
            # _segsum_dense_grad). The rank-1 factors ride the sort; the wide
            # update is built post-sort.
            acc = _segsum_dense_grad(
                bucket.reshape(n), w[l].reshape(n, n_corners), g_l.reshape(n, f),
                rows_phys * pk, bf16_payload=read_bf16,
            )
            dtables.append(acc.reshape(rows_phys, width))
            continue
        # d/dtable rows: upd[.., c*f+j] = w[.., c] * g[.., j], built from 2-D
        # column slices so the result is n-major for the scatter directly
        wl = w[l].astype(feats.dtype)
        upd = jnp.concatenate(
            [wl[..., c : c + 1] * gl for c in range(n_corners)], axis=-1
        )  # [..., C*f]
        upd2 = upd.reshape(n, f_row)
        if dedup[l]:
            acc = _run_dedup_scatter(
                bucket.reshape(n), upd2.astype(accum_dtype), rows_phys * pk, dedup[l]
            )
        else:
            acc = jnp.zeros((rows_phys * pk, f_row), accum_dtype)
            acc = acc.at[bucket.reshape(n)].add(upd2.astype(accum_dtype))
        dtables.append(acc.reshape(rows_phys, width).astype(jnp.float32))
    return tuple(dtables), None, None, tuple(dws)


_interp_gather_cp.defvjp(_interp_gather_cp_fwd, _interp_gather_cp_bwd)


def hash_encode(
    positions: jnp.ndarray,
    table,
    scales: jnp.ndarray,
    table_size: int = 0,
    level_weights: Optional[jnp.ndarray] = None,
    gather_dtype: Optional[jnp.dtype] = jnp.bfloat16,
    cell_packed: bool = False,
    dense_res: Optional[Tuple[Optional[int], ...]] = None,
    bucket_pack: Optional[Tuple[int, ...]] = None,
    run_dedup_seg: int = 0,
    segsum_max_rows: int = 0,
) -> jnp.ndarray:
    """Multi-level hash lookup with D-linear interpolation.

    Args:
        positions: [..., D] in [0,1]^D (D = 3 or 4).
        table: TUPLE of per-level [rows_l, F] tables (the TPU fast path — see
            `init_hash_tables`), or a legacy [num_levels * table_size, F] array.
        scales: [num_levels] per-level grid resolution.
        table_size: entries per level (required for the legacy array layout).
        level_weights: optional [..., num_levels] per-level feature downweighting
            (NeuRAD's anti-aliasing, `neurad_encoding.py:297-304`).
        gather_dtype: dtype for the table READ. bf16 halves HBM traffic on the
            gather — the op's bottleneck — matching tcnn's fp16 feature storage
            while the master table (and its gradients) stay fp32. None = fp32.
        cell_packed: table rows hold all 2^D corner features of a cell
            (one gather per sample-level, the TPU-native fast path; corner
            features are per-cell, i.e. not shared across cell faces — the MLP
            absorbs the resulting discontinuity like it absorbs hash collisions).
        dense_res: per-level dense resolution (from `level_rows`); levels with a
            resolution use collision-free linear indexing like tcnn's dense
            branch. Only valid with tuple tables.
        bucket_pack: per-level buckets-per-physical-row (from `level_layout`);
            the tables must have been built with the same packing
            (`init_hash_tables`). Only valid with tuple tables.

    Returns:
        [..., num_levels * F] encoded features (fp32).
    """
    num_levels = scales.shape[0]
    d = positions.shape[-1]
    n_corners = 2**d
    multi = isinstance(table, (tuple, list))
    if bucket_pack is None:
        bucket_pack = (1,) * num_levels
    f_row = (table[0].shape[-1] // bucket_pack[0]) if multi else table.shape[-1]
    f = f_row // (n_corners if cell_packed else 1)
    corners = jnp.asarray(_corner_offsets(d))  # [C, D], C = 2^D
    read_bf16 = gather_dtype is not None
    if dense_res is None:
        dense_res = (None,) * num_levels

    # Everything is computed PER LEVEL in the samples' natural layout: stacking
    # a [..., L] level axis and transposing to [L, n] index rows costs ~10 ms
    # per level of T(1,128) relayout copies at train shapes (round-2 trace);
    # recomputing the per-level scale/floor/offset is a handful of fused
    # elementwise ops and keeps every index/weight array sample-major.
    idx_list, offsets, subs = [], [], []
    for l in range(num_levels):
        pk = bucket_pack[l]
        buckets_l = (table[l].shape[0] * pk) if multi else table_size
        scaled = positions * scales[l]
        floor = jnp.floor(scaled)
        offsets.append(scaled - floor)  # [..., D] in [0,1)
        floor_i = floor.astype(jnp.int32)
        coords = floor_i if cell_packed else floor_i[..., None, :] + corners
        if dense_res[l] is not None:
            bucket = _dense_index(coords, dense_res[l])
        else:
            bucket = _hash(coords, buckets_l)
        if pk > 1:
            # bucket packing: `pk` logical buckets per physical row keeps the
            # row count under the v5e fast-gather threshold (see level_layout);
            # the sub-row is selected after the gather.
            row = bucket // pk
            subs.append(bucket - row * pk)
            idx_list.append(jnp.clip(row, 0, table[l].shape[0] - 1) if multi else row)
        else:
            subs.append(None)
            idx_list.append(bucket)

    if multi and cell_packed:
        # TPU fast path: fused gather+select+interp with a hand-written
        # backward (sample-major updates, unpacked-width scatter) — see
        # `_interp_gather_cp`.
        ws = []
        for l in range(num_levels):
            offset = offsets[l]
            ws.append(
                jnp.prod(
                    jnp.where(corners.astype(bool), offset[..., None, :], 1.0 - offset[..., None, :]),
                    axis=-1,
                )
            )
        subs_t = tuple(s if s is not None else jnp.zeros((), jnp.int32) for s in subs)
        shapes = tuple(t.shape for t in table)
        # backward table-grad mode per level: "segsum" = scatter-free sorted
        # segmented sum for levels whose UNPACKED bucket count is small (the
        # dense coarse levels — see _segsum_dense_grad); else optional
        # consecutive-run dedup on dense levels (_run_dedup_scatter); else
        # plain scatter-add.
        dedup = tuple(
            (
                "segsum"
                if (segsum_max_rows and shapes[l][0] * bucket_pack[l] <= segsum_max_rows)
                else (run_dedup_seg if (run_dedup_seg and dense_res[l] is not None) else 0)
            )
            for l in range(num_levels)
        )
        outs_cp = _interp_gather_cp(
            read_bf16, shapes, tuple(bucket_pack), n_corners, f, dedup,
            tuple(table), tuple(idx_list), subs_t, tuple(ws),
        )
        outs = []
        for l in range(num_levels):
            o = outs_cp[l].astype(jnp.float32)
            if level_weights is not None:
                o = o * level_weights[..., l][..., None]
            outs.append(o)
        return jnp.concatenate(outs, axis=-1)

    if multi:
        shapes = tuple(t.shape for t in table)
        feats_per_level = _gather_levels_multi(
            read_bf16, shapes, segsum_max_rows, tuple(table), tuple(idx_list)
        )
    else:
        feats_per_level = _gather_levels(table_size, read_bf16, table, tuple(idx_list))

    outs = []
    for l in range(num_levels):
        offset = offsets[l]
        # D-linear interpolation: prod over dims of (offset if corner bit else 1-offset)
        w = jnp.prod(
            jnp.where(corners.astype(bool), offset[..., None, :], 1.0 - offset[..., None, :]),
            axis=-1,
        )  # [..., C]
        feats = feats_per_level[l]
        pk = bucket_pack[l]
        # interpolate in the TABLE-READ dtype (bf16 on the fast path, like
        # tcnn's fp16 encoding math): the [.., f_row]-wide select/mul tensors
        # and their backward cotangents then never materialize in fp32 — the
        # fp32 upcast happens on the narrow [.., F] interpolated result.
        w = w.astype(feats.dtype)
        if pk > 1:
            # select the logical bucket's slice from the packed row
            feats = feats.reshape(feats.shape[:-1] + (pk, f_row))
            sel = jax.nn.one_hot(subs[l], pk, dtype=feats.dtype)
            feats = jnp.sum(feats * sel[..., None], axis=-2)  # [..., F_row]
        if cell_packed:
            feats = feats.reshape(feats.shape[:-1] + (n_corners, f))  # [..., C, F]
        o = jnp.sum(feats * w[..., None], axis=-2).astype(jnp.float32)  # [..., F]
        if level_weights is not None:
            o = o * level_weights[..., l][..., None]
        outs.append(o)
    return jnp.concatenate(outs, axis=-1)  # [..., L*F]


def gaussian_level_weights(std: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """NeuRAD EMA-style per-level downweighting by gaussian std
    (`neurad_encoding.py:297-304`): weight = 1 / clamp(res * 2 * std, 1, inf).

    Args:
        std: [..., 1] isotropic std in grid-normalized units.
        scales: [L].
    Returns: [..., L]
    """
    return 1.0 / jnp.clip(std * (2.0 * scales), 1.0, None)


def hash_encode_gaussians(
    gauss_mean: jnp.ndarray,
    gauss_std: jnp.ndarray,
    table,
    scales: jnp.ndarray,
    table_size: int = 0,
    cell_packed: bool = False,
    dense_res: Optional[Tuple[Optional[int], ...]] = None,
    bucket_pack: Optional[Tuple[int, ...]] = None,
    gather_dtype: Optional[jnp.dtype] = jnp.bfloat16,
    run_dedup_seg: int = 0,
    segsum_max_rows: int = 0,
) -> jnp.ndarray:
    """Encode multisampled gaussians and average over multisamples
    (`neurad_encoding.py:265-268,297-304`).

    Args:
        gauss_mean: [..., M, D] multisample means in [0,1]^D.
        gauss_std: [..., M, 1] stds (grid units).
        gather_dtype: table-read dtype (see `hash_encode`); None = fp32 reads
            for reference-exact numerics.
    Returns:
        [..., num_levels * F] features averaged over the M multisamples.
    """
    w = gaussian_level_weights(gauss_std, scales)  # [..., M, L]
    feats = hash_encode(
        gauss_mean, table, scales, table_size, level_weights=w, cell_packed=cell_packed,
        dense_res=dense_res, bucket_pack=bucket_pack, gather_dtype=gather_dtype,
        run_dedup_seg=run_dedup_seg, segsum_max_rows=segsum_max_rows,
    )  # [..., M, L*F]
    return feats.mean(axis=-2)


class HashEncodingSpec:
    """Static configuration bundle for a hash encoding (shapes/scales are static)."""

    def __init__(
        self,
        num_levels: int = 16,
        min_res: int = 16,
        max_res: int = 1024,
        log2_hashmap_size: int = 19,
        features_per_level: int = 2,
        n_input_dims: int = 3,
        hash_init_scale: float = 0.001,
    ):
        self.num_levels = num_levels
        self.min_res = min_res
        self.max_res = max_res
        self.table_size = 2**log2_hashmap_size
        self.features_per_level = features_per_level
        self.n_input_dims = n_input_dims
        self.hash_init_scale = hash_init_scale
        self.scales = jnp.asarray(level_scales(num_levels, min_res, max_res))

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    def init(self, key: jax.Array) -> jnp.ndarray:
        return init_hash_table(key, self.num_levels, self.table_size, self.features_per_level, self.hash_init_scale)

    def __call__(self, positions: jnp.ndarray, table: jnp.ndarray, level_weights=None) -> jnp.ndarray:
        return hash_encode(positions, table, self.scales, self.table_size, level_weights)
