"""Block-sparse voxel map: a TPU-native re-design of the voxel block hash.

The reference uses an open-addressing hash with bucket+excess-list pointer
chasing, atomic free-list pops and last-writer-wins allocation races
(reference: tfusion/include/tfusion/cuda/VoxelBlockHash.hpp:10-122,
tfusion/src/cuda/SceneReconstructionEngine_host.cu:350-415,
tfusion/include/tfusion/cuda/RepresentationAccess.hpp:19-119).  None of that
maps to XLA dataflow.  This design keeps the same capability surface with
three dense arrays and only sort/scan/gather/scatter primitives:

  * ``bucket_keys / bucket_slots [NUM_BUCKETS, WAYS]`` — a W-way bucketed
    hash table.  A lookup is ONE vectorized gather of W keys + compare —
    no chains, no per-thread cache, fully batched over every query in a
    frame.  The spatial hash is the same Teschner-style 3-prime XOR the
    reference uses (reference: RepresentationAccess.hpp:5-7).
  * ``tsdf / weight [CAPACITY, B, B, B]`` — slot-indexed voxel pool.
    Slots are assigned monotonically; data never moves on insert.
  * Allocation is deterministic: candidate keys -> sort -> unique mask ->
    membership probe -> rank by prefix-sum -> scatter into buckets.  Two
    candidates hashing to a full bucket DROP deterministically and get
    allocated on a later frame — the same graceful degradation as the
    reference's silent allocation race (SURVEY.md section 3.4), but
    reproducible bit-for-bit.

Shapes are static everywhere; occupancy lives in ``num_blocks``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from topfusion_tpu.config import BlockMapConfig

EMPTY_KEY = jnp.iinfo(jnp.int32).max  # sentinel: unoccupied / invalid

# --------------------------------------------------------------- pool codec
# The pool stores TSDF/weight/color in one of three dtypes:
#   float32   — plain storage (default);
#   bfloat16  — half-width storage, ~2 significant digits;
#   int16     — FIXED-POINT storage, the reference's actual Voxel_s
#               encoding: sdf scaled by 32767 (valueToFloat/floatToValue,
#               reference: tfusion/include/tfusion/cuda/VoxelTypes.hpp:69-92)
#               — bfloat16's bandwidth at ~4.5 significant digits.
# TSDF and color live in [-1, 1] / [0, 1] and use the scale; weights are
# small exact integers (max_weight <= 32767) and store unscaled.
# All semantic compute is float32; these helpers are the ONLY place the
# storage encoding is interpreted.
POOL_I16_SCALE = 32767.0


def decode_tsdf(a: jnp.ndarray) -> jnp.ndarray:
    """Storage -> semantic float32 TSDF in [-1, 1] (also used for color)."""
    if a.dtype == jnp.int16:
        return a.astype(jnp.float32) * (1.0 / POOL_I16_SCALE)
    return a.astype(jnp.float32)


def encode_tsdf(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Semantic float32 TSDF/color -> storage."""
    if jnp.dtype(dtype) == jnp.int16:
        return jnp.round(
            jnp.clip(x, -1.0, 1.0) * POOL_I16_SCALE
        ).astype(jnp.int16)
    return x.astype(dtype)


def decode_weight(a: jnp.ndarray) -> jnp.ndarray:
    """Storage -> semantic float32 fusion weight (unscaled, all dtypes)."""
    return a.astype(jnp.float32)


def encode_weight(x: jnp.ndarray, dtype) -> jnp.ndarray:
    if jnp.dtype(dtype) == jnp.int16:
        return jnp.round(x).astype(jnp.int16)
    return x.astype(dtype)


def tsdf_init(shape, dtype) -> jnp.ndarray:
    """Encoded SDF_initialValue = 1.0 (free space) pool fill."""
    if jnp.dtype(dtype) == jnp.int16:
        return jnp.full(shape, int(POOL_I16_SCALE), jnp.int16)
    return jnp.ones(shape, dtype)


class BlockMap(NamedTuple):
    bucket_keys: jnp.ndarray    # [NB, W] int32 packed keys, EMPTY_KEY = free
    bucket_slots: jnp.ndarray   # [NB, W] int32 pool slot per key
    block_coords: jnp.ndarray   # [C, 3] int32 unpacked coords per slot
    tsdf: jnp.ndarray           # [C, B, B, B] float32
    weight: jnp.ndarray         # [C, B, B, B] float32
    num_blocks: jnp.ndarray     # () int32
    # RGB in [0, 1], [C, B, B, B, 3] when color fusion is on (the hashed-map
    # analogue of the reference's Voxel_s_rgb trait variant,
    # VoxelTypes.hpp:8-67), else a [1, 1, 1, 1, 3] dummy so the pytree
    # structure is config-independent (mirrors ops/tsdf_dense.make_color_volume).
    color: jnp.ndarray

    @property
    def capacity(self) -> int:
        # The pool carries one extra sacrificial row (see make_block_map).
        return self.tsdf.shape[0] - 1

    @property
    def block_size(self) -> int:
        return self.tsdf.shape[1]


# ----------------------------------------------------------------- keys
def pack_key(coords: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Signed block coords (..., 3) -> packed non-negative int32 key."""
    off = 1 << (bits - 1)
    c = coords + off
    return (c[..., 0] << (2 * bits)) | (c[..., 1] << bits) | c[..., 2]


def unpack_key(key: jnp.ndarray, bits: int) -> jnp.ndarray:
    off = 1 << (bits - 1)
    mask = (1 << bits) - 1
    x = (key >> (2 * bits)) & mask
    y = (key >> bits) & mask
    z = key & mask
    return jnp.stack([x - off, y - off, z - off], axis=-1)


def in_coord_range(coords: jnp.ndarray, bits: int) -> jnp.ndarray:
    lim = 1 << (bits - 1)
    return jnp.all((coords >= -lim) & (coords < lim), axis=-1)


def spatial_hash(coords: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    """Teschner 3-prime XOR hash (reference: RepresentationAccess.hpp:5-7);
    num_buckets must be a power of two."""
    h = (
        (coords[..., 0] * 73856093)
        ^ (coords[..., 1] * 19349669)
        ^ (coords[..., 2] * 83492791)
    )
    return (h & (num_buckets - 1)).astype(jnp.int32)


def _bucket_owner(
    coords: jnp.ndarray, nb_local: int, shard
) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    """(local bucket, ownership mask) for optionally sharded maps.

    Sharded maps (parallel/block_sharded.py) hash into a GLOBAL bucket
    space of ``nb_local * num_shards`` buckets; the low hash bits pick the
    owning device, the high bits the bucket within that device's local
    table.  ``shard = (shard_id, num_shards)`` where shard_id may be a
    traced ``lax.axis_index``.  Unsharded maps (shard=None) use the local
    table directly.
    """
    if shard is None:
        return spatial_hash(coords, nb_local), None
    shard_id, num_shards = shard
    gb = spatial_hash(coords, nb_local * num_shards)
    mine = (gb % num_shards) == shard_id
    return gb // num_shards, mine


# ----------------------------------------------------------------- ctor
def make_block_map(
    cfg: BlockMapConfig, ways: int = 4, dtype=None, use_color: bool = False
) -> BlockMap:
    nb = cfg.capacity  # buckets == capacity with W ways -> load factor <= 1/W
    b = cfg.block_size
    if dtype is None:
        dtype = jnp.dtype(cfg.pool_dtype)
    # Pool rows: capacity live slots + ONE permanent sacrificial row at
    # index `capacity`.  Padded/invalid scatter and Pallas grid entries
    # route there instead of forcing a full-pool copy to append it per
    # call; it never reads back (live masks are `slot < num_blocks`).
    color_shape = (
        (cfg.capacity + 1, b, b, b, 3) if use_color else (1, 1, 1, 1, 3)
    )
    return BlockMap(
        bucket_keys=jnp.full((nb, ways), EMPTY_KEY, jnp.int32),
        bucket_slots=jnp.zeros((nb, ways), jnp.int32),
        block_coords=jnp.zeros((cfg.capacity, 3), jnp.int32),
        tsdf=tsdf_init((cfg.capacity + 1, b, b, b), dtype),
        weight=jnp.zeros((cfg.capacity + 1, b, b, b), dtype),
        num_blocks=jnp.asarray(0, jnp.int32),
        color=jnp.zeros(color_shape, dtype),
    )


def reset_block_map(m: BlockMap) -> BlockMap:
    """ResetScene equivalent (reference: SceneReconstructionEngine_host.cu:51-73)."""
    return BlockMap(
        bucket_keys=jnp.full_like(m.bucket_keys, EMPTY_KEY),
        bucket_slots=jnp.zeros_like(m.bucket_slots),
        block_coords=jnp.zeros_like(m.block_coords),
        tsdf=tsdf_init(m.tsdf.shape, m.tsdf.dtype),
        weight=jnp.zeros_like(m.weight),
        num_blocks=jnp.zeros_like(m.num_blocks),
        color=jnp.zeros_like(m.color),
    )


# ----------------------------------------------------------------- lookup
def lookup(
    m: BlockMap, coords: jnp.ndarray, bits: int, shard=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched block lookup: coords (..., 3) -> (slot (...,), found (...,)).

    One gather of the W-way bucket + a vector compare; replaces the
    reference's bucket probe + excess-chain walk
    (reference: RepresentationAccess.hpp:67-100).  With ``shard`` set,
    coords owned by other devices report not-found (their data lives in
    another shard's table; see parallel/block_sharded.py compositing).
    """
    key = pack_key(coords, bits)
    b, mine = _bucket_owner(coords, m.bucket_keys.shape[0], shard)
    ways_keys = m.bucket_keys[b]            # (..., W)
    ways_slots = m.bucket_slots[b]          # (..., W)
    match = ways_keys == key[..., None]
    found = jnp.any(match, axis=-1) & in_coord_range(coords, bits)
    if mine is not None:
        found = found & mine
    slot = jnp.sum(jnp.where(match, ways_slots, 0), axis=-1)
    return jnp.where(found, slot, -1), found


# ----------------------------------------------------------------- alloc
class AllocInfo(NamedTuple):
    """Extended allocation result (``allocate(..., return_touched=True)``).

    ``touched_*`` lists every unique candidate block PRESENT in the map
    after the call (pre-existing + newly inserted) — the reference's
    per-frame visibility marks from the allocation DDA
    (buildHashAllocAndVisibleTypePP sets entriesVisibleType for found AND
    created entries, reference: SceneReconstructionEngine.hpp:254-293),
    which visible-set aging unions with last frame's visible list.
    ``n_dropped_capacity`` counts new unique candidates rejected by POOL
    EXHAUSTION — candidates that would have been inserted with more free
    slots.  This is the capacity-pressure signal surfaced per frame
    (round-2 VERDICT missing #4; the out-of-core swap layer keeps it 0).
    ``n_dropped_deferred`` counts candidates deferred by the per-frame
    bound or by W-way bucket overflow — both self-healing (the depth
    band re-marks them next frame; the reference's allocation race
    degrades identically, SURVEY.md 3.4).
    """

    n_inserted: jnp.ndarray          # () int32
    n_dropped_capacity: jnp.ndarray  # () int32
    n_dropped_deferred: jnp.ndarray  # () int32
    touched_slots: jnp.ndarray       # [t_max] int32 pool slots (pad = -1)
    touched_mask: jnp.ndarray        # [t_max] bool


def allocate(
    m: BlockMap,
    cand_coords: jnp.ndarray,
    cand_valid: jnp.ndarray,
    cfg: BlockMapConfig,
    shard=None,
    return_touched: bool = False,
) -> Tuple[BlockMap, jnp.ndarray] | Tuple[BlockMap, "AllocInfo"]:
    """Deterministically insert new blocks for candidate coords [N, 3].

    Replaces atomic free-list allocation
    (reference: SceneReconstructionEngine_host.cu:350-415) with
    sort -> unique -> probe -> prefix-sum rank -> scatter.  Bounded by
    ``cfg.max_new_blocks_per_frame`` and pool capacity.  Returns the new
    map and the number of blocks actually inserted — or ``(map,
    AllocInfo)`` with ``return_touched=True``.

    With ``shard = (shard_id, num_shards)`` only candidates this shard
    owns are inserted — every device runs the same allocate over the same
    candidates and the ownership filter routes each block to exactly one
    shard, with no communication.
    """
    bits = cfg.coord_bits
    n_max = cfg.max_new_blocks_per_frame
    ways = m.bucket_keys.shape[1]
    nb = m.bucket_keys.shape[0]

    cand_valid = cand_valid & in_coord_range(cand_coords, bits)
    if shard is not None:
        _, mine = _bucket_owner(cand_coords, nb, shard)
        cand_valid = cand_valid & mine
    keys = jnp.where(cand_valid, pack_key(cand_coords, bits), EMPTY_KEY)

    # Sort: duplicates adjacent, invalids at the end.
    keys_sorted = jnp.sort(keys)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), keys_sorted[1:] != keys_sorted[:-1]]
    )
    uniq = first & (keys_sorted != EMPTY_KEY)

    # Membership probe against the existing table.
    coords_sorted = unpack_key(keys_sorted, bits)
    slot_sorted, exists = lookup(m, coords_sorted, bits, shard=shard)
    is_new = uniq & ~exists

    # Rank new keys; cap by per-frame bound and remaining capacity.
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    room = jnp.minimum(n_max, m.capacity - m.num_blocks)
    keep = is_new & (rank < room)
    n_inserted_want = jnp.sum(keep.astype(jnp.int32))

    # Compact kept keys into [n_max] via scatter-by-rank.
    new_keys = jnp.full((n_max,), EMPTY_KEY, jnp.int32)
    scatter_idx = jnp.where(keep, rank, n_max)  # dropped -> OOB (ignored)
    new_keys = new_keys.at[scatter_idx].set(
        jnp.where(keep, keys_sorted, EMPTY_KEY), mode="drop"
    )
    new_valid = new_keys != EMPTY_KEY
    new_coords = unpack_key(new_keys, bits)

    # Way assignment: occupancy count of each bucket + rank of this key
    # among batch keys sharing the bucket.  new_keys are sorted and unique;
    # same-bucket keys are adjacent only by coincidence, so compute the
    # within-batch bucket rank by comparing against all previous keys'
    # buckets (n_max is small: O(n_max^2) compare is a [4096, 4096] bool
    # matmul-shaped op, cheap on TPU).
    local_b, _ = _bucket_owner(new_coords, nb, shard)
    bucket = jnp.where(new_valid, local_b, nb)  # OOB for pad
    prev_same = (bucket[None, :] == bucket[:, None]) & (
        jnp.arange(n_max)[None, :] < jnp.arange(n_max)[:, None]
    )
    batch_rank = jnp.sum(prev_same, axis=1).astype(jnp.int32)
    occ = jnp.sum(m.bucket_keys != EMPTY_KEY, axis=1).astype(jnp.int32)
    way = jnp.where(new_valid, occ[jnp.clip(bucket, 0, nb - 1)] + batch_rank, ways)
    fits = new_valid & (way < ways)

    # Re-rank after dropping bucket-overflow keys so slots stay contiguous.
    slot_rank = jnp.cumsum(fits.astype(jnp.int32)) - 1
    slot = m.num_blocks + slot_rank
    n_inserted = jnp.sum(fits.astype(jnp.int32))

    flat_idx = jnp.where(fits, bucket * ways + way, nb * ways)  # OOB drop
    bucket_keys = m.bucket_keys.reshape(-1).at[flat_idx].set(
        jnp.where(fits, new_keys, EMPTY_KEY), mode="drop"
    ).reshape(nb, ways)
    bucket_slots = m.bucket_slots.reshape(-1).at[flat_idx].set(
        jnp.where(fits, slot, 0), mode="drop"
    ).reshape(nb, ways)
    block_coords = m.block_coords.at[jnp.where(fits, slot, m.capacity)].set(
        new_coords, mode="drop"
    )

    new_map = BlockMap(
        bucket_keys=bucket_keys,
        bucket_slots=bucket_slots,
        block_coords=block_coords,
        tsdf=m.tsdf,
        weight=m.weight,
        num_blocks=m.num_blocks + n_inserted,
        color=m.color,
    )
    if not return_touched:
        return new_map, n_inserted

    # Touched set: unique candidates present after the call (existing +
    # inserted), compacted into [t_max] slots.  One extra cumsum + two
    # scatters over arrays already in registers.
    t_max = cfg.max_visible_blocks
    exist_t = uniq & exists
    rank_e = jnp.cumsum(exist_t.astype(jnp.int32)) - 1
    n_e = jnp.sum(exist_t.astype(jnp.int32))
    touched = jnp.full((t_max,), -1, jnp.int32)
    idx_e = jnp.where(exist_t & (rank_e < t_max), rank_e, t_max)
    touched = touched.at[idx_e].set(
        jnp.where(exist_t, slot_sorted, -1), mode="drop"
    )
    rank_i = slot_rank + n_e
    idx_i = jnp.where(fits & (rank_i < t_max), rank_i, t_max)
    touched = touched.at[idx_i].set(jnp.where(fits, slot, -1), mode="drop")
    n_want = jnp.sum(is_new.astype(jnp.int32))
    # Capacity attribution: drops that would NOT have happened with more
    # free slots (room = min(per-frame bound, free); see AllocInfo doc).
    n_cap = jnp.maximum(jnp.minimum(n_want, n_max) - room, 0)
    return new_map, AllocInfo(
        n_inserted=n_inserted,
        n_dropped_capacity=n_cap,
        n_dropped_deferred=(n_want - n_inserted) - n_cap,
        touched_slots=touched,
        touched_mask=touched >= 0,
    )


# ----------------------------------------------------------------- voxel reads
def read_voxels_nearest(
    m: BlockMap, voxel_coords: jnp.ndarray, bits: int, shard=None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Global integer voxel coords (..., 3) -> (tsdf, weight, block_found).

    Unallocated space reads as free (tsdf=1, w=0) — matching
    readFromSDF_float_uninterpolated's miss semantics
    (reference: RepresentationAccess.hpp:122-135).  On a sharded map,
    remote blocks also read as free — callers composite across shards
    (parallel/block_sharded.py).
    """
    bsz = m.block_size
    block = jnp.floor_divide(voxel_coords, bsz)
    local = voxel_coords - block * bsz
    slot, found = lookup(m, block, bits, shard=shard)
    sl = jnp.where(found, slot, 0)
    # Reads are always semantic float32 regardless of pool storage dtype.
    t = decode_tsdf(m.tsdf[sl, local[..., 0], local[..., 1], local[..., 2]])
    w = decode_weight(m.weight[sl, local[..., 0], local[..., 1], local[..., 2]])
    return (
        jnp.where(found, t, 1.0),
        jnp.where(found, w, 0.0),
        found,
    )


def read_color_nearest(
    m: BlockMap, voxel_coords: jnp.ndarray, bits: int, shard=None
) -> jnp.ndarray:
    """Global integer voxel coords (..., 3) -> RGB in [0, 1].

    Nearest-voxel color read on the hashed map (the block-path analogue
    of VoxelColorReader, reference: RepresentationAccess.hpp:455-474);
    unallocated space reads black.  Requires a map built with
    ``use_color=True`` (otherwise the dummy pool reads all-zero).
    """
    bsz = m.block_size
    block = jnp.floor_divide(voxel_coords, bsz)
    local = voxel_coords - block * bsz
    slot, found = lookup(m, block, bits, shard=shard)
    has_color = m.color.shape[0] > 1
    if not has_color:
        return jnp.zeros(voxel_coords.shape[:-1] + (3,), jnp.float32)
    sl = jnp.where(found, slot, 0)
    c = decode_tsdf(m.color[sl, local[..., 0], local[..., 1], local[..., 2]])
    return jnp.where(found[..., None], c, 0.0)


def sample_trilinear(
    m: BlockMap, pv: jnp.ndarray, bits: int, shard=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinear (tsdf, min-weight) at fractional global voxel coords
    (reference: RepresentationAccess.hpp:137-162, crossing block borders
    transparently via per-corner lookup)."""
    p = pv - 0.5
    base = jnp.floor(p).astype(jnp.int32)
    frac = p - base
    tsdf = jnp.zeros(pv.shape[:-1], jnp.float32)
    wmin = jnp.full(pv.shape[:-1], jnp.inf, jnp.float32)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                corner = base + jnp.asarray([cx, cy, cz])
                t, w, _ = read_voxels_nearest(m, corner, bits, shard=shard)
                wgt = (
                    (frac[..., 0] if cx else 1.0 - frac[..., 0])
                    * (frac[..., 1] if cy else 1.0 - frac[..., 1])
                    * (frac[..., 2] if cz else 1.0 - frac[..., 2])
                )
                tsdf = tsdf + wgt * t
                wmin = jnp.minimum(wmin, w)
    return tsdf, wmin
