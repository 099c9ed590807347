"""Host block cache: the GlobalCache analogue (out-of-core block pool).

The reference allocates (but never uses) a host-side copy of every block
with a swap state machine (reference:
tfusion/include/tfusion/GlobalCache.hpp:22-134).  Here the host side is
a plain coord-keyed store plus an LRU policy over device slots; all the
heavy lifting is three batched device ops (ops/swap.py).  The policy
runs BETWEEN jitted steps (swap is inherently host-interactive — the
reference's swap engine is host code for the same reason):

  * after each step/chunk: update per-slot last-seen from the aged
    visible list (already device-resident, tiny fetch), and when
    occupancy crosses the high watermark, evict the coldest slots to the
    host store (one extract + one compaction dispatch);
  * before each step/chunk: restore host-cached blocks that fall in the
    CURRENT view frustum (predicted from the last pose — restore lags
    one step, tolerated the same way frame-to-model tracking tolerates a
    one-frame-old model map), with one insert dispatch.

With a ``HostBlockCache`` attached, effective scene capacity is bounded
by host RAM, not HBM: tests/test_swap.py sweeps a corridor whose block
count exceeds pool capacity at ATE parity with an uncapped run.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from topfusion_tpu.config import BlockMapConfig, CameraConfig, TSDFConfig
from topfusion_tpu.ops.blockmap import BlockMap
from topfusion_tpu.ops.swap import (
    ExtractedBlocks,
    evict_blocks,
    extract_blocks,
    insert_blocks,
)


class HostBlockCache:
    """Coord-keyed host store + LRU eviction policy over device slots."""

    def __init__(
        self,
        bm_cfg: BlockMapConfig,
        tsdf_cfg: TSDFConfig,
        cam: CameraConfig,
        evict_batch: int = 1024,
        restore_batch: Optional[int] = None,
        headroom: Optional[int] = None,
        high_watermark: Optional[float] = None,
        low_watermark: Optional[float] = None,  # kept for API compat
    ):
        self.bm_cfg = bm_cfg
        self.tsdf_cfg = tsdf_cfg
        self.cam = cam
        self.evict_batch = evict_batch
        self.restore_batch = min(
            restore_batch or bm_cfg.max_new_blocks_per_frame,
            bm_cfg.max_new_blocks_per_frame,
        )
        # Headroom policy: keep FREE slots >= headroom at every step so a
        # burst frame (fresh allocation + a restore batch) never hits the
        # capacity wall between eviction opportunities.  A watermark-only
        # trigger lags bursts (measured drops on the corridor sweep).
        if headroom is None:
            if high_watermark is not None:
                headroom = int((1.0 - high_watermark) * bm_cfg.capacity)
            else:
                headroom = min(
                    bm_cfg.capacity // 2,
                    evict_batch + self.restore_batch,
                )
        self.headroom = headroom
        # coord tuple -> (tsdf [B,B,B], weight [B,B,B], color or None)
        self.store: Dict[Tuple[int, int, int], tuple] = {}
        self.last_seen = np.zeros(bm_cfg.capacity, np.int64)
        self._frame = 0
        # Jitted device ops (compiled once per shape).
        self._extract = jax.jit(extract_blocks)
        self._evict = jax.jit(
            lambda m, s: evict_blocks(m, s, bm_cfg)
        )
        self._insert = jax.jit(
            lambda m, blocks: insert_blocks(
                m, blocks, bm_cfg, tsdf_cfg.max_weight
            )
        )

    # ------------------------------------------------------------- stats
    @property
    def n_host_blocks(self) -> int:
        return len(self.store)

    # ------------------------------------------------------------- after
    def after_step(
        self, m: BlockMap, vis_slots: np.ndarray,
        vis_slots_dev: Optional[jnp.ndarray] = None,
    ) -> Tuple[BlockMap, Optional[jnp.ndarray]]:
        """Update recency from this step's visible list; evict when the
        pool crosses the high watermark.  Returns (map, vis-remap or
        None): when an eviction compacted the pool, ``remap`` is the
        old->new slot map ([capacity] int32, -1 = evicted) the caller
        must apply to any slot-indexed side state (the aged visible
        list)."""
        self._frame += 1
        vs = np.asarray(vis_slots)
        vs = vs[vs >= 0]
        self.last_seen[vs] = self._frame

        total_remap = None
        # Evict in batches until the free headroom is restored (a single
        # batch smaller than the headroom would leave restores + fresh
        # allocation racing the next eviction opportunity).
        while True:
            n_live = int(m.num_blocks)
            free = self.bm_cfg.capacity - n_live
            n_target = min(self.evict_batch, self.headroom - free, n_live)
            if n_target <= 0:
                break
            order = np.argsort(self.last_seen[:n_live], kind="stable")
            cold = order[:n_target].astype(np.int32)
            slots = np.full((self.evict_batch,), -1, np.int32)
            slots[: len(cold)] = cold
            slots_dev = jnp.asarray(slots)

            ex = self._extract(m, slots_dev)
            m, remap = self._evict(m, slots_dev)
            # Host fetch of the evicted payload (bounded rows/batch).
            coords = np.asarray(ex.coords)
            tsdf = np.asarray(ex.tsdf)
            weight = np.asarray(ex.weight)
            has_color = ex.color.shape[1] == tsdf.shape[1]
            color = np.asarray(ex.color) if has_color else None
            valid = np.asarray(ex.valid)
            for i in np.nonzero(valid)[0]:
                self.store[tuple(int(c) for c in coords[i])] = (
                    tsdf[i], weight[i], color[i] if has_color else None,
                )

            # Remap host recency to the compacted slot space.
            remap_np = np.asarray(remap)
            new_seen = np.zeros_like(self.last_seen)
            kept = remap_np >= 0
            new_seen[remap_np[kept]] = self.last_seen[: len(remap_np)][kept]
            self.last_seen = new_seen
            if total_remap is None:
                total_remap = remap_np
            else:
                total_remap = np.where(
                    total_remap >= 0,
                    remap_np[np.clip(total_remap, 0, len(remap_np) - 1)],
                    -1,
                )
        return m, (None if total_remap is None else jnp.asarray(total_remap))

    # ------------------------------------------------------------ before
    def before_step(self, m: BlockMap, T_wc: np.ndarray) -> BlockMap:
        """Restore host-cached blocks visible from ``T_wc`` (the last
        known pose — a one-step prediction lag)."""
        if not self.store:
            return m
        coords = np.asarray(list(self.store.keys()), np.int32)
        vis = self._visible_mask(coords, np.asarray(T_wc))
        idx = np.nonzero(vis)[0]
        if len(idx) == 0:
            return m
        idx = idx[: self.restore_batch]
        K = self.restore_batch
        b = self.bm_cfg.block_size
        sel = coords[idx]
        tsdf = np.stack([self.store[tuple(c)][0] for c in sel])
        weight = np.stack([self.store[tuple(c)][1] for c in sel])
        col0 = self.store[tuple(sel[0])][2]
        if col0 is not None:
            color = np.stack([self.store[tuple(c)][2] for c in sel])
        else:
            color = np.zeros((len(idx), 1, 1, 1, 3), tsdf.dtype)

        def pad(a, fill=0):
            out = np.full((K,) + a.shape[1:], fill, a.dtype)
            out[: len(a)] = a
            return out

        blocks = ExtractedBlocks(
            coords=jnp.asarray(pad(sel)),
            tsdf=jnp.asarray(pad(tsdf)),
            weight=jnp.asarray(pad(weight)),
            color=jnp.asarray(pad(color)),
            valid=jnp.asarray(
                np.arange(K) < len(idx)
            ),
        )
        m, ok = self._insert(m, blocks)
        ok = np.asarray(ok)
        for i, gi in enumerate(idx):
            if ok[i]:
                del self.store[tuple(sel[i])]
        return m

    # ------------------------------------------------------------- geom
    def _visible_mask(self, coords: np.ndarray, T_wc: np.ndarray):
        return host_visible_mask(
            coords, T_wc, self.bm_cfg, self.tsdf_cfg, self.cam
        )

    # ------------------------------------------------------------ remap
    def remap_store(self, corr: np.ndarray) -> None:
        """Carry the host store through a map correction instead of
        discarding it (round-3 VERDICT missing #4): rigidly transform
        each spilled block's center by ``corr`` and re-key it to the
        nearest block coordinate; collisions MERGE by fusion weight.

        This is the nearest-block approximation of per-block pose-warp
        (voxel content is not resampled): exact for corrections that are
        near block-lattice translations, and off by at most the
        correction's rotation x block radius otherwise — the restore
        path's weighted merge (insert_blocks) then blends it with
        re-observed data, so a spilled corridor re-entered after a loop
        closure degrades smoothly instead of vanishing.
        """
        bm = self.bm_cfg.block_size * self.tsdf_cfg.voxel_size
        if not self.store:
            return
        corr = np.asarray(corr, np.float64)
        keys = np.asarray(list(self.store.keys()), np.float64)
        centers = (keys + 0.5) * bm
        moved = centers @ corr[:3, :3].T + corr[:3, 3]
        new_keys = np.floor(moved / bm).astype(np.int64)
        new_store: Dict[Tuple[int, int, int], tuple] = {}
        for old_key, nk in zip(list(self.store.keys()), new_keys):
            t, w, c = self.store[old_key]
            key = (int(nk[0]), int(nk[1]), int(nk[2]))
            if key in new_store:
                t0, w0, c0 = new_store[key]
                wsum = np.maximum(w0 + w, 1e-6)
                t = (t0 * w0 + t * w) / wsum
                if c0 is not None and c is not None:
                    c = (c0 * w0[..., None] + c * w[..., None]) / wsum[..., None]
                w = np.minimum(w0 + w, self.tsdf_cfg.max_weight)
            new_store[key] = (t, w, c)
        self.store = new_store


def host_visible_mask(
    coords: np.ndarray,
    T_wc: np.ndarray,
    bm_cfg: BlockMapConfig,
    tsdf_cfg: TSDFConfig,
    cam: CameraConfig,
) -> np.ndarray:
    """Conservative frustum test of block centers (numpy; the host twin
    of ops/tsdf_block._block_frustum_mask)."""
    cfg = tsdf_cfg
    bm = bm_cfg.block_size * cfg.voxel_size
    radius = 0.5 * np.sqrt(3.0) * bm
    centers = (coords.astype(np.float64) + 0.5) * bm
    R = T_wc[:3, :3]
    t = T_wc[:3, 3]
    pc = (centers - t) @ R  # R^T (p - t)
    z = pc[:, 2]
    zs = np.maximum(z, cfg.view_frustum_min * 0.5)
    u = pc[:, 0] / zs * cam.fx + cam.cx
    v = pc[:, 1] / zs * cam.fy + cam.cy
    ru = radius / zs * abs(cam.fx)
    rv = radius / zs * abs(cam.fy)
    return (
        (z > cfg.view_frustum_min - radius)
        & (z < cfg.view_frustum_max + radius)
        & (u >= -ru) & (u <= cam.width - 1 + ru)
        & (v >= -rv) & (v <= cam.height - 1 + rv)
    )


class ShardedHostCache:
    """Per-shard GlobalCache analogue for ShardedBlockPipeline: ns host
    stores (one per map shard — block ownership is static by hash, so a
    block evicted from shard s always restores into shard s), one
    mesh-wide dispatch per evict round / restore batch.

    With this attached, a sharded run scales out (chips) AND beyond
    aggregate HBM (host RAM) at once — BASELINE.md configs 4/5
    composed, round-3 VERDICT missing #1.  tests/test_swap.py drives a
    corridor sweep beyond aggregate capacity on the CPU mesh at ATE
    parity with an uncapped run and zero ``blocks_dropped``.
    """

    def __init__(
        self,
        pipe,  # ShardedBlockPipeline
        evict_batch: int = 1024,
        restore_batch: Optional[int] = None,
        headroom: Optional[int] = None,
    ):
        bm = pipe.local_cfg.blockmap
        self.pipe = pipe
        self.bm_cfg = bm
        self.tsdf_cfg = pipe.local_cfg.tsdf
        self.cam = pipe.local_cfg.camera
        self.ns = pipe.ns
        self.evict_batch = evict_batch
        self.restore_batch = min(
            restore_batch or bm.max_new_blocks_per_frame,
            bm.max_new_blocks_per_frame,
        )
        if headroom is None:
            headroom = min(
                bm.capacity // 2, evict_batch + self.restore_batch
            )
        self.headroom = headroom
        self.stores = [dict() for _ in range(self.ns)]
        self.last_seen = np.zeros((self.ns, bm.capacity), np.int64)
        self._frame = 0

    @property
    def n_host_blocks(self) -> int:
        return sum(len(s) for s in self.stores)

    # ------------------------------------------------------------- after
    def after_step(self, state):
        """Update per-shard recency from the aged visible list; evict the
        coldest local slots on every shard whose pool crossed its
        headroom.  Returns the (possibly compacted) state — the aged
        visible list is remapped in-graph by the evict dispatch."""
        self._frame += 1
        vis = np.asarray(state.vis_slots).reshape(self.ns, -1)
        for s in range(self.ns):
            vs = vis[s]
            self.last_seen[s, vs[vs >= 0]] = self._frame

        while True:
            nb = np.asarray(state.num_blocks)
            slots = np.full((self.ns, self.evict_batch), -1, np.int32)
            any_evict = False
            for s in range(self.ns):
                n_live = int(nb[s])
                free = self.bm_cfg.capacity - n_live
                n_target = min(
                    self.evict_batch, self.headroom - free, n_live
                )
                if n_target <= 0:
                    continue
                any_evict = True
                order = np.argsort(self.last_seen[s, :n_live], kind="stable")
                slots[s, :n_target] = order[:n_target].astype(np.int32)
            if not any_evict:
                break

            state, ex, remap = self.pipe.swap_evict(
                state, jnp.asarray(slots)
            )
            coords = np.asarray(ex.coords)
            tsdf = np.asarray(ex.tsdf)
            weight = np.asarray(ex.weight)
            has_color = ex.color.shape[2] == tsdf.shape[2]
            color = np.asarray(ex.color) if has_color else None
            valid = np.asarray(ex.valid)
            remap = np.asarray(remap)
            for s in range(self.ns):
                for i in np.nonzero(valid[s])[0]:
                    self.stores[s][tuple(int(c) for c in coords[s, i])] = (
                        tsdf[s, i], weight[s, i],
                        color[s, i] if has_color else None,
                    )
                new_seen = np.zeros_like(self.last_seen[s])
                kept = remap[s] >= 0
                new_seen[remap[s][kept]] = self.last_seen[s][kept]
                self.last_seen[s] = new_seen
        return state

    # ------------------------------------------------------------ remap
    def remap_store(self, corr: np.ndarray) -> None:
        """Carry every shard's host store through a map correction (see
        HostBlockCache.remap_store for the approximation argument).  A
        re-keyed block's OWNER can change — ownership is
        hash(coords) % ns (ops/blockmap._bucket_owner), and the key
        moved — so entries redistribute across the per-shard stores."""
        bm = self.bm_cfg.block_size * self.tsdf_cfg.voxel_size
        if self.n_host_blocks == 0:
            return
        corr = np.asarray(corr, np.float64)
        new_stores = [dict() for _ in range(self.ns)]
        nb_global = self.bm_cfg.capacity * self.ns  # local buckets * ns
        for store in self.stores:
            if not store:
                continue
            keys = np.asarray(list(store.keys()), np.int64)
            centers = (keys + 0.5) * bm
            moved = centers @ corr[:3, :3].T + corr[:3, 3]
            nk = np.floor(moved / bm).astype(np.int64)
            # int32-wraparound Teschner hash, low bits only (& mask makes
            # the int64 product equivalent to the device's int32 math).
            h = (
                (nk[:, 0] * 73856093)
                ^ (nk[:, 1] * 19349669)
                ^ (nk[:, 2] * 83492791)
            )
            owner = (h & (nb_global - 1)) % self.ns
            for old_key, nkey, s in zip(list(store.keys()), nk, owner):
                t, w, c = store[old_key]
                key = (int(nkey[0]), int(nkey[1]), int(nkey[2]))
                dst = new_stores[int(s)]
                if key in dst:
                    t0, w0, c0 = dst[key]
                    wsum = np.maximum(
                        np.asarray(w0, np.float64)
                        + np.asarray(w, np.float64),
                        1e-6,
                    )
                    t = (t0 * w0 + t * w) / wsum
                    if c0 is not None and c is not None:
                        c = (
                            c0 * w0[..., None] + c * w[..., None]
                        ) / wsum[..., None]
                    w = np.minimum(w0 + w, self.tsdf_cfg.max_weight)
                dst[key] = (t, w, c)
        self.stores = new_stores

    # ------------------------------------------------------------ before
    def before_step(self, state, T_wc: np.ndarray):
        """Restore host-cached blocks visible from ``T_wc`` into their
        owning shards (one mesh-wide insert dispatch)."""
        from topfusion_tpu.ops.swap import ExtractedBlocks

        if self.n_host_blocks == 0:
            return state
        K = self.restore_batch
        b = self.bm_cfg.block_size
        # dtype via the array's metadata — np.asarray here would fetch the
        # ENTIRE sharded TSDF pool to host every restore call.
        dtype = np.dtype(state.tsdf.dtype)
        has_color = self.pipe.cfg.tsdf.use_color
        coords_a = np.zeros((self.ns, K, 3), np.int32)
        tsdf_a = np.zeros((self.ns, K, b, b, b), dtype)
        weight_a = np.zeros((self.ns, K, b, b, b), dtype)
        color_a = (
            np.zeros((self.ns, K, b, b, b, 3), dtype)
            if has_color
            else np.zeros((self.ns, K, 1, 1, 1, 3), dtype)
        )
        valid_a = np.zeros((self.ns, K), bool)
        picked = []
        any_restore = False
        for s in range(self.ns):
            picked.append([])
            if not self.stores[s]:
                continue
            coords = np.asarray(list(self.stores[s].keys()), np.int32)
            m = host_visible_mask(
                coords, np.asarray(T_wc), self.bm_cfg, self.tsdf_cfg,
                self.cam,
            )
            idx = np.nonzero(m)[0][:K]
            if len(idx) == 0:
                continue
            any_restore = True
            sel = coords[idx]
            picked[s] = [tuple(int(c) for c in cc) for cc in sel]
            coords_a[s, : len(idx)] = sel
            tsdf_a[s, : len(idx)] = np.stack(
                [self.stores[s][k][0] for k in picked[s]]
            )
            weight_a[s, : len(idx)] = np.stack(
                [self.stores[s][k][1] for k in picked[s]]
            )
            if has_color:
                color_a[s, : len(idx)] = np.stack(
                    [self.stores[s][k][2] for k in picked[s]]
                )
            valid_a[s, : len(idx)] = True
        if not any_restore:
            return state

        blocks = ExtractedBlocks(
            coords=jnp.asarray(coords_a),
            tsdf=jnp.asarray(tsdf_a),
            weight=jnp.asarray(weight_a),
            color=jnp.asarray(color_a),
            valid=jnp.asarray(valid_a),
        )
        state, ok = self.pipe.swap_insert(state, blocks)
        ok = np.asarray(ok)
        for s in range(self.ns):
            for i, key in enumerate(picked[s]):
                if ok[s, i]:
                    del self.stores[s][key]
        return state
