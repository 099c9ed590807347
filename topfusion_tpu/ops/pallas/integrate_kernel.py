"""Pallas TPU kernel: fused block-sparse TSDF integration.

The XLA formulation of integration (ops/tsdf_block.integrate_blocks) is
three passes over the visible working set: gather pool blocks -> fuse ->
scatter back, plus a per-voxel depth gather.  On TPU all three are
gather/scatter-shaped (~8 ns/element — docs/PERFORMANCE.md); this kernel
fuses the whole operation into one pass with none of them:

  * pool blocks stream HBM->VMEM->HBM through the Pallas pipeline with a
    scalar-prefetched slot list driving the BlockSpec index maps, writing
    back IN PLACE via input/output aliasing — no gather, no scatter;
  * the depth image lives in VMEM once; each block samples it through an
    aligned window at its projected footprint and a one-hot matmul on the
    MXU — no per-voxel gather.  (A VGA-scale block always fits the
    256-px-wide window: a 40 mm block at the 0.2 m frustum minimum spans
    fx * 0.04 / 0.2 ~ 100 px, plus <=127 px of alignment loss.)
  * padded grid entries are routed to a sacrificial pool row (index
    ``capacity``), so they never touch live blocks.

Fusion semantics are IDENTICAL to the XLA path (same rule as
computeUpdatedVoxelDepthInfo, reference:
tfusion/include/tfusion/cuda/SceneReconstructionEngine.hpp:23-71);
tests assert element-level agreement in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from topfusion_tpu.config import BlockMapConfig, CameraConfig, TSDFConfig
from topfusion_tpu.geometry.se3 import se3_inverse
from topfusion_tpu.ops.blockmap import BlockMap

_WIN_H = 128   # depth window height (v); origin 8-aligned
_WIN_W = 256   # depth window width (u); origin 128-aligned


def _kernel(
    # scalar prefetch
    slots_ref,      # [Vp] int32 target pool row (capacity = sacrificial)
    coords_ref,     # [3, Vp] int32 block coords (transposed: SMEM pads the
                    # minor dim to the lane width, so [Vp, 3] would cost
                    # Vp*128 words)
    # tensor inputs (blocked by the grid spec)
    tsdf_ref,       # [1, B, B*B] f32 — this block's tsdf (x, y*B+z)
    w_ref,          # [1, B, B*B] f32
    depth_ref,      # [H, W] f32 (full, VMEM)
    params_ref,     # [1, 24] f32
    # outputs (aliases of the pool, same index map)
    tsdf_out,
    w_out,
    *,
    bsz: int,
    h: int,
    w: int,
    win_h: int,
    win_w: int,
):
    i = pl.program_id(0)

    fx = params_ref[0, 0]
    fy = params_ref[0, 1]
    cx = params_ref[0, 2]
    cy = params_ref[0, 3]
    voxel = params_ref[0, 4]
    mu = params_ref[0, 5]
    fmin = params_ref[0, 6]
    fmax = params_ref[0, 7]
    maxw = params_ref[0, 8]
    stop_at_max = params_ref[0, 9]
    r00, r01, r02, t0 = (params_ref[0, 10], params_ref[0, 11],
                         params_ref[0, 12], params_ref[0, 13])
    r10, r11, r12, t1 = (params_ref[0, 14], params_ref[0, 15],
                         params_ref[0, 16], params_ref[0, 17])
    r20, r21, r22, t2 = (params_ref[0, 18], params_ref[0, 19],
                         params_ref[0, 20], params_ref[0, 21])

    # Local voxel offsets laid out as the (B, B*B) ref block: row = x,
    # col = y*B + z (the row-major flattening of [B, B, B]).  All compute
    # stays in this native 2-D shape — Mosaic cannot shape-cast
    # (1, 8, 64) <-> (1, 512) vectors.
    row = lax.broadcasted_iota(jnp.int32, (bsz, bsz * bsz), 0)
    col = lax.broadcasted_iota(jnp.int32, (bsz, bsz * bsz), 1)
    lx = row.astype(jnp.float32)
    ly = (col // bsz).astype(jnp.float32)
    lz = (col % bsz).astype(jnp.float32)

    bx = coords_ref[0, i].astype(jnp.float32)
    by = coords_ref[1, i].astype(jnp.float32)
    bz = coords_ref[2, i].astype(jnp.float32)
    wx = (bx * bsz + lx + 0.5) * voxel
    wy = (by * bsz + ly + 0.5) * voxel
    wz = (bz * bsz + lz + 0.5) * voxel
    px = r00 * wx + r01 * wy + r02 * wz + t0
    py = r10 * wx + r11 * wy + r12 * wz + t1
    pz = r20 * wx + r21 * wy + r22 * wz + t2
    inv_z = 1.0 / jnp.maximum(pz, 1e-6)
    u = px * inv_z * fx + cx
    v = py * inv_z * fy + cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    in_bounds = (
        (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
        & (pz >= fmin) & (pz <= fmax)
    )

    # Aligned depth window at the projected footprint.  The window origin
    # must come from IN-BOUNDS voxels only: out-of-frustum voxels project
    # to garbage coordinates and would drag the window away from the
    # valid ones.
    big = jnp.int32(1 << 20)
    ui_v = jnp.where(in_bounds, ui, big)
    vi_v = jnp.where(in_bounds, vi, big)
    u0 = jnp.clip((jnp.min(ui_v) // 128) * 128, 0, w - win_w)
    v0 = jnp.clip((jnp.min(vi_v) // 8) * 8, 0, h - win_h)
    u0 = pl.multiple_of(u0, 128)
    v0 = pl.multiple_of(v0, 8)
    win = depth_ref[pl.ds(v0, win_h), pl.ds(u0, win_w)]

    ur = jnp.clip(ui - u0, 0, win_w - 1)                     # [B, B*B]
    vr = jnp.clip(vi - v0, 0, win_h - 1)
    # A voxel whose projection falls outside the window cannot be
    # sampled; skip its update (footprint analysis in the module doc says
    # this never triggers at VGA/5 mm, it is a correctness guard).
    in_bounds = (
        in_bounds
        & (ui >= u0) & (ui < u0 + win_w)
        & (vi >= v0) & (vi < v0 + win_h)
    )
    # One-hot u-selection as a batched MXU contraction, staying 3-D:
    #   mid[r, q, vh] = sum_w (ur[r, q] == w) * win[vh, w]
    cols_u = lax.broadcasted_iota(jnp.int32, (bsz, bsz * bsz, win_w), 2)
    oh_u = (cols_u == ur[..., None]).astype(jnp.float32)     # [B, B*B, Ww]
    mid = jax.lax.dot_general(
        oh_u, win,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, B*B, win_h]
    # One-hot v-selection on the VPU.
    cols_v = lax.broadcasted_iota(jnp.int32, (bsz, bsz * bsz, win_h), 2)
    oh_v = (cols_v == vr[..., None]).astype(jnp.float32)
    d = jnp.sum(mid * oh_v, axis=2)                          # [B, B*B]

    eta = d - pz
    tsdf_old = tsdf_ref[0].astype(jnp.float32)               # [B, B*B]
    w_old = w_ref[0].astype(jnp.float32)
    update = in_bounds & (d > 0.0) & (eta >= -mu)
    update = update & jnp.logical_or(stop_at_max < 0.5, w_old < maxw)
    new_f = jnp.maximum(jnp.minimum(1.0, eta / mu), -1.0)
    fused = (tsdf_old * w_old + new_f) / (w_old + 1.0)
    w_new = jnp.minimum(w_old + 1.0, maxw)
    tsdf_out[0] = jnp.where(update, fused, tsdf_old).astype(tsdf_out.dtype)
    w_out[0] = jnp.where(update, w_new, w_old).astype(w_out.dtype)


def integrate_blocks_pallas(
    m: BlockMap,
    cam: CameraConfig,
    tsdf_cfg: TSDFConfig,
    bm_cfg: BlockMapConfig,
    T_wc: jnp.ndarray,
    depth: jnp.ndarray,
    vis: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    interpret: bool = False,
) -> Tuple[BlockMap, jnp.ndarray]:
    """Drop-in replacement for ops/tsdf_block.integrate_blocks."""
    slots, coords, mask = vis
    bsz = bm_cfg.block_size
    n_vox = bsz**3
    cap = m.capacity
    h, w = depth.shape

    T_cw = se3_inverse(T_wc)
    params = jnp.concatenate(
        [
            jnp.asarray(
                [
                    cam.fx, cam.fy, cam.cx, cam.cy,
                    tsdf_cfg.voxel_size, tsdf_cfg.trunc_dist,
                    tsdf_cfg.view_frustum_min, tsdf_cfg.view_frustum_max,
                    tsdf_cfg.max_weight,
                    1.0 if tsdf_cfg.stop_integrating_at_max_weight else 0.0,
                ],
                jnp.float32,
            ),
            T_cw[:3, :].reshape(-1),
            jnp.zeros((2,), jnp.float32),
        ]
    ).reshape(1, 24)

    # Padded entries -> the pool's permanent sacrificial row (index cap,
    # see make_block_map) — no per-call concat/slice copies of the pool.
    # The pool is blocked as [1, B, B*B] per grid step: Mosaic requires
    # the last two block dims to be (multiple of 8, multiple of 128 OR
    # the full array dim) — (B, B*B) = (8, 64) with a 64-wide array
    # satisfies that, while the flat (1, 512) block does not.
    pool_shape = (cap + 1, bsz, bsz * bsz)
    dtype = m.tsdf.dtype
    slots_in = jnp.where(mask, slots, cap).astype(jnp.int32)
    tsdf_pool = m.tsdf.reshape(pool_shape)
    w_pool = m.weight.reshape(pool_shape)

    blk = (1, bsz, bsz * bsz)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(slots_in.shape[0],),
        in_specs=[
            pl.BlockSpec(blk, lambda i, slots, coords: (slots[i], 0, 0)),
            pl.BlockSpec(blk, lambda i, slots, coords: (slots[i], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # depth
            pl.BlockSpec(memory_space=pltpu.VMEM),   # params
        ],
        out_specs=[
            pl.BlockSpec(blk, lambda i, slots, coords: (slots[i], 0, 0)),
            pl.BlockSpec(blk, lambda i, slots, coords: (slots[i], 0, 0)),
        ],
    )

    kernel = functools.partial(
        _kernel, bsz=bsz, h=h, w=w,
        win_h=min(_WIN_H, h - h % 8 if h % 8 else h),
        win_w=min(_WIN_W, w),
    )
    tsdf_new, w_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(pool_shape, dtype),
            jax.ShapeDtypeStruct(pool_shape, dtype),
        ),
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(slots_in, coords.T, tsdf_pool, w_pool, depth, params)

    m = m._replace(
        tsdf=tsdf_new.reshape(m.tsdf.shape),
        weight=w_new.reshape(m.weight.shape),
    )
    return m, jnp.sum(mask.astype(jnp.int32))
