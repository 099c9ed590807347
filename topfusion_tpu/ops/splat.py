"""Forward-projection model-map generation (surfel splatting).

The reference carries a dormant forward-projection path
(reference: tfusion/src/cuda/VisualisationHelper.cu:123-170
forwardProject_device, commented host side at
VisualisationEngine_CUDA.cu:362-414).  Here it becomes the PRIMARY way to
produce ICP model maps, because it inverts the memory-access pattern:
instead of every ray GATHERING hundreds of voxels (TPUs have no hardware
gather), the surface voxels SCATTER themselves into the image:

  1. visible blocks -> per-voxel surface test (|tsdf|*mu < voxel, w > 0);
  2. project each surface voxel onto the zero level set along the local
     SDF gradient (intra-block central differences — exact away from
     block borders), giving sub-voxel surface points;
  3. project to pixels; z-buffering via one scatter-min of packed
     (depth | id) keys over a small quad footprint per splat;
  4. winner attributes gathered back; normals from image-space
     differences of the resulting point map (shared with the raycast
     path).

Cost is one compaction + one scatter-min + one gather over ~quarter-million
surface voxels — versus gather work proportional to rays x steps x
hash-probes for the marching raycast.  The marching raycast
(ops/tsdf_block.raycast_blocks) remains for display rendering and as the
semantic reference in tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from topfusion_tpu.config import BlockMapConfig, CameraConfig, TSDFConfig
from topfusion_tpu.geometry.se3 import se3_inverse, transform_points
from topfusion_tpu.geometry.camera import project
from topfusion_tpu.ops.blockmap import BlockMap
from topfusion_tpu.ops.tsdf_dense import RaycastResult
from topfusion_tpu.ops.normals import normals_from_point_map

_DEPTH_BITS = 14
_ID_BITS = 17  # up to 128k surface points


def splat_model_maps(
    m: BlockMap,
    cam: CameraConfig,
    tsdf_cfg: TSDFConfig,
    bm_cfg: BlockMapConfig,
    T_wc: jnp.ndarray,
    vis: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    max_surface_points: int = 1 << 17,
    splat_radius: int = 1,
) -> RaycastResult:
    """Render point/normal maps from the visible blocks by splatting.

    ``vis`` is the (slots, coords, mask) triple from
    ops/tsdf_block.visible_blocks (shared with integration).
    ``splat_radius=1`` scatters each surfel over a 2x2 pixel quad, closing
    the holes a 1-px point splat leaves at close range.
    """
    slots, coords, mask = vis
    bsz = bm_cfg.block_size
    voxel = tsdf_cfg.voxel_size
    mu = tsdf_cfg.trunc_dist
    h, w = cam.height, cam.width
    s_max = max_surface_points

    safe_slots = jnp.where(mask, slots, 0)
    # Fence the pool gathers: six roll taps consume tsdf_blk below, and
    # XLA would otherwise duplicate the gather into each tap.
    tsdf_blk, w_blk = lax.optimization_barrier(
        (
            m.tsdf[safe_slots].astype(jnp.float32),
            m.weight[safe_slots].astype(jnp.float32),
        )
    )  # [V, B, B, B]

    # --- surface voxels + gradient (intra-block central differences;
    # one-voxel wrap at block borders — border normals are refined later
    # from the image-space point map, so only the sub-voxel OFFSET uses
    # this gradient).
    def diff(axis):
        fwd = jnp.roll(tsdf_blk, -1, axis=axis)
        bwd = jnp.roll(tsdf_blk, 1, axis=axis)
        return (fwd - bwd) * 0.5

    g = jnp.stack([diff(1), diff(2), diff(3)], axis=-1)   # [V,B,B,B,3]
    gn = jnp.linalg.norm(g, axis=-1, keepdims=True)
    n_dir = g / jnp.maximum(gn, 1e-12)

    surface = (
        (jnp.abs(tsdf_blk) * mu < voxel)
        & (w_blk > 0.0)
        & (gn[..., 0] > 1e-6)
        & mask[:, None, None, None]
    )

    # World position projected onto the zero crossing.
    lx = lax.broadcasted_iota(jnp.float32, (1, bsz, bsz, bsz), 1)
    ly = lax.broadcasted_iota(jnp.float32, (1, bsz, bsz, bsz), 2)
    lz = lax.broadcasted_iota(jnp.float32, (1, bsz, bsz, bsz), 3)
    local = jnp.stack([lx, ly, lz], axis=-1)
    base = coords.astype(jnp.float32)[:, None, None, None, :] * bsz
    centers = (base + local + 0.5) * voxel
    p_surf = centers - n_dir * (tsdf_blk * mu)[..., None]

    # --- compact surface voxels to [s_max]
    flat_p = p_surf.reshape(-1, 3)
    flat_m = surface.reshape(-1)
    rank = jnp.cumsum(flat_m.astype(jnp.int32)) - 1
    keep = flat_m & (rank < s_max)
    sidx = jnp.where(keep, rank, s_max)
    pts = jnp.zeros((s_max, 3), jnp.float32).at[sidx].set(flat_p, mode="drop")
    pvalid = jnp.zeros((s_max,), bool).at[sidx].set(keep, mode="drop")

    # --- project to the camera
    T_cw = se3_inverse(T_wc)
    pc = transform_points(T_cw, pts)
    uv, z = project(cam, pc)
    zmin, zmax = tsdf_cfg.view_frustum_min, tsdf_cfg.view_frustum_max
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    v = jnp.round(uv[..., 1]).astype(jnp.int32)
    ok = pvalid & (z > zmin) & (z < zmax)

    # Packed z-buffer key: depth-quantized in the high bits, surfel id in
    # the low bits -> scatter-min picks the nearest surfel per pixel and
    # remembers who it was.  Ties break deterministically by id.
    zq = jnp.clip(
        ((z - zmin) / (zmax - zmin) * ((1 << _DEPTH_BITS) - 1)),
        0,
        (1 << _DEPTH_BITS) - 1,
    ).astype(jnp.int32)
    ids = jnp.arange(s_max, dtype=jnp.int32)
    key = (zq << _ID_BITS) | ids
    sentinel = jnp.iinfo(jnp.int32).max

    zbuf = jnp.full((h * w,), sentinel, jnp.int32)
    for du in range(-splat_radius + 1, splat_radius + 1):
        for dv in range(-splat_radius + 1, splat_radius + 1):
            uu = u + du
            vv = v + dv
            inb = ok & (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
            pix = jnp.where(inb, vv * w + uu, h * w)
            zbuf = zbuf.at[pix].min(jnp.where(inb, key, sentinel), mode="drop")

    hit = zbuf != sentinel
    winner = jnp.where(hit, zbuf & ((1 << _ID_BITS) - 1), 0)
    points = jnp.where(hit[:, None], pts[winner], 0.0).reshape(h, w, 3)
    depth = jnp.where(hit, z[winner], 0.0).reshape(h, w)

    # Fence: the point map is produced by a gather; without a barrier XLA
    # duplicates that gather into every tap of the normal stencil.
    points = lax.optimization_barrier(points)
    o_w = T_wc[:3, 3]
    normals = normals_from_point_map(points, o_w)
    return RaycastResult(
        points=points,
        normals=normals,
        hit=hit.reshape(h, w),
        depth=depth,
        confidence=hit.reshape(h, w).astype(jnp.float32),
    )
