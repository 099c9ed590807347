"""Pallas TPU kernel: fused block-sparse TSDF integration.

The XLA formulation of integration (ops/tsdf_block.integrate_blocks) is
three passes over the visible working set: gather pool blocks -> fuse ->
scatter back, plus a per-voxel depth gather.  Row-granularity pool
gather/scatter is CHEAP on TPU (~0.1 ns/byte for 2 KB rows, measured);
what kills the XLA path is the per-voxel depth image gather (2M scalar
gathers ~ 8 ns each).  So the design is:

  * gather visible blocks into a contiguous ``[V, B, B*B]`` tensor with
    one XLA row-gather, scatter back with one row-scatter (sacrificial
    row swallows padded entries);
  * a Pallas kernel streams the contiguous tensor through VMEM,
    ``BLOCKS_PER_STEP`` blocks per grid step (large sequential DMAs — a
    1-block-per-step slot-indexed BlockSpec pays ~2 us of tiny-DMA /
    grid overhead per step, measured 8 ms at 4096 steps);
  * the depth image lives in VMEM once; each block samples it through an
    aligned window at its projected footprint and a one-hot matmul on
    the MXU — no per-voxel gather.  (A VGA-scale block always fits the
    256-px-wide window: a 40 mm block at the 0.2 m frustum minimum spans
    fx * 0.04 / 0.2 ~ 100 px, plus <=127 px of alignment loss.)

Fusion semantics are IDENTICAL to the XLA path (same rule as
computeUpdatedVoxelDepthInfo, reference:
tfusion/include/tfusion/cuda/SceneReconstructionEngine.hpp:23-71).  The
per-voxel PROJECTION — pixel index, frustum gates, voxel camera depth —
is computed OUTSIDE the kernel by the very same XLA ops the reference
path uses, and enters the kernel as data (a packed window-relative pixel
code + the voxel's camera-space z).  That is what makes the COMPILED
kernel agree with the XLA path, not just interpret mode: Mosaic lowers
division through a hardware reciprocal approximation, and an in-kernel
``u = x * (1/z) * fx`` can round to a different pixel than XLA's
``x / z * fx`` exactly at half-integer boundaries (caught by
tests/test_pallas_integrate.py's compiled-TPU agreement test).  Moving
the projection out also deletes the per-block scalar transform math from
the kernel; the added DMA is two [V, B*B*B] tensors (~16 MB at the VGA
working set, ~70 us at the measured 226 GB/s stream).
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
from topfusion_tpu.geometry.se3 import se3_inverse, transform_points
from topfusion_tpu.geometry.camera import project
from topfusion_tpu.ops.blockmap import BlockMap

_WIN_H = 128   # depth window height (v); origin 16-aligned (bf16 tile)
_WIN_W = 256   # depth window width (u); origin 128-aligned
_BLOCKS_PER_STEP = 8


def _sample_one_block(
    uv0_ref, code_ref, depth_hi_ref, depth_lo_ref, d_out,
    *, g: int, bsz: int, win_h: int, win_w: int,
):
    """Select each voxel's depth sample for block ``g`` of the slab."""
    i = pl.program_id(0) * code_ref.shape[0] + g

    # Aligned depth window at the projected footprint.  The origin is
    # precomputed OUTSIDE the kernel from the block's projected corners
    # (one vectorized XLA pass over all blocks).
    u0 = pl.multiple_of(uv0_ref[0, i], 128)
    v0 = pl.multiple_of(uv0_ref[1, i], 16)
    win_hi = depth_hi_ref[pl.ds(v0, win_h), pl.ds(u0, win_w)]
    win_lo = depth_lo_ref[pl.ds(v0, win_h), pl.ds(u0, win_w)]

    # Window-relative pixel code per voxel, precomputed by the XLA
    # projection (code = (vr << 16) | ur, or -1 for any voxel the XLA
    # path would not update: out of image/frustum, outside the aligned
    # window, or a padded vis entry).  BIT-packed, not vr*win_w+ur:
    # Mosaic lowers integer div/mod by a non-power-of-2 through a float
    # reciprocal that is off-by-one near exact multiples (caught by the
    # compiled-TPU agreement test); shift/mask decode is exact.
    code = code_ref[g]                                       # [B, B*B] i32
    valid = code >= 0
    safe = jnp.where(valid, code, 0)
    ur = safe & 0xFFFF
    vr = (safe >> 16) & 0x7FFF

    # One-hot u-selection as a batched MXU contraction, staying 3-D:
    #   mid[r, q, vh] = sum_w (ur[r, q] == w) * win[vh, w]
    # The MXU's native bf16 pass truncates an f32 depth to 8 mantissa
    # bits (~2 mm at 1.3 m), which flips the eta >= -mu update gate vs
    # the XLA path near the truncation boundary (caught by the
    # compiled-TPU agreement test).  Selection must be EXACT — so the
    # depth arrives as TWO bf16 byte planes of its u16 MILLIMETER value
    # (hi = mm // 256, lo = mm % 256; both < 256, exact in bf16): two
    # single-pass bf16 dots of exact small integers are exact, and
    # mm * 0.001f afterwards is the very multiply the XLA frontend uses
    # (ops/depth.depth_to_meters) — bit-identical d at ~1/3 the cost of
    # a Precision.HIGHEST f32 dot.
    cols_u = lax.broadcasted_iota(jnp.int32, (bsz, bsz * bsz, win_w), 2)
    oh_u = (cols_u == ur[..., None]).astype(jnp.bfloat16)    # [B, B*B, Ww]
    dn = (((2,), (1,)), ((), ()))
    mid_hi = jax.lax.dot_general(
        oh_u, win_hi, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )  # [B, B*B, win_h]
    mid_lo = jax.lax.dot_general(
        oh_u, win_lo, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    mid = mid_hi * 256.0 + mid_lo                            # exact mm
    # One-hot v-selection on the VPU.
    cols_v = lax.broadcasted_iota(jnp.int32, (bsz, bsz * bsz, win_h), 2)
    oh_v = (cols_v == vr[..., None]).astype(jnp.float32)
    d = jnp.sum(mid * oh_v, axis=2) * jnp.float32(0.001)     # [B, B*B]
    d_out[g] = jnp.where(valid, d, 0.0)


def _kernel(
    uv0_ref,        # scalar prefetch: [2, Vp] int32 window origins (u0, v0)
                    # (transposed: SMEM pads the minor dim to the lane
                    # width, so [Vp, 2] would cost Vp*128 words)
    code_ref,       # [G, B, B*B] i32 window-relative pixel code (-1 = skip)
    depth_hi_ref,   # [H, W] bf16: depth_mm // 256 (full, VMEM)
    depth_lo_ref,   # [H, W] bf16: depth_mm % 256
    d_out,          # [G, B, B*B] f32 selected depth (0 where invalid)
    **kw,
):
    for g in range(code_ref.shape[0]):
        _sample_one_block(
            uv0_ref, code_ref, depth_hi_ref, depth_lo_ref, d_out,
            g=g, **kw,
        )


def _window_origins(
    coords: jnp.ndarray,
    cam: CameraConfig,
    tsdf_cfg: TSDFConfig,
    block_metric: float,
    win_h: int,
    win_w: int,
    h: int,
    w: int,
    T_cw: jnp.ndarray,
) -> jnp.ndarray:
    """Aligned depth-window origin per block from its 8 projected corners.

    The origin must bound the projections of IN-FRUSTUM corners only:
    behind-camera corners project to garbage and would drag the window
    off the valid footprint.
    """
    corners = jnp.stack(
        jnp.meshgrid(*([jnp.asarray([0.0, 1.0])] * 3), indexing="ij"),
        axis=-1,
    ).reshape(8, 3)
    cw = (coords.astype(jnp.float32)[:, None, :] + corners[None]) * block_metric
    cc = transform_points(T_cw, cw)
    uvc, zc = project(cam, cc)
    okc = zc > 1e-3
    big = jnp.float32(1e9)
    umin = jnp.min(jnp.where(okc, uvc[..., 0], big), axis=1)
    vmin = jnp.min(jnp.where(okc, uvc[..., 1], big), axis=1)
    u0 = jnp.clip((jnp.floor(umin).astype(jnp.int32) // 128) * 128, 0, w - win_w)
    v0 = jnp.clip((jnp.floor(vmin).astype(jnp.int32) // 16) * 16, 0, h - win_h)
    return jnp.stack([u0, v0], axis=0).astype(jnp.int32)  # [2, V]


def gather_visible_blocks(
    m: BlockMap, vis: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One row-gather of the visible working set: ([V,B,B*B] tsdf, weight).

    Padded vis entries read the sacrificial row.  Shared by integration
    and splatting so the pool is gathered once per frame.
    """
    slots, _, mask = vis
    bsz = m.block_size
    cap = m.capacity
    shape3 = (cap + 1, bsz, bsz * bsz)
    safe = jnp.where(mask, slots, cap).astype(jnp.int32)
    return (
        m.tsdf.reshape(shape3)[safe],
        m.weight.reshape(shape3)[safe],
    )


def _project_voxels(
    coords: jnp.ndarray,
    mask: jnp.ndarray,
    cam: CameraConfig,
    tsdf_cfg: TSDFConfig,
    bsz: int,
    T_cw: jnp.ndarray,
    uv0: jnp.ndarray,
    win_h: int,
    win_w: int,
    h: int,
    w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """XLA projection of every visible voxel — the SAME op sequence as
    ops/tsdf_block.integrate_blocks, so the compiled kernel's update set
    is bit-identical to the XLA path's.  Returns (code [V,B,B*B] i32:
    window-relative pixel index or -1, pz [V,B,B*B] f32, n_skipped)."""
    V = coords.shape[0]
    row = lax.broadcasted_iota(jnp.int32, (1, bsz, bsz * bsz), 1)
    col = lax.broadcasted_iota(jnp.int32, (1, bsz, bsz * bsz), 2)
    lx = row.astype(jnp.float32)
    ly = (col // bsz).astype(jnp.float32)
    lz = (col % bsz).astype(jnp.float32)
    local = jnp.stack([lx, ly, lz], axis=-1)                 # [1,B,B*B,3]
    base = coords.astype(jnp.float32)[:, None, None, :] * bsz
    pw = (base + local + 0.5) * tsdf_cfg.voxel_size
    pc = transform_points(T_cw, pw)
    uv, z = project(cam, pc)
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    v = jnp.round(uv[..., 1]).astype(jnp.int32)
    in_bounds = (
        (u >= 0) & (u < w) & (v >= 0) & (v < h)
        & (z >= tsdf_cfg.view_frustum_min)
        & (z <= tsdf_cfg.view_frustum_max)
        & mask[:, None, None]
    )
    u0 = uv0[0][:, None, None]
    v0 = uv0[1][:, None, None]
    # A voxel whose projection falls outside the aligned window cannot be
    # sampled; skip its update (footprint analysis in the module doc says
    # this never triggers at VGA/5 mm, it is a correctness guard).  Every
    # skip is COUNTED and surfaced per frame (BlockStepAux
    # integrate_skipped) so silent under-integration on off-design
    # configurations (narrow FOV, larger blocks) is observable.
    in_window = (
        (u >= u0) & (u < u0 + win_w) & (v >= v0) & (v < v0 + win_h)
    )
    n_skipped = jnp.sum((in_bounds & ~in_window).astype(jnp.int32))
    valid = in_bounds & in_window
    code = jnp.where(valid, ((v - v0) << 16) | (u - u0), -1)
    return code.astype(jnp.int32), z.astype(jnp.float32), n_skipped


def integrate_blocks_pallas(
    m: BlockMap,
    cam: CameraConfig,
    tsdf_cfg: TSDFConfig,
    bm_cfg: BlockMapConfig,
    T_wc: jnp.ndarray,
    depth: jnp.ndarray,
    vis: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    interpret: bool = False,
    return_blocks: bool = False,
    return_skipped: bool = False,
    window: Tuple[int, int] | None = None,
):
    """Drop-in replacement for ops/tsdf_block.integrate_blocks.

    PRECONDITION (mm quantization): ``depth`` must be millimeter-
    quantized float meters, i.e. ``depth == round(depth*1000) * 0.001f``
    exactly — true for everything the product pipeline produces
    (ops/depth.depth_to_meters scales u16 mm by 0.001f).  The kernel
    reconstructs mm byte planes via ``round(depth*1000)``; a caller
    passing arbitrarily-scaled float meters gets a silent ~0.5 mm
    re-quantization and diverges from the XLA path instead of matching
    it bit-for-bit.

    With ``return_blocks`` also returns the fused ``[V, B, B*B]``
    (tsdf, weight) working-set tensors so downstream consumers (splat)
    skip their own pool gather.  With ``return_skipped`` additionally
    returns the number of voxels the aligned-window guard silently
    skipped this frame (must be 0 on in-design configurations; asserted
    at VGA in tests/test_pallas_integrate.py).  ``window`` overrides the
    (win_h, win_w) defaults — used by tests to force the guard to fire.
    """
    slots, coords, mask = vis
    bsz = bm_cfg.block_size
    cap = m.capacity
    h, w = depth.shape
    V = slots.shape[0]
    G = _BLOCKS_PER_STEP
    while V % G != 0:
        G //= 2

    T_cw = se3_inverse(T_wc)
    blk_t, blk_w = gather_visible_blocks(m, vis)
    dtype = m.tsdf.dtype
    base_h, base_w = window if window is not None else (_WIN_H, _WIN_W)
    # Window origins are promised to Mosaic as aligned (pl.multiple_of:
    # u0 to the 128-lane tile, v0 to the bf16 16-SUBLANE tile); their
    # clip bounds w - win_w / h - win_h must therefore be multiples of
    # the same alignment (or zero), or boundary blocks get a misaligned
    # origin and the compiled kernel reads a garbled window — caught on
    # 320-wide images (u bound 64) and at VGA (v0 = 8 mod 16 slices of
    # the bf16 depth planes cost 1.5x trajectory ATE, silently).  Widen
    # the window until the bound aligns.
    win_h = min(base_h, h)
    if (h - win_h) % 16 != 0:
        win_h = h - 16 * ((h - win_h) // 16)
    win_w = min(base_w, w)
    if (w - win_w) % 128 != 0:
        win_w = w - 128 * ((w - win_w) // 128)
    uv0 = _window_origins(
        coords, cam, tsdf_cfg, bsz * tsdf_cfg.voxel_size,
        win_h, win_w, h, w, T_cw,
    )
    code, pz, n_skipped = _project_voxels(
        coords, mask, cam, tsdf_cfg, bsz, T_cw, uv0, win_h, win_w, h, w
    )

    # Exact bf16 byte planes of the u16 millimeter depth (see kernel
    # doc): mm recovers exactly from the f32 meters the XLA path carries
    # because meters = mm * 0.001f there (ops/depth.depth_to_meters).
    mm = jnp.round(depth * 1000.0)
    depth_hi = jnp.floor(mm / 256.0).astype(jnp.bfloat16)
    depth_lo = (mm - jnp.floor(mm / 256.0) * 256.0).astype(jnp.bfloat16)

    blk = (G, bsz, bsz * bsz)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(V // G,),
        in_specs=[
            pl.BlockSpec(blk, lambda i, uv: (i, 0, 0)),   # code
            pl.BlockSpec(memory_space=pltpu.VMEM),        # depth_hi
            pl.BlockSpec(memory_space=pltpu.VMEM),        # depth_lo
        ],
        out_specs=[
            pl.BlockSpec(blk, lambda i, uv: (i, 0, 0)),
        ],
    )

    kernel = functools.partial(
        _kernel, bsz=bsz, win_h=win_h, win_w=win_w,
    )
    (d_sel,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(code.shape, jnp.float32),
        ),
        interpret=interpret,
    )(uv0, code, depth_hi, depth_lo)

    # The FUSION arithmetic runs in XLA with the very ops the reference
    # path uses (ops/tsdf_block.integrate_blocks) — the kernel's job is
    # ONLY the gatherless depth select.  This is what makes the Pallas
    # and XLA integrates agree to the BIT, divisions included: Mosaic's
    # divide is a reciprocal approximation ~1 ulp off XLA's, and 1-ulp
    # pool differences measurably perturb the frame-to-model feedback
    # loop over a trajectory (the discrete branches in association and
    # surfel selection amplify them).
    from topfusion_tpu.ops.blockmap import (
        decode_tsdf,
        decode_weight,
        encode_tsdf,
        encode_weight,
    )

    mu = tsdf_cfg.trunc_dist
    tsdf_blk = decode_tsdf(blk_t)
    w_blk = decode_weight(blk_w)
    valid = code >= 0
    eta = d_sel - pz
    update = valid & (d_sel > 0.0) & (eta >= -mu)
    if tsdf_cfg.stop_integrating_at_max_weight:
        update = update & (w_blk < tsdf_cfg.max_weight)
    new_f = jnp.maximum(jnp.minimum(1.0, eta / mu), -1.0)
    fused = (tsdf_blk * w_blk + new_f) / (w_blk + 1.0)
    w_new = jnp.minimum(w_blk + 1.0, tsdf_cfg.max_weight)
    fused_t = encode_tsdf(jnp.where(update, fused, tsdf_blk), dtype)
    fused_w = encode_weight(jnp.where(update, w_new, w_blk), dtype)

    # One row-scatter back; padded entries land on the sacrificial row.
    shape3 = (cap + 1, bsz, bsz * bsz)
    scatter_slots = jnp.where(mask, slots, cap)
    m = m._replace(
        tsdf=m.tsdf.reshape(shape3)
        .at[scatter_slots].set(fused_t)
        .reshape(m.tsdf.shape),
        weight=m.weight.reshape(shape3)
        .at[scatter_slots].set(fused_w)
        .reshape(m.weight.shape),
    )
    n_vis = jnp.sum(mask.astype(jnp.int32))
    out = (m, n_vis)
    if return_blocks:
        out = out + ((fused_t, fused_w),)
    if return_skipped:
        out = out + (n_skipped,)
    return out
