"""Streaming (pipelined) fusion: tracking and integration on DIFFERENT
devices, overlapped across frames.

BASELINE.md config 5 names "streaming integration"; SURVEY.md section
2.2 maps the reference's (nonexistent) pipeline parallelism to a
frame-pipeline across chips.  This module implements the 2-stage
pipeline the TPU way — one SPMD program whose per-device branch is
selected at runtime from the mesh coordinate (``lax.cond`` on
``axis_index``: true MPMD, each device executes only its stage), with
the pipeline registers exchanged by ``lax.ppermute`` each step:

    stage 0 (device 0), step t:  preprocess depth_t; ICP against the
        model maps splatted from frame t-2 (received last step) ->
        pose_t.  Sends (pose_t, raw_t) forward.
    stage 1 (device 1), step t:  allocate + integrate + splat frame
        t-1 at pose_{t-1} (received last step).  Sends the model maps
        back.

Steady-state throughput is max(stage0, stage1) instead of their sum —
with the measured v5e stage times (docs/PERFORMANCE.md: frontend+ICP
~15 ms, map side ~26 ms) a projected ~1.3x over the fused single-chip
step, bounded by the map stage.  The model maps lag the tracked frame
by TWO frames instead of one; with the association projected into the
register's splat pose (see stage_track) the extra lag is nearly free:
measured ATE parity (0.98x) with the sequential pipeline on the orbit
scenario (tests/test_stream_pipeline.py asserts <= 1.25x).

Trade-offs (documented, not hidden): the shard_map program is uniform,
so both devices carry the full BlockState — stage 0's map copy is dead
weight (combine with map sharding to reclaim it: stage-1 devices
sub-shard the map, future work).  Tracking-failure resets are not
supported in the streaming demo (the reset decision would have to travel
back one step); it targets the steady-state throughput scenario.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from topfusion_tpu.config import PipelineConfig
from topfusion_tpu.models.block_pipeline import BlockPipeline, BlockState
from topfusion_tpu.ops.depth import preprocess_depth
from topfusion_tpu.ops.normals import build_maps_pyramid, resize_points_normals
from topfusion_tpu.ops.icp import icp_track
from topfusion_tpu.ops.splat import splat_model_maps
from topfusion_tpu.ops.tsdf_block import (
    allocate_from_depth,
    visible_blocks,
    integrate_blocks,
)

AXIS = "pipe"


class StreamRegister(NamedTuple):
    """Pipeline register exchanged between the stages every step."""

    pose: jnp.ndarray                     # [4, 4] stage0 -> stage1
    raw: jnp.ndarray                      # [H, W] meters, stage0 -> stage1
    maps_p: Tuple[jnp.ndarray, ...]       # model points pyr, stage1 -> stage0
    maps_n: Tuple[jnp.ndarray, ...]       # model normals pyr, stage1 -> stage0
    valid: jnp.ndarray                    # () bool: register carries a frame


def make_pipe_mesh(n: int = 2, axis: str = AXIS) -> Mesh:
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


class StreamBlockPipeline:
    """2-stage streaming wrapper around the block pipeline's ops."""

    def __init__(self, cfg: PipelineConfig, mesh: Mesh, axis: str = AXIS):
        assert mesh.shape[axis] == 2, "streaming demo is a 2-stage pipeline"
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self._seq = BlockPipeline(cfg)  # for state construction

        def stacked(spec_leaf):
            return NamedSharding(mesh, P(axis))

        self._spec = P(axis)
        self.run = jax.jit(
            jax.shard_map(
                self._run_local,
                mesh=mesh,
                in_specs=(P(axis), P(axis), P()),
                out_specs=(P(axis), P(axis), P(axis)),
                check_vma=False,
            )
        )

    # ------------------------------------------------------------------
    def init(self) -> Tuple[BlockState, StreamRegister]:
        """Stacked per-stage state ([2, ...] leading dim, sharded over the
        pipe axis) + an empty register."""
        cfg = self.cfg
        cam = cfg.camera
        s0 = self._seq.init()

        def stack2(x):
            return jnp.stack([x, x])

        state2 = jax.tree.map(stack2, s0)
        reg = StreamRegister(
            pose=jnp.eye(4, dtype=jnp.float32),
            raw=jnp.zeros((cam.height, cam.width), jnp.float32),
            maps_p=tuple(s0.model_points),
            maps_n=tuple(s0.model_normals),
            valid=jnp.asarray(False),
        )
        reg2 = jax.tree.map(stack2, reg)
        sh = NamedSharding(self.mesh, P(self.axis))
        put = lambda t: jax.tree.map(
            lambda x: jax.device_put(x, sh), t
        )
        return put(state2), put(reg2)

    # ------------------------------------------------------------------
    def _run_local(self, state, reg, depths):
        """Device-local: scan the 2-stage step over the chunk.  ``state``
        and ``reg`` arrive with a leading length-1 shard dim."""
        squeeze = lambda t: jax.tree.map(lambda x: x[0], t)
        expand = lambda t: jax.tree.map(lambda x: x[None], t)
        state = squeeze(state)
        reg = squeeze(reg)

        def body(carry, depth_mm):
            st, rg = carry
            st, rg, pose = self._step_local(st, rg, depth_mm)
            return (st, rg), pose

        (state, reg), poses = lax.scan(body, (state, reg), depths)
        return expand(state), expand(reg), poses[None]

    # ------------------------------------------------------------------
    def _step_local(self, state: BlockState, reg: StreamRegister, depth_mm):
        cfg = self.cfg
        cam = cfg.camera
        sid = lax.axis_index(self.axis)

        def stage_track(args):
            st, rg = args
            raw, pyr = preprocess_depth(depth_mm, cfg.preproc)
            cp, cn = build_maps_pyramid(cam, pyr)
            # Model maps from the register (frame t-2); pipeline fill
            # (first two frames) tracks at the carried pose.
            bootstrap = st.frame < 2
            # T_model = the pose the register's maps were SPLATTED from
            # (rg.pose, frame t-2) — not this stage's own last pose
            # (frame t-1): projective association projects into the
            # camera that rendered the model image, and in the streaming
            # topology that camera lags one frame further than the
            # tracker's (sequential pipelines pass the same pose twice
            # because there the two coincide).
            T_model = jnp.where(rg.valid, rg.pose, st.T_wc)
            icp = icp_track(
                cam, cfg.icp, st.T_wc, T_model,
                cp, cn, list(rg.maps_p), list(rg.maps_n),
            )
            T_new = jnp.where(bootstrap | ~icp.ok, st.T_wc, icp.T_wc)
            st2 = st._replace(T_wc=T_new, frame=st.frame + 1)
            out = StreamRegister(
                pose=T_new, raw=raw, maps_p=rg.maps_p, maps_n=rg.maps_n,
                valid=jnp.asarray(True),
            )
            return st2, out

        def stage_map(args):
            st, rg = args
            m = st.block_map()
            raw_eff = jnp.where(rg.valid, rg.raw, 0.0)
            T_int = rg.pose
            m, _ = allocate_from_depth(
                m, cam, cfg.tsdf, cfg.blockmap, T_int, raw_eff
            )
            vis = visible_blocks(m, cam, cfg.tsdf, cfg.blockmap, T_int)
            m, _ = integrate_blocks(
                m, cam, cfg.tsdf, cfg.blockmap, T_int, raw_eff, vis
            )
            rc = splat_model_maps(
                m, cam, cfg.tsdf, cfg.blockmap, T_int, vis,
                surfels_per_block=cfg.raycast.surfels_per_block,
                dilate_passes=cfg.raycast.dilate_passes,
            )
            mp = [rc.points]
            mn = [rc.normals]
            for _ in range(cfg.preproc.pyramid_levels - 1):
                p, n = lax.optimization_barrier(
                    resize_points_normals(mp[-1], mn[-1])
                )
                mp.append(p)
                mn.append(n)
            st2 = BlockPipeline.write_map(st, m)._replace(
                frame=st.frame + 1,
                model_points=tuple(mp),
                model_normals=tuple(mn),
            )
            out = StreamRegister(
                pose=rg.pose, raw=rg.raw,
                maps_p=tuple(mp), maps_n=tuple(mn),
                valid=rg.valid,
            )
            return st2, out

        state, out_reg = lax.cond(
            sid == 0, stage_track, stage_map, (state, reg)
        )
        # Exchange registers: 0 -> 1 (pose+raw), 1 -> 0 (maps).
        perm = [(0, 1), (1, 0)]
        reg_next = jax.tree.map(
            lambda x: lax.ppermute(x, self.axis, perm), out_reg
        )
        return state, reg_next, state.T_wc


def run_stream(cfg: PipelineConfig, depths, mesh: Mesh | None = None):
    """Convenience driver: run the chunk through the 2-stage pipeline and
    return the tracked pose per frame (numpy [N, 4, 4], from stage 0)."""
    mesh = mesh or make_pipe_mesh()
    pipe = StreamBlockPipeline(cfg, mesh)
    state, reg = pipe.init()
    state, reg, poses = pipe.run(state, reg, jnp.asarray(depths))
    return np.asarray(poses[0])
