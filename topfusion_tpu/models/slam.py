"""Full SLAM system: block-sparse fusion odometry + keyframe pose graph.

Orchestrates the jitted pieces (fusion step, keyframe insertion, loop
detection, graph optimization) with light host-side control flow that runs
once per keyframe, not per frame.  The live fusion pose stays consistent
with the TSDF map (frame-to-model ICP needs the map and pose in the same
frame); the POSE GRAPH maintains a separately optimized trajectory, which
is what ATE evaluation and export consume — odometry vs. optimized
trajectory, the standard SLAM split.  (The reference has neither keyframes
nor any trajectory correction — SURVEY.md section 0.)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from topfusion_tpu.config import PipelineConfig
from topfusion_tpu.geometry.se3 import se3_inverse
from topfusion_tpu.models.block_pipeline import BlockPipeline, BlockState
from topfusion_tpu.models.posegraph import (
    PoseGraph,
    add_keyframe,
    detect_loop,
    make_pose_graph,
    optimize,
)
from topfusion_tpu.ops.depth import preprocess_depth
from topfusion_tpu.ops.normals import compute_points_normals


class SlamSystem:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.pipe = BlockPipeline(cfg)
        pgc = cfg.posegraph
        self.cam_l = cfg.camera.at_level(pgc.keyframe_level)

        self._kf_maps = jax.jit(self._kf_maps_impl)
        self._add_kf = jax.jit(add_keyframe)
        self._detect = jax.jit(
            lambda pg: detect_loop(pg, self.cam_l, pgc, cfg.icp)
        )
        self._optimize = jax.jit(lambda pg: optimize(pg, pgc))
        self._fuse_at = jax.jit(self._fuse_at_impl)
        self._refresh_maps = jax.jit(self._refresh_maps_impl)

        self.state: BlockState = self.pipe.init()
        self.graph: PoseGraph = make_pose_graph(pgc, self.cam_l)
        self.odom_poses: List[np.ndarray] = []
        self.kf_for_frame: List[int] = []   # index of latest kf per frame
        self.kf_odom_poses: List[np.ndarray] = []  # kf pose at insert time
        self.kf_depths: List[np.ndarray] = []      # raw depth per keyframe
        self.loops_closed: int = 0
        self.reintegrations: int = 0
        self.frame_idx: int = 0

    # ------------------------------------------------------------------
    def _kf_maps_impl(self, depth_mm):
        raw, pyr = preprocess_depth(depth_mm, self.cfg.preproc)
        d = pyr[0]
        lvl = self.cfg.posegraph.keyframe_level
        for _ in range(lvl):
            from topfusion_tpu.ops.depth import downsample_depth

            d = downsample_depth(d, self.cfg.preproc.pyramid_sigma_depth)
        return compute_points_normals(self.cam_l, d)

    # ------------------------------------------------------------------
    def _fuse_at_impl(self, state: BlockState, depth_mm, T_wc):
        """Fuse one depth image at a FIXED pose (no tracking) — the
        primitive of post-loop map re-integration."""
        from topfusion_tpu.ops.tsdf_block import (
            allocate_from_depth,
            integrate_blocks,
            visible_blocks,
        )

        cfg = self.cfg
        raw, _ = preprocess_depth(depth_mm, cfg.preproc)
        m = state.block_map()
        m, _ = allocate_from_depth(
            m, cfg.camera, cfg.tsdf, cfg.blockmap, T_wc, raw
        )
        vis = visible_blocks(m, cfg.camera, cfg.tsdf, cfg.blockmap, T_wc)
        m, _ = integrate_blocks(
            m, cfg.camera, cfg.tsdf, cfg.blockmap, T_wc, raw, vis
        )
        return state._replace(
            bucket_keys=m.bucket_keys,
            bucket_slots=m.bucket_slots,
            block_coords=m.block_coords,
            tsdf=m.tsdf,
            weight=m.weight,
            num_blocks=m.num_blocks,
            color=m.color,
        )

    # ------------------------------------------------------------------
    def _refresh_maps_impl(self, state: BlockState, T_wc):
        """Regenerate the ICP model-map pyramid from the (rebuilt) map at
        the corrected live pose, so frame-to-model tracking continues
        seamlessly in the optimized frame."""
        from topfusion_tpu.ops.normals import resize_points_normals
        from topfusion_tpu.ops.splat import splat_model_maps
        from topfusion_tpu.ops.tsdf_block import visible_blocks

        cfg = self.cfg
        m = state.block_map()
        vis = visible_blocks(m, cfg.camera, cfg.tsdf, cfg.blockmap, T_wc)
        rc = splat_model_maps(m, cfg.camera, cfg.tsdf, cfg.blockmap, T_wc, vis)
        mp = [rc.points]
        mn = [rc.normals]
        for _ in range(cfg.preproc.pyramid_levels - 1):
            p, n = jax.lax.optimization_barrier(
                resize_points_normals(mp[-1], mn[-1])
            )
            mp.append(p)
            mn.append(n)
        return state._replace(
            T_wc=T_wc, model_points=tuple(mp), model_normals=tuple(mn)
        )

    # ------------------------------------------------------------------
    def _reintegrate_map(self) -> None:
        """Global re-integration after a loop closure: wipe the TSDF and
        re-fuse every stored keyframe depth at its OPTIMIZED pose, then
        re-anchor the live pose + model maps into the corrected frame.

        The reference permanently diverges map from any correction (it has
        none to apply); this is the InfiniTAM-v3-style repair (PAPERS.md).
        Cost is one fusion pass per keyframe, paid only on loop closures
        whose correction exceeds ``min_map_correction``.
        """
        from topfusion_tpu.ops.blockmap import reset_block_map

        n_kf = int(self.graph.num_kf)
        kf_opt = np.asarray(self.graph.kf_poses)
        m_clean = reset_block_map(self.state.block_map())
        state = self.state._replace(
            bucket_keys=m_clean.bucket_keys,
            bucket_slots=m_clean.bucket_slots,
            block_coords=m_clean.block_coords,
            tsdf=m_clean.tsdf,
            weight=m_clean.weight,
            num_blocks=m_clean.num_blocks,
            color=m_clean.color,
        )
        for k in range(n_kf):
            state = self._fuse_at(
                state,
                jnp.asarray(self.kf_depths[k]),
                jnp.asarray(kf_opt[k], jnp.float32),
            )
        # Live pose re-anchors through the newest keyframe's correction.
        corr = kf_opt[n_kf - 1] @ np.linalg.inv(self.kf_odom_poses[-1])
        T_live = jnp.asarray(
            (corr @ np.asarray(self.state.T_wc)).astype(np.float32)
        )
        self.state = self._refresh_maps(state, T_live)
        # Future odometry lives in the corrected frame: the newest
        # keyframe's anchor becomes its optimized pose, so the per-frame
        # export correction for subsequent frames is ~identity.
        self.kf_odom_poses[-1] = kf_opt[n_kf - 1]
        self.reintegrations += 1

    # ------------------------------------------------------------------
    def process_frame(self, depth_mm) -> dict:
        cfg = self.cfg
        self.state, aux = self.pipe.step(self.state, depth_mm)
        T = np.asarray(self.state.T_wc)
        self.odom_poses.append(T)

        info = {
            "frame": self.frame_idx,
            "ok": bool(aux.ok),
            "reset": bool(aux.was_reset),
            "inliers": int(aux.num_inliers),
            "blocks": int(aux.num_blocks),
            "loop": False,
        }

        is_kf = (
            self.frame_idx % cfg.posegraph.keyframe_every == 0
            and not info["reset"]
        )
        if is_kf:
            p, n = self._kf_maps(depth_mm)
            self.graph = self._add_kf(
                self.graph,
                self.state.T_wc,
                p,
                n,
                jnp.asarray(self.frame_idx, jnp.int32),
                jnp.asarray(True),
            )
            self.kf_odom_poses.append(T)
            self.kf_depths.append(np.asarray(depth_mm))
            self.graph, found = self._detect(self.graph)
            if bool(found):
                self.graph, _ = self._optimize(self.graph)
                self.loops_closed += 1
                info["loop"] = True
                # Map correction: if the newest keyframe moved, re-fuse
                # the map at the optimized poses and re-anchor the live
                # pose (cfg.posegraph.map_correction).
                n_kf = int(self.graph.num_kf)
                moved = float(
                    np.linalg.norm(
                        np.asarray(self.graph.kf_poses[n_kf - 1][:3, 3])
                        - self.kf_odom_poses[-1][:3, 3]
                    )
                )
                if (
                    cfg.posegraph.map_correction == "reintegrate"
                    and moved > cfg.posegraph.min_map_correction
                ):
                    self._reintegrate_map()
                    # This frame's pose jumped into the corrected frame;
                    # export it there too.
                    self.odom_poses[-1] = np.asarray(self.state.T_wc)
                    info["reintegrated"] = True

        self.kf_for_frame.append(max(len(self.kf_odom_poses) - 1, 0))
        self.frame_idx += 1
        return info

    # ------------------------------------------------------------------
    def optimized_trajectory(self) -> List[np.ndarray]:
        """Full-resolution trajectory with pose-graph corrections applied:
        each frame's odometry pose is re-anchored to its latest keyframe's
        optimized pose."""
        if not self.kf_odom_poses:
            return list(self.odom_poses)
        kf_opt = np.asarray(self.graph.kf_poses)
        out = []
        for f, T in enumerate(self.odom_poses):
            k = self.kf_for_frame[f]
            T_kf_odom = self.kf_odom_poses[k]
            correction = kf_opt[k] @ np.linalg.inv(T_kf_odom)
            out.append(correction @ T)
        return out

    def render(self):
        return self.pipe.render(self.state)
