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

        self.state: BlockState = self.pipe.init()
        self.graph: PoseGraph = make_pose_graph(pgc, self.cam_l)
        self.odom_poses: List[np.ndarray] = []
        self.kf_for_frame: List[int] = []   # index of latest kf per frame
        self.kf_odom_poses: List[np.ndarray] = []  # kf pose at insert time
        self.loops_closed: int = 0
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
            self.graph, found = self._detect(self.graph)
            if bool(found):
                self.graph, _ = self._optimize(self.graph)
                self.loops_closed += 1
                info["loop"] = True

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
