#!/usr/bin/env python
"""Offline reconstruction demo: sequence in, trajectory + mesh + video out.

The TPU-native replacement for the reference's interactive demo app
(reference: apps/demo.cpp — OpenCV windows, hard-coded Windows frame paths
at demo.cpp:91-97).  Runs a TUM/ICL sequence directory or a synthetic
analytic scene through the SLAM system and writes:

  out_dir/trajectory_odom.txt     TUM-format odometry trajectory
  out_dir/trajectory_opt.txt      pose-graph-optimized trajectory
  out_dir/state.npz               map + pose checkpoint
  out_dir/cloud.ply               extracted surface point cloud
  out_dir/metrics.json{l}         per-frame + summary metrics
  out_dir/render_*.png            rendered raycast views (every N frames)

Usage:
  python apps/run_fusion.py --synthetic 30 --out /tmp/run
  python apps/run_fusion.py --sequence /data/rgbd_dataset_freiburg1_desk \
      --out /tmp/fr1desk --set tsdf.voxel_size=0.005 --render-every 30
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sequence", help="TUM/ICL sequence directory")
    ap.add_argument("--synthetic", type=int, metavar="N",
                    help="run N synthetic frames instead of a dataset")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--config", help="YAML/JSON config file")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    help="dotted config override, e.g. tsdf.voxel_size=0.01")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--render-every", type=int, default=0,
                    help="save a rendered view every N frames")
    ap.add_argument("--no-posegraph", action="store_true",
                    help="odometry only (no keyframes/loop closure)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from topfusion_tpu.config import PipelineConfig, CameraConfig
    from topfusion_tpu.utils.config_io import (
        apply_overrides,
        load_config,
        save_config,
    )
    from topfusion_tpu.utils.metrics import MetricsLogger
    from topfusion_tpu.utils.checkpoint import save_run
    from topfusion_tpu.io.trajectory import ate_rmse

    os.makedirs(args.out, exist_ok=True)

    cfg = load_config(args.config) if args.config else PipelineConfig()

    # Frame source.
    gt_poses = None
    timestamps = None
    if args.synthetic:
        from topfusion_tpu.io.synthetic import SyntheticScene, orbit_trajectory
        import dataclasses

        cam = CameraConfig(width=320, height=240, fx=250.0, fy=250.0,
                           cx=160.0, cy=120.0)
        cfg = dataclasses.replace(cfg, camera=cam)
        scene = SyntheticScene()
        gt_poses = orbit_trajectory(args.synthetic, max_angle_deg=5.0,
                                    max_shift=0.05, seed=2)

        def frames():
            for T in gt_poses:
                yield scene.render_depth_mm(cam, jnp.asarray(T, jnp.float32))

        n_total = args.synthetic
    elif args.sequence:
        import dataclasses

        from topfusion_tpu.io.datasets import open_sequence

        seq = open_sequence(args.sequence)
        cfg = dataclasses.replace(cfg, camera=seq.camera)
        timestamps = []
        if seq.groundtruth is not None:
            gt_poses = []

        def frames():
            for fr in seq:
                timestamps.append(fr.timestamp)
                if gt_poses is not None:
                    gt_poses.append(seq.gt_pose_at(fr.timestamp))
                yield jnp.asarray(fr.depth_mm)

        n_total = len(seq)
    else:
        ap.error("need --sequence or --synthetic")

    cfg = apply_overrides(cfg, args.overrides)
    save_config(os.path.join(args.out, "config.yaml"), cfg)

    from topfusion_tpu.models.slam import SlamSystem

    slam = SlamSystem(cfg)
    metrics = MetricsLogger(os.path.join(args.out, "metrics.jsonl"))

    print(f"running {n_total} frames...")
    for i, depth in enumerate(frames()):
        if args.max_frames and i >= args.max_frames:
            break
        info = slam.process_frame(depth)
        metrics.log_frame(info)
        if args.render_every and i % args.render_every == 0:
            import imageio.v3 as iio

            img = np.asarray(slam.render())
            iio.imwrite(os.path.join(args.out, f"render_{i:05d}.png"), img)

    summary = metrics.summary()
    opt = slam.optimized_trajectory()
    if gt_poses is not None and all(g is not None for g in gt_poses or []):
        gt_list = [np.asarray(g) for g in gt_poses[: len(slam.odom_poses)]]
        summary["ate_odom_m"] = ate_rmse(slam.odom_poses, gt_list)
        summary["ate_opt_m"] = ate_rmse(opt, gt_list)
        print(f"ATE odometry: {summary['ate_odom_m']*1000:.1f} mm, "
              f"optimized: {summary['ate_opt_m']*1000:.1f} mm")
    summary["loops_closed"] = slam.loops_closed
    print(f"summary: {summary}")

    # Surface cloud export.
    from topfusion_tpu.ops.pointcloud import extract_pointcloud_blocks, save_ply

    pc = extract_pointcloud_blocks(
        self_map := slam.state.block_map(), cfg.tsdf, cfg.blockmap
    )
    n_pts = save_ply(os.path.join(args.out, "cloud.ply"), pc)
    print(f"extracted {n_pts} surface points -> cloud.ply")

    save_run(
        args.out,
        slam.state,
        slam.odom_poses,
        opt,
        timestamps,
        metrics=summary,
    )
    metrics.close()
    print(f"outputs in {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
