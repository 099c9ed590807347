"""The composed flagship (parallel/sharded_slam.ShardedSlamSystem):
pose graph + loop closure + distributed BA + swap ON the sharded map,
one system (round-4 VERDICT next #1; BASELINE.md configs 4/5).

Acceptance pins:
  (a) an 8-device orbit-with-loop run matches the single-device
      SlamSystem: same keyframe/closure counts, trajectory agreement at
      psum-reordering noise scale, optimized ATE under the single-device
      bound;
  (b) the composed step is what __graft_entry__.dryrun_multichip
      compiles (dryrun smoke here);
  (c) a beyond-aggregate-capacity out-and-back with a LOOP CLOSURE and
      per-shard host swap stays at ATE parity with an uncapped run,
      zero alloc drops.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from topfusion_tpu.config import (
    BlockMapConfig,
    CameraConfig,
    ICPConfig,
    PipelineConfig,
    PoseGraphConfig,
    PreprocConfig,
    RaycastConfig,
    TSDFConfig,
)
from topfusion_tpu.geometry.se3 import se3_exp
from topfusion_tpu.io.synthetic import SyntheticScene, corridor_scene
from topfusion_tpu.io.trajectory import ate_rmse
from topfusion_tpu.models.slam import SlamSystem
from topfusion_tpu.parallel.block_sharded import make_mesh
from topfusion_tpu.parallel.sharded_slam import (
    ShardedSlamSystem,
    dryrun_sharded_slam,
)

N_DEV = 8


def make_cfg():
    # test_slam.make_cfg with capacities divisible by the mesh size.
    cam = CameraConfig(width=80, height=64, fx=60.0, fy=60.0, cx=40.0, cy=32.0)
    return PipelineConfig(
        camera=cam,
        preproc=PreprocConfig(bilateral_kernel_size=1),
        icp=ICPConfig(iters=(6, 4, 3)),
        tsdf=TSDFConfig(voxel_size=0.01, trunc_dist=0.04),
        blockmap=BlockMapConfig(
            capacity=1 << 13,
            max_new_blocks_per_frame=2048,
            max_visible_blocks=1 << 12,
            alloc_pixel_stride=1,
        ),
        raycast=RaycastConfig(max_steps=160),
        posegraph=PoseGraphConfig(
            max_keyframes=16,
            max_edges=64,
            keyframe_every=3,
            loop_candidate_window=2,
            loop_max_dist=0.3,
            gn_iters=5,
        ),
    )


def out_and_back(n):
    poses = []
    for i in range(n):
        s = np.sin(np.pi * i / (n - 1))
        xi = np.array([0, 0.08 * s, 0, 0.10 * s, 0.02 * s, 0], np.float32)
        poses.append(np.asarray(se3_exp(jnp.asarray(xi))))
    return poses


def _run(slam, frames):
    for d in frames:
        info = slam.process_frame(d)
        assert info["ok"], f"tracking lost: {info}"
    return slam


def test_composed_matches_single_device_with_loop():
    cfg = make_cfg()
    scene = SyntheticScene()
    gt = out_and_back(15)
    frames = [
        scene.render_depth_mm(cfg.camera, jnp.asarray(T, jnp.float32))
        for T in gt
    ]

    single = _run(SlamSystem(cfg), frames)
    sharded = _run(ShardedSlamSystem(cfg, make_mesh(N_DEV)), frames)

    # Same pose-graph evolution: keyframes and closures agree exactly.
    assert int(sharded.graph.num_kf) == int(single.graph.num_kf) == 5
    assert single.loops_closed >= 1
    assert sharded.loops_closed == single.loops_closed
    assert int(np.asarray(sharded.graph.num_edges)) == int(
        np.asarray(single.graph.num_edges)
    )

    # Trajectories agree to psum-reordering noise (the sharded ICP sums
    # per-device Gram partials; float addition order differs).
    cross = ate_rmse(sharded.odom_poses, single.odom_poses, align=False)
    assert cross < 2e-3, f"sharded-vs-single odometry ATE {cross*1000:.2f} mm"

    gt_list = [np.asarray(g) for g in gt]
    opt_sh = ate_rmse(sharded.optimized_trajectory(), gt_list, align=False)
    assert opt_sh < 0.02
    # The sharded map really is partitioned: blocks live on >1 shard.
    per_shard = np.asarray(sharded.state.num_blocks)
    assert per_shard.shape == (N_DEV,)
    assert (per_shard > 0).sum() >= 2


def test_composed_dryrun_smoke():
    dryrun_sharded_slam(N_DEV)


def test_composed_beyond_capacity_with_loop_at_parity():
    """Sweep out a corridor past the aggregate pool capacity, come back
    (evicted territory re-enters, a loop closes), with the per-shard
    host swap attached — ATE parity with an uncapped composed run."""
    from topfusion_tpu.geometry.se3 import se3_exp as _se3exp
    from topfusion_tpu.io.synthetic import sweep_trajectory

    # The corridor-sweep operating point proven by test_swap's sharded
    # test (its default 7x7 bilateral is load-bearing on the return
    # leg), plus the pose-graph machinery.
    from topfusion_tpu.config import tiny_test_config

    base = tiny_test_config()
    cam = base.camera
    base = dataclasses.replace(
        base,
        tsdf=dataclasses.replace(base.tsdf, view_frustum_max=2.0),
        blockmap=dataclasses.replace(
            base.blockmap,
            capacity=1 << 14,
            max_new_blocks_per_frame=2048,
            max_visible_blocks=1 << 12,
        ),
        posegraph=PoseGraphConfig(
            max_keyframes=32,
            max_edges=128,
            keyframe_every=4,
            loop_candidate_window=2,
            loop_max_dist=0.5,
            gn_iters=5,
            # An out-and-back retrace closes a loop at nearly EVERY
            # return-leg keyframe; rebuilding the map for each (~10
            # keyframe-only reintegrations back to back) ghosts it and
            # kills tracking — the exact thrash min_map_correction
            # documents.  Here loop closures correct the EXPORTED
            # trajectory (the standard SLAM split); map rebuild under a
            # single closure is pinned by test_slam.py::
            # test_map_correction_after_loop.
            map_correction="none",
        ),
    )
    pitch = np.asarray(
        _se3exp(jnp.asarray([0.35, 0, 0, 0, 0, 0], jnp.float32))
    )
    scene = corridor_scene(length_m=10.0, box_every=0.3)
    # step 0.06 m/frame: the fastest motion iters=(4,3,2) tracks
    # reliably at this tiny camera (0.09 loses tracking mid-corridor);
    # 56 frames out = the test_swap sharded operating point (the mapped
    # corridor must exceed the capped aggregate pool while the per-frame
    # working set still fits it).
    fwd = [T @ pitch for T in sweep_trajectory(56, step_m=0.06)]
    gt = fwd + fwd[::-1][1:]
    frames = [
        scene.render_depth_mm(cam, jnp.asarray(T, jnp.float32)) for T in gt
    ]
    mesh = make_mesh(N_DEV)

    def run(cfg):
        from topfusion_tpu.models.host_cache import ShardedHostCache

        slam = ShardedSlamSystem(cfg, mesh)
        if slam.swap is not None:
            # Tuned batch sizes for the tiny per-shard pool (512 slots):
            # the default 1024-block evict batch is sized for the VGA
            # flagship pool.
            slam.swap = ShardedHostCache(
                slam.pipe, evict_batch=128, restore_batch=64
            )
        dropped = 0
        for d in frames:
            info = slam.process_frame(d)
            assert info["ok"], f"tracking lost: {info}"
            dropped += info["dropped"]
        ate = ate_rmse(slam.odom_poses, [np.asarray(g) for g in gt],
                       align=False)
        return slam, ate, dropped

    ref, ate_ref, _ = run(base)
    total_blocks = int(np.asarray(ref.state.num_blocks).sum())

    cap = 1 << 12  # aggregate; 512 slots/shard — below the scene size
    assert total_blocks > 1.2 * cap, (
        f"premise violated: scene has {total_blocks} <= 1.2 * {cap} blocks"
    )
    small = dataclasses.replace(
        base,
        blockmap=dataclasses.replace(
            base.blockmap, capacity=cap, max_visible_blocks=cap,
            max_new_blocks_per_frame=1024, out_of_core=True,
        ),
    )
    swp, ate_swap, dropped = run(small)

    assert dropped == 0, f"{dropped} blocks dropped despite swapping"
    assert swp.swap.n_host_blocks > 0
    assert ref.loops_closed >= 1, "out-and-back corridor must close a loop"
    assert swp.loops_closed >= 1
    live = int(np.asarray(swp.state.num_blocks).sum())
    assert live + swp.swap.n_host_blocks >= int(0.9 * total_blocks)
    assert ate_swap <= 1.2 * ate_ref + 2e-4, (
        f"swap ATE {ate_swap*1000:.2f} mm vs uncapped {ate_ref*1000:.2f} mm"
    )


def test_composed_checkpoint_resume_bit_exact(tmp_path):
    """Periodic checkpoint of the composed system (per-process map
    shards + replicated graph/buffers + host bookkeeping): a restored
    fresh system continues BIT-EXACTLY like the uninterrupted one —
    elastic recovery for the flagship (SURVEY.md 5.3-5.4)."""
    import dataclasses as _dc

    cfg = make_cfg()
    cfg = _dc.replace(
        cfg,
        posegraph=_dc.replace(cfg.posegraph, reint_ring=8),
    )
    scene = SyntheticScene()
    gt = out_and_back(12)
    frames = [
        scene.render_depth_mm(cfg.camera, jnp.asarray(T, jnp.float32))
        for T in gt
    ]
    mesh = make_mesh(N_DEV)
    ckpt = str(tmp_path / "composed")

    ref = ShardedSlamSystem(cfg, mesh)
    for d in frames[:6]:
        assert ref.process_frame(d)["ok"]
    ref.save_checkpoint(ckpt)
    for d in frames[6:]:
        assert ref.process_frame(d)["ok"]

    res = ShardedSlamSystem(cfg, mesh)
    res.restore_checkpoint(ckpt)
    assert res.frame_idx == 6
    for d in frames[6:]:
        assert res.process_frame(d)["ok"]

    np.testing.assert_array_equal(
        np.stack(res.odom_poses), np.stack(ref.odom_poses)
    )
    np.testing.assert_array_equal(
        np.asarray(res.graph.kf_poses), np.asarray(ref.graph.kf_poses)
    )
    assert res.loops_closed == ref.loops_closed
    assert int(np.asarray(res.state.num_blocks).sum()) == int(
        np.asarray(ref.state.num_blocks).sum()
    )


def test_chunk_executable_stable_across_signatures():
    """The chunk program must not RETRACE between warmup and the steady
    state, or after a loop-closure optimize/reintegrate: sharded chunk
    outputs carry committed mesh shardings that host-created warmup
    inputs do not, and before warmup replayed the steady-state + post-
    loop signatures the second real chunk recompiled (~40 s remote on
    the v5e — measured 2 fps composed runs).  Pin: the jit cache stops
    growing after warmup."""
    import dataclasses as _dc

    cfg = make_cfg()
    cfg = _dc.replace(
        cfg,
        posegraph=_dc.replace(cfg.posegraph, reint_ring=8,
                              min_map_correction=0.0),
    )
    scene = SyntheticScene()
    gt = out_and_back(15)
    frames = [
        scene.render_depth_mm(cfg.camera, jnp.asarray(T, jnp.float32))
        for T in gt
    ]
    slam = ShardedSlamSystem(cfg, make_mesh(N_DEV))
    slam.warmup(3)
    n_compiled = slam._chunk._cache_size()
    # Chunked run incl. a loop closure + reintegration (out-and-back,
    # every correction rebuilds) — every signature the loop can produce.
    for s in range(0, 15, 3):
        slam.process_chunk(jnp.stack(frames[s : s + 3]), do_kf=True)
    assert slam.loops_closed >= 1
    assert slam._chunk._cache_size() == n_compiled, (
        f"chunk retraced: {slam._chunk._cache_size()} vs {n_compiled} "
        f"compiled signatures after warmup"
    )
