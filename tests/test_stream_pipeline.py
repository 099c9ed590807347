"""Streaming 2-stage pipeline: tracking/integration overlapped across
devices (BASELINE.md config 5 "streaming integration").

Correctness contract: with the model maps lagging the tracked frame by
TWO frames (vs one in the sequential pipeline), tracking must still
hold and land within a small multiple of the sequential ATE on the
orbit scenario.  Throughput is a device-count property measured on
hardware (docs/PERFORMANCE.md); here the CPU mesh validates the MPMD
program (lax.cond on axis_index + ppermute registers) end-to-end.
"""

import jax.numpy as jnp
import numpy as np

from topfusion_tpu.config import tiny_test_config
from topfusion_tpu.io.synthetic import SyntheticScene, orbit_trajectory
from topfusion_tpu.io.trajectory import ate_rmse
from topfusion_tpu.models.block_pipeline import BlockPipeline
from topfusion_tpu.parallel.stream_pipeline import (
    make_pipe_mesh,
    run_stream,
)


def test_stream_matches_sequential_within_lag_tolerance():
    cfg = tiny_test_config()
    scene = SyntheticScene()
    gt = orbit_trajectory(10, max_angle_deg=3.0, max_shift=0.03, seed=11)
    depths = jnp.stack(
        [
            scene.render_depth_mm(cfg.camera, jnp.asarray(T, jnp.float32))
            for T in gt
        ]
    )

    # Sequential reference.
    pipe = BlockPipeline(cfg)
    st = pipe.init()
    seq = []
    for d in depths:
        st, aux = pipe.step(st, d)
        assert bool(aux.ok)
        seq.append(np.asarray(st.T_wc))

    # Streaming: one dispatch for the whole chunk.
    stream = run_stream(cfg, depths, make_pipe_mesh(2))

    gt_np = [np.asarray(T) for T in gt]
    ate_seq = ate_rmse(seq, gt_np, align=False)
    # Stage 0's pose stream: frame i tracked against maps of frame i-2.
    ate_stream = ate_rmse(list(stream), gt_np, align=False)
    assert np.isfinite(stream).all()
    # With projective association projecting into the register's splat
    # pose (the camera that actually rendered the maps), the extra model
    # lag costs almost nothing: measured 10.65 mm stream vs 10.89 mm
    # sequential on this scenario.  (Before that fix the tracker
    # projected with its own one-frame-newer pose and this bound had to
    # be 2.5x.)
    assert ate_stream <= 1.25 * ate_seq + 2e-3, (
        f"stream ATE {ate_stream*1000:.2f} mm vs seq {ate_seq*1000:.2f} mm"
    )
    # And it must actually track (not drift unbounded).
    assert ate_stream < 3 * cfg.tsdf.voxel_size
