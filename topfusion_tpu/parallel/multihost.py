"""Multi-host runtime: initialization + scaling measurement harness.

The reference is a single process on a single GPU with zero inter-process
communication (SURVEY.md section 5.8).  On TPU pods the runtime story is
``jax.distributed.initialize`` + a global mesh: collectives ride ICI within
a slice and DCN across slices, and XLA inserts them from sharding
annotations — there is no hand-written transport to port.

This module wraps the bring-up and provides the scaling-efficiency
measurement used by BASELINE.md config 5 (fused frames/s at 1 chip vs. a
multi-chip mesh).  Multi-host execution is validated in CI via
``--xla_force_host_platform_device_count`` single-process simulation
(tests/test_parallel.py) and the driver's ``dryrun_multichip`` hook.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime (no-op when single-process).

    On Cloud TPU pods all arguments are auto-detected from the metadata
    service; pass them explicitly for loopback/multi-process CPU testing.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def measure_scaling(cfg, n_frames: int = 8, device_counts=(1, None)) -> dict:
    """Fused frames/s of the sharded dense pipeline at different mesh sizes.

    Returns {n_devices: fps, ..., "efficiency": fps_N / (N * fps_1)}.
    """
    from topfusion_tpu.io.synthetic import SyntheticScene, orbit_trajectory
    from topfusion_tpu.parallel.sharded_pipeline import (
        make_mesh,
        make_sharded_pipeline,
    )

    scene = SyntheticScene()
    poses = orbit_trajectory(n_frames, max_angle_deg=3.0, max_shift=0.03)
    frames = [
        scene.render_depth_mm(cfg.camera, jnp.asarray(T, jnp.float32))
        for T in poses
    ]

    results: dict = {}
    counts = [
        c if c is not None else len(jax.devices()) for c in device_counts
    ]
    for n_dev in counts:
        mesh = make_mesh(n_dev)
        init, step = make_sharded_pipeline(cfg, mesh)
        state = init()
        state, _ = step(state, frames[0])
        state, _ = step(state, frames[1])
        np.asarray(state.T_wc[0, 0])  # completion fence
        t0 = time.perf_counter()
        n = 0
        for _ in range(2):
            for f in frames:
                state, _ = step(state, f)
                n += 1
        np.asarray(state.T_wc[0, 0])
        results[n_dev] = n / (time.perf_counter() - t0)

    if len(counts) >= 2 and counts[0] == 1:
        n_max = max(counts)
        results["efficiency"] = results[n_max] / (n_max * results[1])
    return results


def measure_scaling_block(
    cfg,
    n_frames: int = 6,
    device_counts=(1, 2, 4, 8),
    mode: str = "weak",
) -> dict:
    """Fused frames/s of the SHARDED BLOCK pipeline at different mesh sizes
    (BASELINE.md configs 4-5; the >=0.8 efficiency north star).

    ``mode="weak"`` holds the per-device working set constant (the global
    map capacity and visible budget grow with the mesh — the multi-room
    sweep story): efficiency = fps_N / fps_1.
    ``mode="strong"`` holds the global problem fixed:
    efficiency = fps_N / (N * fps_1).

    Returns {n_devices: fps, ..., "efficiency": float, "mode": mode}.
    """
    import dataclasses

    from topfusion_tpu.io.synthetic import SyntheticScene, orbit_trajectory
    from topfusion_tpu.parallel.block_sharded import (
        ShardedBlockPipeline,
        make_mesh,
    )

    scene = SyntheticScene()
    poses = orbit_trajectory(n_frames, max_angle_deg=3.0, max_shift=0.03)
    frames = [
        scene.render_depth_mm(cfg.camera, jnp.asarray(T, jnp.float32))
        for T in poses
    ]

    results: dict = {"mode": mode}
    counts = [
        c if c is not None else len(jax.devices()) for c in device_counts
    ]
    counts = [c for c in counts if c <= len(jax.devices())]
    for n_dev in counts:
        if mode == "weak":
            bm = cfg.blockmap
            run_cfg = dataclasses.replace(
                cfg,
                blockmap=dataclasses.replace(
                    bm,
                    capacity=bm.capacity * n_dev,
                    max_visible_blocks=bm.max_visible_blocks * n_dev,
                    max_new_blocks_per_frame=bm.max_new_blocks_per_frame
                    * n_dev,
                ),
            )
        else:
            run_cfg = cfg
        mesh = make_mesh(n_dev)
        pipe = ShardedBlockPipeline(run_cfg, mesh)
        state = pipe.init()
        state, _ = pipe.step(state, frames[0])
        state, _ = pipe.step(state, frames[1])
        np.asarray(state.T_wc[0, 0])  # completion fence
        t0 = time.perf_counter()
        n = 0
        for _ in range(2):
            for f in frames:
                state, _ = pipe.step(state, f)
                n += 1
        np.asarray(state.T_wc[0, 0])
        results[n_dev] = n / (time.perf_counter() - t0)

    if len(counts) >= 2 and counts[0] == 1:
        n_max = max(counts)
        if mode == "weak":
            results["efficiency"] = results[n_max] / results[1]
        else:
            results["efficiency"] = results[n_max] / (n_max * results[1])
    return results
