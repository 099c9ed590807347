from topfusion_tpu.parallel.sharded_pipeline import (
    make_mesh,
    make_sharded_pipeline,
    dryrun_sharded_step,
)
from topfusion_tpu.parallel.block_sharded import ShardedBlockPipeline
from topfusion_tpu.parallel.sharded_slam import ShardedSlamSystem
from topfusion_tpu.parallel.dist_ba import optimize_distributed
from topfusion_tpu.parallel.multihost import initialize_multihost, measure_scaling

__all__ = [
    "make_mesh",
    "make_sharded_pipeline",
    "dryrun_sharded_step",
    "ShardedBlockPipeline",
    "ShardedSlamSystem",
    "optimize_distributed",
    "initialize_multihost",
    "measure_scaling",
]
