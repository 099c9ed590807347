from topfusion_tpu.models.pipeline import DensePipeline, DenseState
from topfusion_tpu.models.block_pipeline import BlockPipeline, BlockState

__all__ = ["DensePipeline", "DenseState", "BlockPipeline", "BlockState"]
