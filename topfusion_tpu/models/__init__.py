from topfusion_tpu.models.pipeline import DensePipeline, DenseState

__all__ = ["DensePipeline", "DenseState"]
