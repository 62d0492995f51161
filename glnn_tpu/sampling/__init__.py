from glnn_tpu.sampling.sampler import (
    SampledBlocks,
    frontier_caps,
    sample_blocks,
)

__all__ = ["SampledBlocks", "frontier_caps", "sample_blocks"]
