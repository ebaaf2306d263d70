"""TPU-native point-cloud ops: the replacement for torch_cluster / torch_scatter /
torch_geometric CUDA kernels (see SURVEY.md §2.3).

All ops are static-shape, jit/vmap-friendly, differentiable where meaningful,
and formulated as dense gathers + masked reductions that XLA tiles onto the
MXU/VPU. Pallas fast paths live in `pallas_kernels.py`.
"""

from stratanet2_tpu.ops.fps import farthest_point_sampling
from stratanet2_tpu.ops.ballquery import ball_query
from stratanet2_tpu.ops.knn import knn_interpolate
from stratanet2_tpu.ops.projection import (
    plotwise_coverages,
    raster_projection,
    batched_raster_projection,
)

__all__ = [
    "farthest_point_sampling",
    "ball_query",
    "knn_interpolate",
    "plotwise_coverages",
    "raster_projection",
    "batched_raster_projection",
]
