from stratanet2_tpu.models.pointnet2 import (
    PointNet2Params,
    init_pointnet2,
    pointnet2_forward,
    count_params,
)

__all__ = [
    "PointNet2Params",
    "init_pointnet2",
    "pointnet2_forward",
    "count_params",
]
