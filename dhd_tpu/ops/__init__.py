from .voxel_pool import (
    bev_pool_v2,
    compute_pool_indices,
    mghs_pool,
)
from .warp import grid_sample_2d

__all__ = [
    "bev_pool_v2",
    "compute_pool_indices",
    "mghs_pool",
    "grid_sample_2d",
]
