from .dvr import render, render_expected_depth, render_rays
from .voxel_pool import (
    bev_pool_v2,
    compute_pool_indices,
    mghs_pool,
    mghs_pool_pallas,
    build_pool_plan,
)
from .warp import grid_sample_2d

__all__ = [
    "bev_pool_v2",
    "compute_pool_indices",
    "mghs_pool",
    "mghs_pool_pallas",
    "build_pool_plan",
    "grid_sample_2d",
    "render",
    "render_expected_depth",
    "render_rays",
]
