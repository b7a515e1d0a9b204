from .occ_loss import (geo_scal_loss, occ_ce_loss, occ_losses_fused,
                       occ_losses_fused_packed,
                       sem_scal_loss)
from .height_loss import (
    bce_distribution_loss,
    depth_height_labels,
    downsample_min_nonzero,
    shifted_onehot_labels,
)

__all__ = [
    "geo_scal_loss", "occ_ce_loss", "occ_losses_fused",
    "occ_losses_fused_packed", "sem_scal_loss",
    "bce_distribution_loss", "depth_height_labels",
    "downsample_min_nonzero", "shifted_onehot_labels",
]
