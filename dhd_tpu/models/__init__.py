from .dhd import DHDNet, band_masks_from_height, collapse_z

__all__ = ["DHDNet", "band_masks_from_height", "collapse_z"]
