from .dhd import DHDNet, band_masks_from_height, collapse_z
from .dhd_stereo import DHDStereoNet, uncollapse_z


def build_model(cfg, dtype=None):
    """Model factory: DHDNet for single-frame configs, DHDStereoNet for
    temporal ones (the reference registry dispatch on type='DHD' vs
    'DHD_stereo')."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    if cfg.temporal:
        return DHDStereoNet(cfg, dtype=dtype)
    return DHDNet(cfg, dtype=dtype)


__all__ = ["DHDNet", "DHDStereoNet", "band_masks_from_height", "build_model",
           "collapse_z", "uncollapse_z"]
