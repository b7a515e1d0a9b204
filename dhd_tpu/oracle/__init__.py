"""Pure-torch oracle models for activation-level parity testing.

These mirror the reference's module topology and state_dict key space
(SURVEY.md §5) so a checkpoint exported by ``io.convert.params_to_torch``
loads with ``strict=True`` and per-layer activations can be diffed against
the flax model — the bridge that makes a released ``.pth`` plug-and-score
the day real weights/data are available.
"""
from .torch_ref import (  # noqa: F401
    TorchASPP,
    TorchCustomFPN,
    TorchCustomResNet,
    TorchDHDS,
    TorchDHDStereo,
    TorchDepthNet,
    TorchFPNLSS,
    TorchHeightNet,
    TorchOccHead,
    TorchResNet50,
    TorchSFA,
    TorchSwin,
    TorchUNet,
)
