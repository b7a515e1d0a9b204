from .convert import build_rules, params_to_torch, torch_to_params
from .checkpoint import load_checkpoint, save_checkpoint

__all__ = ["build_rules", "params_to_torch", "torch_to_params",
           "load_checkpoint", "save_checkpoint"]
