"""Post-training int8 quantization for serving (the TRT-int8 analogue).

The reference ships int8 deployment via TensorRT with HDF5 activation
calibration (tools/convert_bevdet_to_TRT.py:42-120).  The TPU-native
equivalent here:

* **Calibration** — run the fp model over a few batches and record the
  absolute-max of every targeted conv's input (per-tensor symmetric
  activation scales, the TRT default for feature maps).
* **Quantized serving** — re-run the same Flax model under a method
  interceptor that replaces each targeted ``nn.Conv`` with an int8 conv:
  activations quantized per-tensor with the calibrated scale, weights
  per-output-channel (symmetric), accumulation in int32 on the MXU
  (v5e int8 peak is 2x bf16), dequantized into the conv's compute dtype.

No model-code changes: the interceptor targets convs by module path, so
the same approach covers ResNet-50, the BEV encoder, or any conv subnet.
Everything stays jittable / exportable — the quantized function serializes
through ``jax.export`` exactly like the fp one (cli/export.py --int8).

Scales ride in a plain ``{path: amax}`` dict (the HDF5-calibration file
analogue; save with numpy if needed).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _path_of(module: nn.Module) -> str:
    return "/".join(module.path)


def _canon_padding(pad, kdims: int):
    if isinstance(pad, str):
        return pad
    if isinstance(pad, int):
        return [(pad, pad)] * kdims
    out = []
    for p in pad:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def _canon_strides(strides, kdims: int) -> Tuple[int, ...]:
    if strides is None:
        return (1,) * kdims
    if isinstance(strides, int):
        return (strides,) * kdims
    return tuple(strides)


def _targeted(module: nn.Module, prefixes: Sequence[str]) -> bool:
    if not isinstance(module, nn.Conv):
        return False
    p = _path_of(module)
    return any(p.startswith(pre) for pre in prefixes)


def calibration_interceptor(amax: Dict[str, jnp.ndarray],
                            prefixes: Sequence[str]):
    """Interceptor recording per-conv input absmax into ``amax``."""
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__" and _targeted(mod, prefixes):
            x = args[0]
            a = jnp.max(jnp.abs(x.astype(jnp.float32)))
            p = _path_of(mod)
            amax[p] = jnp.maximum(amax[p], a) if p in amax else a
        return next_fun(*args, **kwargs)
    return interceptor


def int8_interceptor(scales: Dict[str, jnp.ndarray],
                     prefixes: Sequence[str]):
    """Interceptor running targeted convs as int8 x int8 -> int32 MXU ops.

    Activations: per-tensor symmetric (calibrated scale).  Weights:
    per-output-channel symmetric, quantized on the fly from the fp params
    (negligible next to activation traffic; keeps one source of truth).
    """
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__" or not _targeted(mod, prefixes):
            return next_fun(*args, **kwargs)
        p = _path_of(mod)
        if p not in scales:
            return next_fun(*args, **kwargs)
        assert mod.feature_group_count == 1, p
        x = args[0]
        kdims = len(mod.kernel_size)
        assert kdims == 2, (p, mod.kernel_size)
        kernel = mod.variables["params"]["kernel"]       # (kh, kw, cin, co)
        sx = jnp.maximum(scales[p].astype(jnp.float32), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127) \
            .astype(jnp.int8)
        kf = kernel.astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
        wq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=_canon_strides(mod.strides, kdims),
            padding=_canon_padding(mod.padding, kdims),
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * sw)
        if mod.use_bias:
            y = y + mod.variables["params"]["bias"].astype(jnp.float32)
        return y.astype(mod.dtype or x.dtype)
    return interceptor


def calibrate_int8(apply_fn: Callable, batches, prefixes: Sequence[str],
                   variables=None) -> Dict[str, jnp.ndarray]:
    """Run ``apply_fn(batch)`` over ``batches`` recording conv-input absmax.

    Returns {module_path: amax} — the activation-scale table (the HDF5
    calibration-file analogue).  One jit per distinct batch shape.

    ``apply_fn`` must come from a REMAT-FREE model: the interceptor records
    amax through a side dict, and under ``nn.remat`` those values are
    tracers of the inner checkpoint trace (UnexpectedTracerError).  Remat
    is output-invariant, so build the calibration model with
    ``backbone_remat=False`` and reuse the scales for the remat'd model
    (cli/export.py does this).  ``quantize_fn`` itself is side-effect-free
    and works under remat.

    Pass ``variables`` to have ``apply_fn(variables, batch)`` called with
    the weights as a JIT ARGUMENT — closed-over weights become compile-
    payload constants, which remote-compile transports cap (HTTP 413 at
    DHD-S scale through the device tunnel).
    """
    total: Dict[str, jnp.ndarray] = {}

    @jax.jit
    def one(batch, *extra):
        amax: Dict[str, jnp.ndarray] = {}
        with nn.intercept_methods(calibration_interceptor(amax, prefixes)):
            apply_fn(*extra, batch)
        return amax

    for batch in batches:
        amax = one(batch) if variables is None else one(batch, variables)
        for k, v in amax.items():
            total[k] = jnp.maximum(total[k], v) if k in total else v
    return jax.device_get(total)


def quantize_fn(apply_fn: Callable, scales: Dict[str, jnp.ndarray],
                prefixes: Sequence[str]) -> Callable:
    """Wrap ``apply_fn`` so targeted convs run int8 (jittable/exportable)."""
    @functools.wraps(apply_fn)
    def wrapped(*args, **kwargs):
        with nn.intercept_methods(int8_interceptor(scales, prefixes)):
            return apply_fn(*args, **kwargs)
    return wrapped
