"""Weight-only quantization over parameter pytrees.

Quantized Linear kernels are stored as ``{"kernel": int8/fp8 [in, out],
"kernel_scale": f32 [out], ...}``; `ops.module.Linear` dequantizes inline
(one multiply fused into the matmul's epilogue by XLA), so no module surgery
is needed — mirroring how the reference's quantizers hook `from_pretrained`
(`quantizers/base.py:34` lifecycle) but with zero runtime dispatch cost.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging
from .quantization_config import (
    Fp8WeightOnlyConfig,
    Int4WeightOnlyConfig,
    Int8DynamicActConfig,
    Int8WeightOnlyConfig,
    QuantizationConfig,
)

logger = logging.get_logger(__name__)


def _quantize_kernel_int8(kernel: jax.Array):
    """[in, out] → int8 kernel + per-out-channel scale (on-device: avoids a
    host round-trip per layer, which is prohibitive through the axon tunnel)."""
    k = jnp.asarray(kernel, dtype=jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(k), axis=0), 1e-8)  # [out]
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(k / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def pack_int4_rows(q: jax.Array) -> jax.Array:
    """[in, out] int values in [-8, 7] → int8 [ceil(in/2), out] with two
    nibbles per byte (row 2i → low nibble, row 2i+1 → high).

    Nibble-packed int8 is the at-rest int4 format: identical 0.5 B/weight HBM
    footprint to XLA's s4, but usable on every backend — notably the axon
    TPU client, which rejects s4 arrays as jit inputs ("Recursively calling
    jit", measured r5). The unpack (two shifts) fuses into the consuming
    matmul."""
    q = q.astype(jnp.int8)
    in_dim, out_dim = q.shape
    if in_dim % 2:
        q = jnp.concatenate([q, jnp.zeros((1, out_dim), jnp.int8)], axis=0)
    lo = q[0::2] & 0x0F
    hi = q[1::2] & 0x0F
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4_rows(packed: jax.Array, in_dim: int, dtype) -> jax.Array:
    """Inverse of pack_int4_rows → float [in_dim, out] nibble values (no
    scales applied). Sign-extension via left-then-arithmetic-right shifts."""
    lo = ((packed << 4).astype(jnp.int8) >> 4).astype(dtype)
    hi = (packed >> 4).astype(dtype)
    w = jnp.stack([lo, hi], axis=1).reshape(2 * packed.shape[0], packed.shape[1])
    return w[:in_dim]


def _quantize_kernel_int4(kernel: jax.Array, group_size: int):
    """[in, out] → nibble-packed int8 kernel [ceil(in/2), out] + per-[group,
    out] scale. Groups run along the input (contraction) dim; when `in`
    doesn't divide group_size, one group spans the whole input dim."""
    k = jnp.asarray(kernel, dtype=jnp.float32)
    in_dim, out_dim = k.shape
    g = group_size if in_dim % group_size == 0 else in_dim
    kg = k.reshape(in_dim // g, g, out_dim)
    absmax = jnp.maximum(jnp.max(jnp.abs(kg), axis=1), 1e-8)  # [groups, out]
    scale = absmax / 7.0
    q = jnp.clip(jnp.round(kg / scale[:, None, :]), -7, 7).reshape(in_dim, out_dim)
    return pack_int4_rows(q), scale


def _quantize_kernel_fp8(kernel: jax.Array):
    k = jnp.asarray(kernel, dtype=jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(k), axis=0), 1e-8)
    scale = absmax / 448.0  # e4m3 max normal
    q = (k / scale[None, :]).astype(jnp.float8_e4m3fn)
    return q, scale


def _quantize_conv_kernel_int8(kernel: jax.Array):
    """HWIO (or DHWIO) → int8 kernel + per-out-channel scale (reduce over all
    non-output axes)."""
    k = jnp.asarray(kernel, dtype=jnp.float32)
    axes = tuple(range(k.ndim - 1))
    absmax = jnp.maximum(jnp.max(jnp.abs(k), axis=axes), 1e-8)  # [out]
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _conv_int8_eligible(kernel) -> bool:
    """Gate convs to the shapes where the int8 XLA conv wins on v5e (measured
    round 3: 3x3 convs with fan_in>=2560 win 1.24-2.0x; 1x1 convs behave like
    the matmul gate and lose below K 2560)."""
    *spatial_io, cin, cout = kernel.shape
    fan_in = cin * int(np.prod(spatial_io)) if spatial_io else cin
    return (fan_in >= 2560 or (fan_in >= 1280 and cout >= 2560)) and cout >= 256


def quantize_params(params, config: QuantizationConfig, path: str = ""):
    """Return a new pytree with eligible Linear/Conv kernels quantized.

    The whole tree is quantized inside ONE jit (`_quantize_tree_jit`): eager
    per-leaf dispatch pays ~10-40 ms of device-call latency per layer, which
    for an SDXL/Flux-size tree is minutes; a single traced graph is one
    compile + one dispatch."""
    if path == "" and isinstance(params, dict):
        return _quantize_tree_jit(params, config)
    return _quantize_params_traced(params, config, path)


def _quantize_tree_jit(params, config):
    import functools

    return jax.jit(functools.partial(_quantize_params_traced, config=config, path="root"))(params)


def _quantize_params_traced(params, config: QuantizationConfig, path: str = ""):
    if isinstance(params, dict):
        kernel = params.get("kernel")
        is_leaf = kernel is not None and not isinstance(kernel, dict)
        if is_leaf and any(k.startswith("kernel_scale") for k in params):
            return params  # already quantized (e.g. native GGUF Q4_0 import)
        # a Linear leaf-dict has a 2D "kernel"; Conv2d/Conv3d are 4/5-D HWIO
        if is_leaf and kernel.ndim == 2:
            skip = any(m in path for m in config.modules_to_not_convert)
            if not skip and kernel.size >= config.min_weight_size:
                scale_key = "kernel_scale"
                if isinstance(config, Int8DynamicActConfig):
                    k_dim, n = kernel.shape
                    # only mark layers whose shape takes the fused int8 path at
                    # runtime (same gate as w8a8_matmul) — layers below the gate
                    # would silently fall back to a *materialized* weight
                    # dequant per call, which measured 1.7x slower end-to-end
                    # on the SDXL UNet (round 3)
                    if not (k_dim >= 2560 or (k_dim >= 1280 and n >= 2560)):
                        return params
                    q, scale = _quantize_kernel_int8(kernel)
                    # marks the int8-compute path in Linear (Pallas per-row vs
                    # XLA-native per-tensor, see Int8DynamicActConfig.impl)
                    scale_key = "kernel_scale_i8x" if getattr(config, "impl", "pallas") == "xla" else "kernel_scale_w8a8"
                elif isinstance(config, Int4WeightOnlyConfig):
                    q, scale = _quantize_kernel_int4(kernel, config.group_size)
                    scale_key = "kernel_scale_int4"
                elif isinstance(config, Int8WeightOnlyConfig):
                    q, scale = _quantize_kernel_int8(kernel)
                elif isinstance(config, Fp8WeightOnlyConfig):
                    q, scale = _quantize_kernel_fp8(kernel)
                else:
                    return params
                new = dict(params)
                new["kernel"] = q
                new[scale_key] = scale
                return new
            return params
        if is_leaf and kernel.ndim == 4 and isinstance(config, Int8DynamicActConfig):
            skip = any(m in path for m in config.modules_to_not_convert)
            if not skip and kernel.size >= config.min_weight_size and _conv_int8_eligible(kernel):
                q, scale = _quantize_conv_kernel_int8(kernel)
                new = dict(params)
                new["kernel"] = q
                new["kernel_scale_w8a8"] = scale
                return new
            return params
        if is_leaf:
            return params
        return {
            k: quantize_params(v, config, f"{path}.{k}" if path else str(k)) if isinstance(v, dict) else v
            for k, v in params.items()
        }
    return params


def dequantize_params(params):
    """Materialize quantized kernels back to float (for save/inspection)."""
    if isinstance(params, dict):
        if "kernel_scale_int4" in params:
            new = dict(params)
            new["kernel"] = dequantize_int4(params["kernel"], params["kernel_scale_int4"], jnp.float32)
            del new["kernel_scale_int4"]
            return new
        scale_key = next(
            (k for k in ("kernel_scale", "kernel_scale_w8a8", "kernel_scale_i8x") if k in params), None
        )
        if scale_key is not None:
            new = dict(params)
            new["kernel"] = (
                params["kernel"].astype(jnp.float32) * params[scale_key][None, :]
            )
            del new[scale_key]
            return new
        return {k: dequantize_params(v) if isinstance(v, dict) else v for k, v in params.items()}
    return params


def dequantize_int4(kernel: jax.Array, scale: jax.Array, dtype,
                    in_features: Optional[int] = None) -> jax.Array:
    """nibble-packed int8 [ceil(in/2), out] + scale [groups, out] → float
    [in, out]; unpack + convert + group-broadcast multiply fuse into the
    consuming matmul under jit."""
    out_dim = kernel.shape[1]
    in_dim = in_features if in_features is not None else 2 * kernel.shape[0]
    w = unpack_int4_rows(kernel, in_dim, dtype)
    groups = scale.shape[0]
    g = in_dim // groups
    w = w.reshape(groups, g, out_dim) * scale[:, None, :].astype(dtype)
    return w.reshape(in_dim, out_dim)


def maybe_quantize(params, quantization_config):
    """Apply the load-time quantizer lifecycle if a config is given (accepts
    config objects, dicts, or method-name strings)."""
    if quantization_config is None:
        return params
    from .auto import resolve_quantization_config

    qc = resolve_quantization_config(quantization_config)
    return quantize_params(params, qc) if qc is not None else params
