"""Minimal functional module system.

TPU-first replacement for the reference's nn.Module runtime
(`/root/reference/src/diffusers/models/modeling_utils.py`): modules are plain
Python objects holding only *structure* (shapes, static config); parameters
live in an external pytree of jnp arrays (nested dicts keyed by attribute
name). Models are pure functions ``module(params, *inputs)`` — trivially
jittable, shardable with GSPMD, and differentiable.

Parameter tree naming deliberately mirrors the reference checkpoints'
state-dict paths (e.g. ``down_blocks.0.resnets.0.conv1`` →
``params["down_blocks"][0]["resnets"][0]["conv1"]``) so that safetensors
loading is a mechanical key-split + layout transpose (torch OIHW→HWIO convs,
[out,in]→[in,out] linears) with no per-model rename maps.

Layout: activations are NHWC (TPU-native; channels on the 128-lane minor
dimension). The public pipeline API still speaks NCHW at the boundary for
reference parity.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


class Module:
    """Base class: auto-registers child modules / param leaves in declaration
    order; default ``init`` recursively initializes children."""

    def __init__(self):
        object.__setattr__(self, "_children", {})

    def __setattr__(self, name, value):
        if isinstance(value, Module):
            self._children[name] = value
        elif isinstance(value, (list, tuple)) and value and all(isinstance(v, Module) for v in value):
            self._children[name] = ModuleList(value)
            object.__setattr__(self, name, self._children[name])
            return
        object.__setattr__(self, name, value)

    # -- parameters ---------------------------------------------------------
    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        """Initialize a parameter pytree. Default: recurse into children."""
        params: Params = {}
        children = list(self._children.items())
        if not children:
            return params
        keys = jax.random.split(key, len(children))
        for (name, child), k in zip(children, keys):
            child_params = child.init(k, dtype=dtype)
            if child_params:  # omit parameter-free subtrees (canonical trees)
                params[name] = child_params
        return params

    def __call__(self, params: Params, *args, **kwargs):
        raise NotImplementedError

    # -- introspection ------------------------------------------------------
    def param_shapes(self) -> Params:
        """Shape tree without allocating (eval_shape over init)."""
        return jax.eval_shape(lambda: self.init(jax.random.PRNGKey(0)))


class ModuleList(Module):
    """Sequence of modules; parameters keyed by integer index (as string keys
    would break jax pytree ordering assumptions, we use a dict of ints)."""

    def __init__(self, modules: Sequence[Module]):
        super().__init__()
        object.__setattr__(self, "_modules", list(modules))

    def __getitem__(self, idx):
        return self._modules[idx]

    def __len__(self):
        return len(self._modules)

    def __iter__(self):
        return iter(self._modules)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        if not self._modules:
            return {}
        keys = jax.random.split(key, len(self._modules))
        out = {}
        for i, (m, k) in enumerate(zip(self._modules, keys)):
            p = m.init(k, dtype=dtype)
            if p:
                out[i] = p
        return out


# ---------------------------------------------------------------------------
# Leaf modules
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype=jnp.float32, minval=-bound, maxval=bound).astype(dtype)


class Linear(Module):
    """y = x @ kernel + bias. kernel is stored [in, out] (checkpoint loads
    transpose torch's [out, in])."""

    def __init__(self, in_features: int, out_features: int, use_bias: bool = True):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        bound = 1 / math.sqrt(self.in_features)
        params = {"kernel": _uniform(k1, (self.in_features, self.out_features), bound, dtype)}
        if self.use_bias:
            params["bias"] = _uniform(k2, (self.out_features,), bound, dtype)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        kernel = params["kernel"]
        if "kernel_scale_i8x" in params:
            # int8 compute via the XLA-native path: per-tensor dynamic
            # activation quantization (elementwise, fuses into the producer)
            # feeding an int8×int8→int32 dot whose dequant fuses into the
            # epilogue. Measured on v5e (round 3): composes with conv/attention
            # graphs where the Pallas per-row path loses to layout churn.
            s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
            qx = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                qx, kernel, (((qx.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = (y.astype(jnp.float32) * (s * params["kernel_scale_i8x"])).astype(x.dtype)
            if self.use_bias:
                y = y + params["bias"].astype(x.dtype)
            return y
        if "kernel_scale_w8a8" in params:  # int8 compute: fused Pallas w8a8 matmul
            from .pallas.quantized_matmul import w8a8_matmul

            return w8a8_matmul(
                x, kernel, params["kernel_scale_w8a8"], bias=params.get("bias") if self.use_bias else None
            )
        if "kernel_scale_int4" in params:
            # group-wise int4 weight-only: nibble-packed int8 storage
            # (2 weights/byte in HBM) with unpack + per-group scale multiply
            # fused into this matmul by XLA
            from ..quantizers.quantize import dequantize_int4

            kernel = dequantize_int4(kernel, params["kernel_scale_int4"], x.dtype,
                                     in_features=self.in_features)
        elif "kernel_scale" in params:  # weight-only quantized (int8/fp8)
            kernel = kernel.astype(x.dtype) * params["kernel_scale"].astype(x.dtype)[None, :]
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y


class Conv2d(Module):
    """2D convolution over NHWC activations; kernel stored HWIO."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: Union[int, Tuple[int, int]] = 3,
        stride: Union[int, Tuple[int, int]] = 1,
        padding: Union[int, Tuple[int, int], str] = 0,
        dilation: Union[int, Tuple[int, int]] = 1,
        groups: int = 1,
        use_bias: bool = True,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        self.stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
        if isinstance(padding, str):
            self.padding = padding
        else:
            p = (padding, padding) if isinstance(padding, int) else tuple(padding)
            self.padding = ((p[0], p[0]), (p[1], p[1]))
        self.dilation = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
        self.groups = groups
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        fan_in = self.in_channels // self.groups * self.kernel_size[0] * self.kernel_size[1]
        bound = 1 / math.sqrt(fan_in)
        shape = (*self.kernel_size, self.in_channels // self.groups, self.out_channels)
        params = {"kernel": _uniform(k1, shape, bound, dtype)}
        if self.use_bias:
            params["bias"] = _uniform(k2, (self.out_channels,), bound, dtype)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if "kernel_scale_w8a8" in params:
            # int8-compute conv: dynamic per-tensor activation quantization +
            # int8×int8→int32 XLA conv (MXU int8 path, measured 1.24-2.0× over
            # bf16 at SDXL shapes on v5e) with the dequant fused into the
            # epilogue. Replaces the reference's CUDA quant backends
            # (/root/reference/src/diffusers/quantizers/) for convs.
            s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-8) / 127.0
            qx = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                qx,
                params["kernel"],
                window_strides=self.stride,
                padding=self.padding,
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * (s * params["kernel_scale_w8a8"])).astype(x.dtype)
            if self.use_bias:
                y = y + params["bias"].astype(x.dtype)
            return y
        kernel = params["kernel"]
        if "kernel_scale" in params:  # weight-only quantized (int8/fp8)
            kernel = kernel.astype(x.dtype) * params["kernel_scale"].astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=self.stride,
            padding=self.padding,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y


class Conv3d(Module):
    """3D convolution over NDHWC activations; kernel stored DHWIO."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: Union[int, Tuple[int, int, int]] = 3,
        stride: Union[int, Tuple[int, int, int]] = 1,
        padding: Union[int, Tuple[int, int, int], str, Tuple] = 0,
        dilation: Union[int, Tuple[int, int, int]] = 1,
        use_bias: bool = True,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size,) * 3 if isinstance(kernel_size, int) else tuple(kernel_size)
        self.stride = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
        if isinstance(padding, str):
            self.padding = padding
        elif isinstance(padding, int):
            self.padding = tuple((padding, padding) for _ in range(3))
        else:
            self.padding = tuple((p, p) if isinstance(p, int) else tuple(p) for p in padding)
        self.dilation = (dilation,) * 3 if isinstance(dilation, int) else tuple(dilation)
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        fan_in = self.in_channels * int(np.prod(self.kernel_size))
        bound = 1 / math.sqrt(fan_in)
        shape = (*self.kernel_size, self.in_channels, self.out_channels)
        params = {"kernel": _uniform(k1, shape, bound, dtype)}
        if self.use_bias:
            params["bias"] = _uniform(k2, (self.out_channels,), bound, dtype)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        y = jax.lax.conv_general_dilated(
            x,
            params["kernel"].astype(x.dtype),
            window_strides=self.stride,
            padding=self.padding,
            rhs_dilation=self.dilation,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y


class Conv1d(Module):
    """1D convolution over NLC activations; kernel stored LIO (torch nn.Conv1d
    weight [O, I, K] transposes to [K, I, O] on load)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int = 3,
        stride: int = 1,
        padding: int = 0,
        dilation: int = 1,
        groups: int = 1,
        use_bias: bool = True,
    ):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = ((padding, padding),)
        self.dilation = dilation
        self.groups = groups
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        fan_in = self.in_channels // self.groups * self.kernel_size
        bound = 1 / math.sqrt(fan_in)
        shape = (self.kernel_size, self.in_channels // self.groups, self.out_channels)
        params = {"kernel": _uniform(k1, shape, bound, dtype)}
        if self.use_bias:
            params["bias"] = _uniform(k2, (self.out_channels,), bound, dtype)
        return params

    def convert_torch_param(self, pname, tensor):
        if pname == "weight":  # OIK -> KIO
            return "kernel", tensor.transpose(2, 1, 0)
        return pname, tensor

    def convert_param_to_torch(self, pname, array):
        if pname == "kernel":
            return "weight", array.transpose(2, 1, 0)
        return pname, array

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        y = jax.lax.conv_general_dilated(
            x,
            params["kernel"].astype(x.dtype),
            window_strides=(self.stride,),
            padding=self.padding,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y


class ConvTranspose1d(Module):
    """1D transposed convolution over NLC activations. Kernel stored LIO in
    the torch orientation (torch nn.ConvTranspose1d weight [I, O, K]
    transposes to [K, I, O] on load); realized as an lhs-dilated correlation
    with the kernel flipped along L."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 groups: int = 1, use_bias=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.groups = groups
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        fan_in = self.in_channels // self.groups * self.kernel_size
        bound = 1 / math.sqrt(fan_in)
        shape = (self.kernel_size, self.in_channels // self.groups, self.out_channels)
        params = {"kernel": _uniform(k1, shape, bound, dtype)}
        if self.use_bias:
            params["bias"] = _uniform(k2, (self.out_channels,), bound, dtype)
        return params

    def convert_torch_param(self, pname, tensor):
        if pname == "weight":  # [I, O/groups, K] -> [K, I, O/groups]
            return "kernel", tensor.transpose(2, 0, 1)
        return pname, tensor

    def convert_param_to_torch(self, pname, array):
        if pname == "kernel":
            return "weight", array.transpose(1, 2, 0)
        return pname, array

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        k, p = self.kernel_size, self.padding
        kernel = jnp.flip(params["kernel"].astype(x.dtype), axis=0)
        if self.groups == 1:
            # stored [K, I, O]: lhs-dilated correlation contracts over I
            y = jax.lax.conv_general_dilated(
                x, kernel,
                window_strides=(1,),
                padding=((k - 1 - p, k - 1 - p),),
                lhs_dilation=(self.stride,),
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        else:
            # grouped transpose: stored [K, I/?..]; torch layout is
            # [I, O/groups, K] -> here [K, I, O/groups]; regroup to HIO with
            # I_per_group contraction: reshape to [K, groups, I/groups, O/groups]
            kk = kernel.reshape(k, self.groups, self.in_channels // self.groups, -1)
            kk = jnp.moveaxis(kk, 1, 2).reshape(k, self.in_channels // self.groups, -1)
            y = jax.lax.conv_general_dilated(
                x, kk,
                window_strides=(1,),
                padding=((k - 1 - p, k - 1 - p),),
                lhs_dilation=(self.stride,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y


class ConvTranspose2d(Module):
    """2D transposed convolution over NHWC activations. Kernel stored HWIO in
    the torch orientation (torch nn.ConvTranspose2d weight [I, O, kH, kW]
    transposes to [kH, kW, I, O] on load); realized as an lhs-dilated
    correlation with the kernel flipped spatially."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0, use_bias=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        self.stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
        self.padding = (padding, padding) if isinstance(padding, int) else tuple(padding)
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32) -> Params:
        k1, k2 = jax.random.split(key)
        fan_in = self.in_channels * self.kernel_size[0] * self.kernel_size[1]
        bound = 1 / math.sqrt(fan_in)
        shape = (*self.kernel_size, self.in_channels, self.out_channels)
        params = {"kernel": _uniform(k1, shape, bound, dtype)}
        if self.use_bias:
            params["bias"] = _uniform(k2, (self.out_channels,), bound, dtype)
        return params

    def convert_torch_param(self, pname, tensor):
        if pname == "weight":  # IOHW -> HWIO
            return "kernel", tensor.transpose(2, 3, 0, 1)
        return pname, tensor

    def convert_param_to_torch(self, pname, array):
        if pname == "kernel":
            return "weight", array.transpose(2, 3, 0, 1)
        return pname, array

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        ph, pw = self.padding
        kernel = jnp.flip(params["kernel"].astype(x.dtype), axis=(0, 1))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
            lhs_dilation=self.stride,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + params["bias"].astype(x.dtype)
        return y


class GroupNorm(Module):
    """GroupNorm over the channel (last) axis of NHWC/`[..., C]` activations.
    Statistics accumulate in float32 (matches torch's fp32 reduction)."""

    def __init__(self, num_groups: int, num_channels: int, eps: float = 1e-5, affine: bool = True):
        super().__init__()
        self.num_groups = num_groups
        self.num_channels = num_channels
        self.eps = eps
        self.affine = affine

    def init(self, key, dtype=jnp.float32) -> Params:
        if not self.affine:
            return {}
        return {
            "scale": jnp.ones((self.num_channels,), dtype=dtype),
            "bias": jnp.zeros((self.num_channels,), dtype=dtype),
        }

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        c = x.shape[-1]
        g = self.num_groups
        xf = x.astype(jnp.float32)
        # [..., C] -> [..., G, C//G]; stats over all spatial dims + group chans
        spatial_axes = tuple(range(1, x.ndim - 1))
        xg = xf.reshape(x.shape[:-1] + (g, c // g))
        axes = spatial_axes + (x.ndim,)  # note: after reshape, last dim is ndim
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        xf = xg.reshape(x.shape)
        if self.affine:
            xf = xf * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
        return xf.astype(orig_dtype)


class LayerNorm(Module):
    def __init__(self, dim: int, eps: float = 1e-5, use_scale: bool = True, use_bias: bool = True):
        super().__init__()
        self.dim = dim
        self.eps = eps
        self.use_scale = use_scale
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32) -> Params:
        params = {}
        if self.use_scale:
            params["scale"] = jnp.ones((self.dim,), dtype=dtype)
        if self.use_bias:
            params["bias"] = jnp.zeros((self.dim,), dtype=dtype)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            xf = xf * params["scale"].astype(jnp.float32)
        if self.use_bias:
            xf = xf + params["bias"].astype(jnp.float32)
        return xf.astype(orig_dtype)


class RMSNorm(Module):
    def __init__(self, dim: int, eps: float = 1e-6, use_scale: bool = True, use_bias: bool = False):
        super().__init__()
        self.dim = dim
        self.eps = eps
        self.use_scale = use_scale
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32) -> Params:
        params = {}
        if self.use_scale:
            params["scale"] = jnp.ones((self.dim,), dtype=dtype)
        if self.use_bias:
            params["bias"] = jnp.zeros((self.dim,), dtype=dtype)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            xf = xf * params["scale"].astype(jnp.float32)
        if self.use_bias:
            xf = xf + params["bias"].astype(jnp.float32)
        return xf.astype(orig_dtype)


class Embedding(Module):
    def __init__(self, num_embeddings: int, features: int):
        super().__init__()
        self.num_embeddings = num_embeddings
        self.features = features

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"embedding": jax.random.normal(key, (self.num_embeddings, self.features), jnp.float32).astype(dtype)}

    def __call__(self, params: Params, ids: jax.Array) -> jax.Array:
        return jnp.take(params["embedding"], ids, axis=0)


class Identity(Module):
    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return x


# ---------------------------------------------------------------------------
# Activations (reference models/activations.py)
# ---------------------------------------------------------------------------

ACT2FN: Dict[str, Callable] = {
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "linear": lambda x: x,
}


def get_activation(name: str) -> Callable:
    name = name.lower()
    if name not in ACT2FN:
        raise ValueError(f"activation {name} not supported; choose from {list(ACT2FN)}")
    return ACT2FN[name]
