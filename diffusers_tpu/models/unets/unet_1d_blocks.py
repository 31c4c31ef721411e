"""1D UNet blocks — dance-diffusion audio blocks + RL value-function blocks.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/unets/unet_1d_blocks.py`): the
fixed-kernel (linear/cubic/lanczos3) anti-aliased down/upsamplers, the
ResConvBlock/SelfAttention1d dance-diffusion stack, and the
mish-Conv1dBlock ResidualTemporalBlock1D RL stack.

TPU-first: activations are NLC (channels on the 128-lane minor dim); the
fixed resampling kernels run as depthwise `conv_general_dilated` (shared
[K,1,C] kernel) instead of materializing a CxC identity-weight matrix as
the reference does (`unet_1d_blocks.py:292-296`); attention routes through
the dispatch layer.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv1d, ConvTranspose1d, GroupNorm, Linear, Module, ModuleList, Params, get_activation

# reference unet_1d_blocks.py:262-279
_KERNELS = {
    "linear": [1 / 8, 3 / 8, 3 / 8, 1 / 8],
    "cubic": [-0.01171875, -0.03515625, 0.11328125, 0.43359375,
              0.43359375, 0.11328125, -0.03515625, -0.01171875],
    "lanczos3": [0.003689131001010537, 0.015056144446134567, -0.03399861603975296,
                 -0.066637322306633, 0.13550527393817902, 0.44638532400131226,
                 0.44638532400131226, 0.13550527393817902, -0.066637322306633,
                 -0.03399861603975296, 0.015056144446134567, 0.003689131001010537],
}


def _depthwise_kernel(kernel_1d: np.ndarray, channels: int, dtype) -> jax.Array:
    # [K] -> [K, 1, C] depthwise kernel (HIO with feature_group_count=C)
    k = jnp.asarray(kernel_1d, dtype=dtype)
    return jnp.broadcast_to(k[:, None, None], (k.shape[0], 1, channels))


class FixedDownsample1d(Module):
    """Anti-aliased stride-2 downsample with a fixed separable kernel
    (reference `Downsample1d`, `unet_1d_blocks.py:282`)."""

    def __init__(self, kernel: str = "linear", pad_mode: str = "reflect"):
        super().__init__()
        self.pad_mode = pad_mode
        self.kernel_1d = np.asarray(_KERNELS[kernel], dtype=np.float32)
        self.pad = self.kernel_1d.shape[0] // 2 - 1

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [B, L, C]
        x = jnp.pad(x, ((0, 0), (self.pad, self.pad), (0, 0)), mode=self.pad_mode)
        k = _depthwise_kernel(self.kernel_1d, x.shape[-1], x.dtype)
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(2,), padding=((0, 0),),
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=x.shape[-1])


class FixedUpsample1d(Module):
    """Anti-aliased 2x upsample (reference `Upsample1d`,
    `unet_1d_blocks.py:299`): torch `conv_transpose1d(stride=2,
    padding=K-1)` expressed as an lhs-dilated depthwise conv (the fixed
    kernels are symmetric, so the transpose flip is a no-op)."""

    def __init__(self, kernel: str = "cubic", pad_mode: str = "reflect"):
        super().__init__()
        self.pad_mode = pad_mode
        self.kernel_1d = np.asarray(_KERNELS[kernel], dtype=np.float32) * 2
        self.pad = self.kernel_1d.shape[0] // 2 - 1

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), ((self.pad + 1) // 2,) * 2, (0, 0)), mode=self.pad_mode)
        k = _depthwise_kernel(self.kernel_1d[::-1].copy(), x.shape[-1], x.dtype)
        kk = self.kernel_1d.shape[0]
        # conv_transpose(stride=2, padding=P) == conv(dilate(x,2), flip(w), pad=K-1-P)
        p = kk - 1 - (self.pad * 2 + 1)
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1,), padding=((p, p),), lhs_dilation=(2,),
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=x.shape[-1])


class Downsample1DConv(Module):
    """Learned stride-2 conv downsample (reference resnet `Downsample1D`)."""

    def __init__(self, channels: int, out_channels: Optional[int] = None, padding: int = 1):
        super().__init__()
        self.conv = Conv1d(channels, out_channels or channels, kernel_size=3, stride=2, padding=padding)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.conv(params["conv"], x)


class Upsample1DConvT(Module):
    """Learned 2x conv-transpose upsample (reference upsampling `Upsample1D`
    with `use_conv_transpose=True`)."""

    def __init__(self, channels: int, out_channels: Optional[int] = None, use_conv_transpose: bool = True):
        super().__init__()
        self.use_conv_transpose = use_conv_transpose
        if use_conv_transpose:
            self.conv = ConvTranspose1d(channels, out_channels or channels, kernel_size=4, stride=2, padding=1)
        else:
            self.conv = Conv1d(channels, out_channels or channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.use_conv_transpose:
            return self.conv(params["conv"], x)
        b, l, c = x.shape
        x = jnp.repeat(x, 2, axis=1)
        return self.conv(params["conv"], x)


class SelfAttention1d(Module):
    """reference `SelfAttention1d` (`unet_1d_blocks.py:316`): GroupNorm(1) →
    per-head attention → out proj, residual add."""

    def __init__(self, in_channels: int, n_head: int = 1):
        super().__init__()
        self.channels = in_channels
        self.num_heads = max(n_head, 1)
        self.group_norm = GroupNorm(1, in_channels)
        self.query = Linear(in_channels, in_channels)
        self.key = Linear(in_channels, in_channels)
        self.value = Linear(in_channels, in_channels)
        self.proj_attn = Linear(in_channels, in_channels)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        residual = x
        b, l, c = x.shape
        h = self.group_norm(params["group_norm"], x)
        d = c // self.num_heads
        q = self.query(params["query"], h).reshape(b, l, self.num_heads, d)
        k = self.key(params["key"], h).reshape(b, l, self.num_heads, d)
        v = self.value(params["value"], h).reshape(b, l, self.num_heads, d)
        o = dispatch_attention_fn(q, k, v, scale=1.0 / math.sqrt(d)).reshape(b, l, c)
        return self.proj_attn(params["proj_attn"], o) + residual


class ResConvBlock(Module):
    """reference `ResConvBlock` (`unet_1d_blocks.py:374`): two k=5 convs with
    GroupNorm(1)+GELU, 1x1 conv skip on channel change; the last block of the
    net omits the final norm/act."""

    def __init__(self, in_channels: int, mid_channels: int, out_channels: int, is_last: bool = False):
        super().__init__()
        self.is_last = is_last
        self.has_conv_skip = in_channels != out_channels
        if self.has_conv_skip:
            self.conv_skip = Conv1d(in_channels, out_channels, kernel_size=1, use_bias=False)
        self.conv_1 = Conv1d(in_channels, mid_channels, kernel_size=5, padding=2)
        self.group_norm_1 = GroupNorm(1, mid_channels)
        self.conv_2 = Conv1d(mid_channels, out_channels, kernel_size=5, padding=2)
        if not is_last:
            self.group_norm_2 = GroupNorm(1, out_channels)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        residual = self.conv_skip(params["conv_skip"], x) if self.has_conv_skip else x
        h = self.conv_1(params["conv_1"], x)
        h = jax.nn.gelu(self.group_norm_1(params["group_norm_1"], h), approximate=False)
        h = self.conv_2(params["conv_2"], h)
        if not self.is_last:
            h = jax.nn.gelu(self.group_norm_2(params["group_norm_2"], h), approximate=False)
        return h + residual


class Conv1dBlock(Module):
    """reference resnet `Conv1dBlock`: conv(k, pad k//2) → GroupNorm(8) → mish."""

    def __init__(self, inp_channels: int, out_channels: int, kernel_size: int, n_groups: int = 8,
                 activation: str = "mish"):
        super().__init__()
        self.conv1d = Conv1d(inp_channels, out_channels, kernel_size=kernel_size, padding=kernel_size // 2)
        self.group_norm = GroupNorm(n_groups, out_channels)
        self.act = get_activation(activation)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.act(self.group_norm(params["group_norm"], self.conv1d(params["conv1d"], x)))


class ResidualTemporalBlock1D(Module):
    """reference resnet `ResidualTemporalBlock1D:428`: conv_in + FiLM-style
    time add, conv_out, 1x1 residual on channel change."""

    def __init__(self, inp_channels: int, out_channels: int, embed_dim: int,
                 kernel_size: int = 5, activation: str = "mish"):
        super().__init__()
        self.conv_in = Conv1dBlock(inp_channels, out_channels, kernel_size)
        self.conv_out = Conv1dBlock(out_channels, out_channels, kernel_size)
        self.time_emb_act = get_activation(activation)
        self.time_emb = Linear(embed_dim, out_channels)
        self.has_residual_conv = inp_channels != out_channels
        if self.has_residual_conv:
            self.residual_conv = Conv1d(inp_channels, out_channels, kernel_size=1)

    def __call__(self, params: Params, x: jax.Array, t: jax.Array) -> jax.Array:
        temb = self.time_emb(params["time_emb"], self.time_emb_act(t))
        h = self.conv_in(params["conv_in"], x) + temb[:, None, :]
        h = self.conv_out(params["conv_out"], h)
        res = self.residual_conv(params["residual_conv"], x) if self.has_residual_conv else x
        return h + res


# ---------------------------------------------------------------------------
# Dance-diffusion blocks (fixed anti-aliased resampling, no temb mixing)
# ---------------------------------------------------------------------------


class DownBlock1D(Module):
    def __init__(self, out_channels: int, in_channels: int, mid_channels: Optional[int] = None):
        super().__init__()
        mid_channels = out_channels if mid_channels is None else mid_channels
        self.down = FixedDownsample1d("cubic")
        self.resnets = ModuleList([
            ResConvBlock(in_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, out_channels),
        ])

    def __call__(self, params: Params, x: jax.Array, temb=None):
        x = self.down({}, x)
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x)
        return x, (x,)


class AttnDownBlock1D(Module):
    def __init__(self, out_channels: int, in_channels: int, mid_channels: Optional[int] = None):
        super().__init__()
        mid_channels = out_channels if mid_channels is None else mid_channels
        self.down = FixedDownsample1d("cubic")
        self.resnets = ModuleList([
            ResConvBlock(in_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, out_channels),
        ])
        self.attentions = ModuleList([
            SelfAttention1d(mid_channels, mid_channels // 32),
            SelfAttention1d(mid_channels, mid_channels // 32),
            SelfAttention1d(out_channels, out_channels // 32),
        ])

    def __call__(self, params: Params, x: jax.Array, temb=None):
        x = self.down({}, x)
        for i, (r, a) in enumerate(zip(self.resnets, self.attentions)):
            x = r(params["resnets"][i], x)
            x = a(params["attentions"][i], x)
        return x, (x,)


class DownBlock1DNoSkip(Module):
    def __init__(self, out_channels: int, in_channels: int, mid_channels: Optional[int] = None):
        super().__init__()
        mid_channels = out_channels if mid_channels is None else mid_channels
        self.resnets = ModuleList([
            ResConvBlock(in_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, out_channels),
        ])

    def __call__(self, params: Params, x: jax.Array, temb: jax.Array):
        # the time embedding rides in as extra channels (reference :515)
        x = jnp.concatenate([x, temb], axis=-1)
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x)
        return x, (x,)


class UpBlock1D(Module):
    def __init__(self, in_channels: int, out_channels: int, mid_channels: Optional[int] = None):
        super().__init__()
        mid_channels = in_channels if mid_channels is None else mid_channels
        self.resnets = ModuleList([
            ResConvBlock(2 * in_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, out_channels),
        ])
        self.up = FixedUpsample1d("cubic")

    def __call__(self, params: Params, x: jax.Array, res_hidden_states_tuple, temb=None):
        x = jnp.concatenate([x, res_hidden_states_tuple[-1]], axis=-1)
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x)
        return self.up({}, x)


class AttnUpBlock1D(Module):
    def __init__(self, in_channels: int, out_channels: int, mid_channels: Optional[int] = None):
        super().__init__()
        mid_channels = out_channels if mid_channels is None else mid_channels
        self.resnets = ModuleList([
            ResConvBlock(2 * in_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, out_channels),
        ])
        self.attentions = ModuleList([
            SelfAttention1d(mid_channels, mid_channels // 32),
            SelfAttention1d(mid_channels, mid_channels // 32),
            SelfAttention1d(out_channels, out_channels // 32),
        ])
        self.up = FixedUpsample1d("cubic")

    def __call__(self, params: Params, x: jax.Array, res_hidden_states_tuple, temb=None):
        x = jnp.concatenate([x, res_hidden_states_tuple[-1]], axis=-1)
        for i, (r, a) in enumerate(zip(self.resnets, self.attentions)):
            x = r(params["resnets"][i], x)
            x = a(params["attentions"][i], x)
        return self.up({}, x)


class UpBlock1DNoSkip(Module):
    def __init__(self, in_channels: int, out_channels: int, mid_channels: Optional[int] = None):
        super().__init__()
        mid_channels = in_channels if mid_channels is None else mid_channels
        self.resnets = ModuleList([
            ResConvBlock(2 * in_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, mid_channels),
            ResConvBlock(mid_channels, mid_channels, out_channels, is_last=True),
        ])

    def __call__(self, params: Params, x: jax.Array, res_hidden_states_tuple, temb=None):
        x = jnp.concatenate([x, res_hidden_states_tuple[-1]], axis=-1)
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x)
        return x


class UNetMidBlock1D(Module):
    def __init__(self, mid_channels: int, in_channels: int, out_channels: Optional[int] = None):
        super().__init__()
        out_channels = in_channels if out_channels is None else out_channels
        self.down = FixedDownsample1d("cubic")
        chans = [(in_channels, mid_channels, mid_channels)] + \
                [(mid_channels, mid_channels, mid_channels)] * 4 + \
                [(mid_channels, mid_channels, out_channels)]
        self.resnets = ModuleList([ResConvBlock(i, m, o) for i, m, o in chans])
        self.attentions = ModuleList(
            [SelfAttention1d(mid_channels, mid_channels // 32)] * 5 +
            [SelfAttention1d(out_channels, out_channels // 32)])
        self.up = FixedUpsample1d("cubic")

    def __call__(self, params: Params, x: jax.Array, temb=None) -> jax.Array:
        x = self.down({}, x)
        for i, (r, a) in enumerate(zip(self.resnets, self.attentions)):
            x = r(params["resnets"][i], x)
            x = a(params["attentions"][i], x)
        return self.up({}, x)


# ---------------------------------------------------------------------------
# RL / planner blocks (temporal resnets with FiLM time mixing)
# ---------------------------------------------------------------------------


class DownResnetBlock1D(Module):
    def __init__(self, in_channels: int, out_channels: Optional[int] = None, num_layers: int = 1,
                 temb_channels: int = 32, add_downsample: bool = True):
        super().__init__()
        out_channels = in_channels if out_channels is None else out_channels
        self.resnets = ModuleList(
            [ResidualTemporalBlock1D(in_channels, out_channels, embed_dim=temb_channels)] +
            [ResidualTemporalBlock1D(out_channels, out_channels, embed_dim=temb_channels)
             for _ in range(num_layers)])
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsample = Downsample1DConv(out_channels)

    def __call__(self, params: Params, x: jax.Array, temb: jax.Array):
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x, temb)
        out = (x,)
        if self.add_downsample:
            x = self.downsample(params["downsample"], x)
        return x, out


class UpResnetBlock1D(Module):
    def __init__(self, in_channels: int, out_channels: Optional[int] = None, num_layers: int = 1,
                 temb_channels: int = 32, add_upsample: bool = True):
        super().__init__()
        out_channels = in_channels if out_channels is None else out_channels
        self.resnets = ModuleList(
            [ResidualTemporalBlock1D(2 * in_channels, out_channels, embed_dim=temb_channels)] +
            [ResidualTemporalBlock1D(out_channels, out_channels, embed_dim=temb_channels)
             for _ in range(num_layers)])
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsample = Upsample1DConvT(out_channels, use_conv_transpose=True)

    def __call__(self, params: Params, x: jax.Array, res_hidden_states_tuple, temb: jax.Array):
        if res_hidden_states_tuple is not None:
            x = jnp.concatenate([x, res_hidden_states_tuple[-1]], axis=-1)
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x, temb)
        if self.add_upsample:
            x = self.upsample(params["upsample"], x)
        return x


class MidResTemporalBlock1D(Module):
    def __init__(self, in_channels: int, out_channels: int, embed_dim: int, num_layers: int = 1,
                 add_downsample: bool = False, add_upsample: bool = False):
        super().__init__()
        self.resnets = ModuleList(
            [ResidualTemporalBlock1D(in_channels, out_channels, embed_dim=embed_dim)] +
            [ResidualTemporalBlock1D(out_channels, out_channels, embed_dim=embed_dim)
             for _ in range(num_layers)])
        self.add_downsample = add_downsample
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsample = Upsample1DConvT(out_channels, use_conv_transpose=False)
        if add_downsample:
            self.downsample = Downsample1DConv(out_channels)

    def __call__(self, params: Params, x: jax.Array, temb: jax.Array) -> jax.Array:
        for i, r in enumerate(self.resnets):
            x = r(params["resnets"][i], x, temb)
        if self.add_upsample:
            x = self.upsample(params["upsample"], x)
        if self.add_downsample:
            x = self.downsample(params["downsample"], x)
        return x


class ValueFunctionMidBlock1D(Module):
    def __init__(self, in_channels: int, out_channels: int, embed_dim: int):
        super().__init__()
        self.res1 = ResidualTemporalBlock1D(in_channels, in_channels // 2, embed_dim=embed_dim)
        self.down1 = Downsample1DConv(out_channels // 2)
        self.res2 = ResidualTemporalBlock1D(in_channels // 2, in_channels // 4, embed_dim=embed_dim)
        self.down2 = Downsample1DConv(out_channels // 4)

    def __call__(self, params: Params, x: jax.Array, temb: jax.Array) -> jax.Array:
        x = self.res1(params["res1"], x, temb)
        x = self.down1(params["down1"], x)
        x = self.res2(params["res2"], x, temb)
        x = self.down2(params["down2"], x)
        return x


class OutConv1DBlock(Module):
    def __init__(self, num_groups_out: int, out_channels: int, embed_dim: int, act_fn: str):
        super().__init__()
        self.final_conv1d_1 = Conv1d(embed_dim, embed_dim, kernel_size=5, padding=2)
        self.final_conv1d_gn = GroupNorm(num_groups_out, embed_dim)
        self.act = get_activation(act_fn)
        self.final_conv1d_2 = Conv1d(embed_dim, out_channels, kernel_size=1)

    def __call__(self, params: Params, x: jax.Array, temb=None) -> jax.Array:
        x = self.final_conv1d_1(params["final_conv1d_1"], x)
        x = self.act(self.final_conv1d_gn(params["final_conv1d_gn"], x))
        return self.final_conv1d_2(params["final_conv1d_2"], x)


class OutValueFunctionBlock(Module):
    def __init__(self, fc_dim: int, embed_dim: int, act_fn: str = "mish"):
        super().__init__()
        self.fc1 = Linear(fc_dim + embed_dim, fc_dim // 2)
        self.act = get_activation(act_fn)
        self.fc2 = Linear(fc_dim // 2, 1)

    def __call__(self, params: Params, x: jax.Array, temb: jax.Array) -> jax.Array:
        x = x.reshape(x.shape[0], -1)
        x = jnp.concatenate([x, temb], axis=-1)
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))

    def convert_torch_param(self, pname, tensor):
        # reference stores the two linears inside an nn.ModuleList "final_block"
        return pname, tensor


def get_down_block(down_block_type: str, num_layers: int, in_channels: int, out_channels: int,
                   temb_channels: int, add_downsample: bool):
    if down_block_type == "DownResnetBlock1D":
        return DownResnetBlock1D(in_channels=in_channels, num_layers=num_layers,
                                 out_channels=out_channels, temb_channels=temb_channels,
                                 add_downsample=add_downsample)
    if down_block_type == "DownBlock1D":
        return DownBlock1D(out_channels=out_channels, in_channels=in_channels)
    if down_block_type == "AttnDownBlock1D":
        return AttnDownBlock1D(out_channels=out_channels, in_channels=in_channels)
    if down_block_type == "DownBlock1DNoSkip":
        return DownBlock1DNoSkip(out_channels=out_channels, in_channels=in_channels)
    raise ValueError(f"{down_block_type} does not exist.")


def get_up_block(up_block_type: str, num_layers: int, in_channels: int, out_channels: int,
                 temb_channels: int, add_upsample: bool):
    if up_block_type == "UpResnetBlock1D":
        return UpResnetBlock1D(in_channels=in_channels, num_layers=num_layers,
                               out_channels=out_channels, temb_channels=temb_channels,
                               add_upsample=add_upsample)
    if up_block_type == "UpBlock1D":
        return UpBlock1D(in_channels=in_channels, out_channels=out_channels)
    if up_block_type == "AttnUpBlock1D":
        return AttnUpBlock1D(in_channels=in_channels, out_channels=out_channels)
    if up_block_type == "UpBlock1DNoSkip":
        return UpBlock1DNoSkip(in_channels=in_channels, out_channels=out_channels)
    raise ValueError(f"{up_block_type} does not exist.")


def get_mid_block(mid_block_type: str, num_layers: int, in_channels: int, mid_channels: int,
                  out_channels: int, embed_dim: int, add_downsample: bool):
    if mid_block_type == "MidResTemporalBlock1D":
        return MidResTemporalBlock1D(num_layers=num_layers, in_channels=in_channels,
                                     out_channels=out_channels, embed_dim=embed_dim,
                                     add_downsample=add_downsample)
    if mid_block_type == "ValueFunctionMidBlock1D":
        return ValueFunctionMidBlock1D(in_channels=in_channels, out_channels=out_channels,
                                       embed_dim=embed_dim)
    if mid_block_type == "UNetMidBlock1D":
        return UNetMidBlock1D(in_channels=in_channels, mid_channels=mid_channels,
                              out_channels=out_channels)
    raise ValueError(f"{mid_block_type} does not exist.")


def get_out_block(*, out_block_type: str, num_groups_out: int, embed_dim: int, out_channels: int,
                  act_fn: str, fc_dim: int):
    if out_block_type == "OutConv1DBlock":
        return OutConv1DBlock(num_groups_out, out_channels, embed_dim, act_fn)
    if out_block_type == "ValueFunction":
        return OutValueFunctionBlock(fc_dim, embed_dim, act_fn)
    return None
