"""ResNet blocks and up/down sampling for UNet/VAE backbones.

Behavioral mirror of the reference `models/resnet.py` (ResnetBlock2D `:159`,
Upsample2D/Downsample2D in `models/upsampling.py`/`downsampling.py`), on NHWC
activations. Param subtree names (norm1/conv1/time_emb_proj/norm2/conv2/
conv_shortcut, downsamplers.0.conv, upsamplers.0.conv) match reference
state-dict keys.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.attention import _on_tpu
from ..ops.module import Conv2d, GroupNorm, Linear, Module, Params, get_activation


def _fused_gn_silu(norm: GroupNorm, params: Params, x: jax.Array) -> jax.Array:
    """GroupNorm+SiLU via the Pallas kernel when profitable (large spatial,
    lane-aligned channels, on TPU); None → caller uses the jnp path.

    Opt-in via DIFFUSERS_TPU_FUSED_GN=1: measured end-to-end on the SDXL UNet
    the lone pallas_call REGRESSES (122.6 → 138.4 ms) — XLA already fuses the
    GN statistics/apply into neighboring producers/consumers, and the kernel
    boundary breaks those fusions. Kept for workloads where GN stands alone.
    """
    from ..utils import constants

    if not constants.DIFFUSERS_TPU_FUSED_GN:
        return None
    b, h, w, c = x.shape
    if not _on_tpu() or c % 128 != 0 or (h * w) < 4096 or (h * w) % 16 != 0:
        return None
    from ..ops.pallas.group_norm import group_norm_silu_nhwc

    return group_norm_silu_nhwc(x, params["scale"], params["bias"], norm.num_groups, eps=norm.eps)


class Upsample2D(Module):
    """Nearest-neighbor 2x upsample + optional conv (reference upsampling.py:50)."""

    def __init__(self, channels: int, use_conv: bool = False, out_channels: Optional[int] = None):
        super().__init__()
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_conv = use_conv
        if use_conv:
            self.conv = Conv2d(self.channels, self.out_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        # nearest-neighbor x2 (torch F.interpolate mode="nearest")
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.use_conv:
            x = self.conv(params["conv"], x)
        return x


class Downsample2D(Module):
    """Stride-2 conv (or avg-pool) downsample (reference downsampling.py:49)."""

    def __init__(self, channels: int, use_conv: bool = False, out_channels: Optional[int] = None, padding: int = 1):
        super().__init__()
        self.channels = channels
        self.out_channels = out_channels or channels
        self.use_conv = use_conv
        self.padding = padding
        if use_conv:
            self.conv = Conv2d(self.channels, self.out_channels, kernel_size=3, stride=2, padding=padding)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.use_conv:
            if self.padding == 0:
                # asymmetric (0,1) pad, matching torch F.pad((0,1,0,1))
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return self.conv(params["conv"], x)
        # avg-pool stride 2
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0


class SpatialNorm(Module):
    """GN(f) modulated by a latent map: f̂·conv_y(zq)+conv_b(zq) (reference
    normalization.py SpatialNorm; MoVQ decoder)."""

    def __init__(self, f_channels: int, zq_channels: int):
        super().__init__()
        self.norm_layer = GroupNorm(num_groups=32, num_channels=f_channels, eps=1e-6)
        self.conv_y = Conv2d(zq_channels, f_channels, kernel_size=1, padding=0)
        self.conv_b = Conv2d(zq_channels, f_channels, kernel_size=1, padding=0)

    def __call__(self, params: Params, f: jax.Array, zq: jax.Array) -> jax.Array:
        # torch F.interpolate(nearest): floor indexing
        hi = (jnp.arange(f.shape[1]) * (zq.shape[1] / f.shape[1])).astype(jnp.int32)
        wi = (jnp.arange(f.shape[2]) * (zq.shape[2] / f.shape[2])).astype(jnp.int32)
        zq_r = zq[:, hi][:, :, wi]
        normed = self.norm_layer(params["norm_layer"], f)
        return normed * self.conv_y(params["conv_y"], zq_r) + self.conv_b(params["conv_b"], zq_r)


class ResnetBlock2D(Module):
    """norm→act→conv ×2 with timestep conditioning (reference resnet.py:159)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: Optional[int] = None,
        temb_channels: Optional[int] = 512,
        groups: int = 32,
        groups_out: Optional[int] = None,
        eps: float = 1e-6,
        non_linearity: str = "swish",
        time_embedding_norm: str = "default",
        output_scale_factor: float = 1.0,
        use_in_shortcut: Optional[bool] = None,
        conv_shortcut_bias: bool = True,
        skip_time_act: bool = False,
        up: bool = False,
        down: bool = False,
        conv_2d_out_channels: Optional[int] = None,
    ):
        super().__init__()
        self.in_channels = in_channels
        out_channels = in_channels if out_channels is None else out_channels
        self.out_channels = out_channels
        self.time_embedding_norm = time_embedding_norm
        self.output_scale_factor = output_scale_factor
        self.skip_time_act = skip_time_act
        self.up = up
        self.down = down
        groups_out = groups_out or groups

        if time_embedding_norm == "spatial":
            self.norm1 = SpatialNorm(in_channels, temb_channels)
        else:
            self.norm1 = GroupNorm(num_groups=groups, num_channels=in_channels, eps=eps)
        self.conv1 = Conv2d(in_channels, out_channels, kernel_size=3, stride=1, padding=1)

        if temb_channels is not None and time_embedding_norm != "spatial":
            if time_embedding_norm == "default":
                self.time_emb_proj = Linear(temb_channels, out_channels)
            elif time_embedding_norm == "scale_shift":
                self.time_emb_proj = Linear(temb_channels, 2 * out_channels)
            else:
                raise ValueError(f"unknown time_embedding_norm: {time_embedding_norm}")
        else:
            self.time_emb_proj = None

        if time_embedding_norm == "spatial":
            self.norm2 = SpatialNorm(out_channels, temb_channels)
        else:
            self.norm2 = GroupNorm(num_groups=groups_out, num_channels=out_channels, eps=eps)
        conv_2d_out_channels = conv_2d_out_channels or out_channels
        self.conv2 = Conv2d(out_channels, conv_2d_out_channels, kernel_size=3, stride=1, padding=1)
        self.nonlinearity = get_activation(non_linearity)

        if up:
            self.upsample = Upsample2D(in_channels, use_conv=False)
        elif down:
            self.downsample = Downsample2D(in_channels, use_conv=False, padding=1)

        self.use_in_shortcut = (in_channels != conv_2d_out_channels) if use_in_shortcut is None else use_in_shortcut
        if self.use_in_shortcut:
            self.conv_shortcut = Conv2d(
                in_channels, conv_2d_out_channels, kernel_size=1, stride=1, padding=0, use_bias=conv_shortcut_bias
            )

    def __call__(self, params: Params, input_tensor: jax.Array, temb: Optional[jax.Array]) -> jax.Array:
        use_fused_gn = (
            self.nonlinearity is get_activation("silu")
            and not (self.up or self.down)
            and self.time_embedding_norm != "spatial"
        )
        hidden_states = _fused_gn_silu(self.norm1, params["norm1"], input_tensor) if use_fused_gn else None
        if hidden_states is None:
            if self.time_embedding_norm == "spatial":
                hidden_states = self.norm1(params["norm1"], input_tensor, temb)
            else:
                hidden_states = self.norm1(params["norm1"], input_tensor)
            hidden_states = self.nonlinearity(hidden_states)

        if self.up:
            input_tensor = self.upsample({}, input_tensor)
            hidden_states = self.upsample({}, hidden_states)
        elif self.down:
            input_tensor = self.downsample({}, input_tensor)
            hidden_states = self.downsample({}, hidden_states)

        hidden_states = self.conv1(params["conv1"], hidden_states)

        if self.time_emb_proj is not None and temb is not None:
            if not self.skip_time_act:
                temb = self.nonlinearity(temb)
            temb = self.time_emb_proj(params["time_emb_proj"], temb)[:, None, None, :]  # NHWC broadcast

        fused2 = None
        if self.time_embedding_norm == "default":
            if self.time_emb_proj is not None and temb is not None:
                hidden_states = hidden_states + temb
            fused2 = _fused_gn_silu(self.norm2, params["norm2"], hidden_states) if use_fused_gn else None
            if fused2 is None:
                hidden_states = self.norm2(params["norm2"], hidden_states)
        elif self.time_embedding_norm == "scale_shift":
            scale, shift = jnp.split(temb, 2, axis=-1)
            hidden_states = self.norm2(params["norm2"], hidden_states)
            hidden_states = hidden_states * (1 + scale) + shift
        elif self.time_embedding_norm == "spatial":
            hidden_states = self.norm2(params["norm2"], hidden_states, temb)

        hidden_states = fused2 if fused2 is not None else self.nonlinearity(hidden_states)
        hidden_states = self.conv2(params["conv2"], hidden_states)

        if self.use_in_shortcut:
            input_tensor = self.conv_shortcut(params["conv_shortcut"], input_tensor)

        return (input_tensor + hidden_states) / self.output_scale_factor


# --------------------------------------------------------------------------
# SVD spatio-temporal blocks (reference models/resnet.py:546,639,723)


class TemporalResnetBlock(Module):
    """Resnet over the frame axis: 3D convs with kernel (3,1,1) on
    [B, F, H, W, C] activations (reference resnet.py:546)."""

    def __init__(self, in_channels: int, out_channels: Optional[int] = None,
                 temb_channels: Optional[int] = 512, eps: float = 1e-6):
        super().__init__()
        from ..ops.module import Conv3d  # local import; resnet.py predates Conv3d

        out_channels = in_channels if out_channels is None else out_channels
        self.norm1 = GroupNorm(num_groups=32, num_channels=in_channels, eps=eps)
        self.conv1 = Conv3d(in_channels, out_channels, kernel_size=(3, 1, 1), padding=(1, 0, 0))
        self.time_emb_proj = Linear(temb_channels, out_channels) if temb_channels is not None else None
        self.norm2 = GroupNorm(num_groups=32, num_channels=out_channels, eps=eps)
        self.conv2 = Conv3d(out_channels, out_channels, kernel_size=(3, 1, 1), padding=(1, 0, 0))
        self.nonlinearity = get_activation("silu")
        self.use_in_shortcut = in_channels != out_channels
        if self.use_in_shortcut:
            self.conv_shortcut = Conv3d(in_channels, out_channels, kernel_size=1)

    def __call__(self, params: Params, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        # x: [B, F, H, W, C]; temb: [B, F, temb_channels]
        h = self.norm1(params["norm1"], x)
        h = self.nonlinearity(h)
        h = self.conv1(params["conv1"], h)
        if self.time_emb_proj is not None and temb is not None:
            t = self.time_emb_proj(params["time_emb_proj"], self.nonlinearity(temb))
            h = h + t[:, :, None, None, :]
        h = self.norm2(params["norm2"], h)
        h = self.nonlinearity(h)
        h = self.conv2(params["conv2"], h)
        if self.use_in_shortcut:
            x = self.conv_shortcut(params["conv_shortcut"], x)
        return x + h


class AlphaBlender(Module):
    """Learned spatial/temporal blend (reference resnet.py:723)."""

    strategies = ("learned", "fixed", "learned_with_images")

    def __init__(self, alpha: float, merge_strategy: str = "learned_with_images",
                 switch_spatial_to_temporal_mix: bool = False):
        super().__init__()
        if merge_strategy not in self.strategies:
            raise ValueError(f"merge_strategy needs to be in {self.strategies}")
        self.alpha = alpha
        self.merge_strategy = merge_strategy
        self.switch_spatial_to_temporal_mix = switch_spatial_to_temporal_mix

    def init(self, key, dtype=jnp.float32) -> Params:
        # "fixed" stores a buffer; learned variants a trainable scalar — same
        # param tree entry either way (reference registers buffer vs Parameter)
        return {"mix_factor": jnp.full((1,), self.alpha, dtype=dtype)}

    def get_alpha(self, params: Params, image_only_indicator: jax.Array, ndims: int) -> jax.Array:
        if self.merge_strategy == "fixed":
            return params["mix_factor"]
        if self.merge_strategy == "learned":
            return jax.nn.sigmoid(params["mix_factor"])
        # learned_with_images: per-(batch, frame) alpha, 1 where image-only
        alpha = jnp.where(
            image_only_indicator.astype(bool),
            jnp.ones((1, 1), dtype=params["mix_factor"].dtype),
            jax.nn.sigmoid(params["mix_factor"])[..., None],
        )  # [B, F]
        if ndims == 5:  # [B, F, H, W, C]
            return alpha[:, :, None, None, None]
        if ndims == 3:  # [B*F, S, C]
            return alpha.reshape(-1)[:, None, None]
        raise ValueError(f"Unexpected ndims {ndims}")

    def __call__(self, params: Params, x_spatial: jax.Array, x_temporal: jax.Array,
                 image_only_indicator: Optional[jax.Array] = None) -> jax.Array:
        alpha = self.get_alpha(params, image_only_indicator, x_spatial.ndim).astype(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class SpatioTemporalResBlock(Module):
    """Spatial ResnetBlock2D + TemporalResnetBlock + AlphaBlender
    (reference resnet.py:639). Operates on [B*F, H, W, C] with the frame count
    taken from `image_only_indicator` [B, F]."""

    def __init__(self, in_channels: int, out_channels: Optional[int] = None,
                 temb_channels: Optional[int] = 512, eps: float = 1e-6,
                 temporal_eps: Optional[float] = None, merge_factor: float = 0.5,
                 merge_strategy: str = "learned_with_images",
                 switch_spatial_to_temporal_mix: bool = False):
        super().__init__()
        self.spatial_res_block = ResnetBlock2D(
            in_channels=in_channels, out_channels=out_channels, temb_channels=temb_channels, eps=eps
        )
        oc = out_channels if out_channels is not None else in_channels
        self.temporal_res_block = TemporalResnetBlock(
            in_channels=oc, out_channels=oc, temb_channels=temb_channels,
            eps=temporal_eps if temporal_eps is not None else eps,
        )
        self.time_mixer = AlphaBlender(
            alpha=merge_factor, merge_strategy=merge_strategy,
            switch_spatial_to_temporal_mix=switch_spatial_to_temporal_mix,
        )

    def __call__(self, params: Params, hidden_states: jax.Array,
                 temb: Optional[jax.Array] = None,
                 image_only_indicator: Optional[jax.Array] = None) -> jax.Array:
        num_frames = image_only_indicator.shape[-1]
        hidden_states = self.spatial_res_block(params["spatial_res_block"], hidden_states, temb)

        bf, height, width, channels = hidden_states.shape
        batch = bf // num_frames
        h5 = hidden_states.reshape(batch, num_frames, height, width, channels)
        temb5 = temb.reshape(batch, num_frames, -1) if temb is not None else None
        mixed = self.temporal_res_block(params["temporal_res_block"], h5, temb5)
        mixed = self.time_mixer(params["time_mixer"], h5, mixed, image_only_indicator=image_only_indicator)
        return mixed.reshape(bf, height, width, channels)
