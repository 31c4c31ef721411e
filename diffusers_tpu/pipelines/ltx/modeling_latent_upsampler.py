"""LTX latent upsampler (spatial/temporal 2x in latent space).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ltx/modeling_latent_upsampler.py:79`
LTXLatentUpsamplerModel): initial conv+GN+SiLU, N ResBlocks, a
pixel-shuffle upsampler (2D conv per frame for spatial-only — even in
dims==3 — 3D conv otherwise; temporal mode drops the first upsampled
frame), N post ResBlocks, final conv.

TPU-first: channels-last activations (NDHWC/NHWC) so every conv hits the
XLA conv→MXU path; the pixel shuffle is a reshape+transpose pair that XLA
fuses with the producing conv. Public I/O keeps the pipeline's [B, C, F, H,
W] layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.modeling_utils import ModelMixin
from ...ops.module import Conv2d, Conv3d, GroupNorm, Module, ModuleList, Params


class _ResBlock(Module):
    def __init__(self, channels: int, dims: int = 3):
        super().__init__()
        Conv = Conv2d if dims == 2 else Conv3d
        self.conv1 = Conv(channels, channels, kernel_size=3, padding=1)
        self.norm1 = GroupNorm(32, channels)
        self.conv2 = Conv(channels, channels, kernel_size=3, padding=1)
        self.norm2 = GroupNorm(32, channels)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        residual = x
        x = jax.nn.silu(self.norm1(params["norm1"], self.conv1(params["conv1"], x)))
        x = self.norm2(params["norm2"], self.conv2(params["conv2"], x))
        return jax.nn.silu(x + residual)


def _shuffle_spatial(x: jax.Array) -> jax.Array:
    """[N, H, W, c*2*2] (torch channel order c,p1,p2) → [N, 2H, 2W, c]."""
    n, h, w, cpp = x.shape
    c = cpp // 4
    x = x.reshape(n, h, w, c, 2, 2)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # N, H, p1, W, p2, c
    return x.reshape(n, 2 * h, 2 * w, c)


def _shuffle_spatiotemporal(x: jax.Array) -> jax.Array:
    """[B, D, H, W, c*8] (torch order c,p1,p2,p3) → [B, 2D, 2H, 2W, c]."""
    b, d, h, w, cp = x.shape
    c = cp // 8
    x = x.reshape(b, d, h, w, c, 2, 2, 2)
    x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))  # B, D,p1, H,p2, W,p3, c
    return x.reshape(b, 2 * d, 2 * h, 2 * w, c)


def _shuffle_temporal(x: jax.Array) -> jax.Array:
    """[B, D, H, W, c*2] (torch order c,p1) → [B, 2D, H, W, c]."""
    b, d, h, w, cp = x.shape
    c = cp // 2
    x = x.reshape(b, d, h, w, c, 2)
    x = jnp.transpose(x, (0, 1, 5, 2, 3, 4))  # B, D, p1, H, W, c
    return x.reshape(b, 2 * d, h, w, c)


class LTXLatentUpsamplerModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 128,
        mid_channels: int = 512,
        num_blocks_per_stage: int = 4,
        dims: int = 3,
        spatial_upsample: bool = True,
        temporal_upsample: bool = False,
    ):
        super().__init__()
        if not (spatial_upsample or temporal_upsample):
            raise ValueError("Either spatial_upsample or temporal_upsample must be True")
        Conv = Conv2d if dims == 2 else Conv3d
        self.initial_conv = Conv(in_channels, mid_channels, kernel_size=3, padding=1)
        self.initial_norm = GroupNorm(32, mid_channels)
        self.res_blocks = ModuleList([_ResBlock(mid_channels, dims) for _ in range(num_blocks_per_stage)])
        if spatial_upsample and temporal_upsample:
            self.upsampler = ModuleList([Conv3d(mid_channels, 8 * mid_channels, kernel_size=3, padding=1)])
        elif spatial_upsample:
            # reference uses a per-frame 2D conv here even when dims == 3
            self.upsampler = ModuleList([Conv2d(mid_channels, 4 * mid_channels, kernel_size=3, padding=1)])
        else:
            self.upsampler = ModuleList([Conv3d(mid_channels, 2 * mid_channels, kernel_size=3, padding=1)])
        self.post_upsample_res_blocks = ModuleList(
            [_ResBlock(mid_channels, dims) for _ in range(num_blocks_per_stage)]
        )
        self.final_conv = Conv(mid_channels, in_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        """hidden_states: [B, C, F, H, W] → upsampled [B, C, F', H', W']."""
        cfg = self.config
        b = hidden_states.shape[0]
        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1))  # B, F, H, W, C

        def per_frame(fn):
            nonlocal x
            f = x.shape[1]
            x = x.reshape((b * f,) + x.shape[2:])
            x = fn(x)
            x = x.reshape((b, f) + x.shape[1:])

        if cfg.dims == 2:
            f = x.shape[1]
            x = x.reshape((b * f,) + x.shape[2:])
            x = jax.nn.silu(self.initial_norm(params["initial_norm"],
                                              self.initial_conv(params["initial_conv"], x)))
            for i, blk in enumerate(self.res_blocks):
                x = blk(params["res_blocks"][i], x)
            x = _shuffle_spatial(self.upsampler[0](params["upsampler"][0], x))
            for i, blk in enumerate(self.post_upsample_res_blocks):
                x = blk(params["post_upsample_res_blocks"][i], x)
            x = self.final_conv(params["final_conv"], x)
            x = x.reshape((b, f) + x.shape[1:])
        else:
            x = jax.nn.silu(self.initial_norm(params["initial_norm"],
                                              self.initial_conv(params["initial_conv"], x)))
            for i, blk in enumerate(self.res_blocks):
                x = blk(params["res_blocks"][i], x)
            if cfg.spatial_upsample and cfg.temporal_upsample:
                x = _shuffle_spatiotemporal(self.upsampler[0](params["upsampler"][0], x))
                x = x[:, 1:]  # temporal modes drop the first upsampled frame (`:176-178`)
            elif cfg.temporal_upsample:
                x = _shuffle_temporal(self.upsampler[0](params["upsampler"][0], x))
                x = x[:, 1:]
            else:
                per_frame(lambda xf: _shuffle_spatial(self.upsampler[0](params["upsampler"][0], xf)))
            for i, blk in enumerate(self.post_upsample_res_blocks):
                x = blk(params["post_upsample_res_blocks"][i], x)
            x = self.final_conv(params["final_conv"], x)

        return jnp.transpose(x, (0, 4, 1, 2, 3))  # back to B, C, F, H, W
