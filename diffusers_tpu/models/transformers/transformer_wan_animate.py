"""Wan2.2-Animate transformer (character animation/replacement).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_wan_animate.py:986`
WanAnimateTransformer3DModel): the Wan block stack plus Animate's
conditioning — a StyleGAN-lineage motion encoder over face frames
(scaled convs + fused leaky-ReLU + FIR blur, QR-orthogonalized linear
motion decomposition `:282-353`), a causal-conv face encoder producing
per-frame multi-head motion tokens with a learned padding token (`:356`),
a pose latent stream added to all-but-the-first patch frames (`:1224`),
and temporally-aligned face cross-attention injected after every
`inject_face_latents_blocks`-th block (`:422-545, :1269`).

TPU-first: the face adapter's per-frame grouping is a reshape (S must
divide by T, as in the reference); the motion encoder runs over all face
frames in one batched conv stack (no host-side micro-batching — HBM is the
only reason the reference splits, and XLA schedules the convs directly);
the QR step runs in fp32 via jnp.linalg.qr.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv1d, Conv2d, Conv3d, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ..modeling_utils import ModelMixin
from .transformer_wan import (
    Transformer3DModelOutput,
    WanRotaryPosEmbed,
    WanTimeTextImageEmbedding,
    WanTransformerBlock,
)

WAN_ANIMATE_MOTION_ENCODER_CHANNEL_SIZES = {
    "4": 512, "8": 512, "16": 512, "32": 512, "64": 256, "128": 128, "256": 64, "512": 32, "1024": 16,
}


def _fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jax.nn.leaky_relu(x, negative_slope) * scale


class _FusedLeakyReLU(Module):
    """Channel-bias + leaky-ReLU * sqrt(2) (reference FusedLeakyReLU `:81`);
    exists as a child module so `act_fn.bias` checkpoint keys resolve."""

    def __init__(self, channels: int):
        super().__init__()
        self.channels = channels

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"bias": jnp.zeros((self.channels,), dtype)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return _fused_leaky_relu(x, params["bias"])


class MotionConv2d(Module):
    """Scaled conv (weight * 1/sqrt(fan_in)) + optional FIR blur + fused
    leaky-ReLU with channel bias (reference `:111`). NHWC activations."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 bias=True, blur_kernel=None, blur_upsample_factor=1, use_activation=True):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.use_activation = use_activation
        self.has_plain_bias = bias and not use_activation
        self.scale = 1 / math.sqrt(in_channels * kernel_size ** 2)
        if use_activation:
            self.act_fn = _FusedLeakyReLU(out_channels)
        self.blur_kernel = None
        if blur_kernel is not None:
            p = (len(blur_kernel) - stride) + (kernel_size - 1)
            self.blur_padding = ((p + 1) // 2, p // 2)
            k = np.asarray(blur_kernel, np.float32)
            k = k[None, :] * k[:, None]
            k = k / k.sum()
            if blur_upsample_factor > 1:
                k = k * (blur_upsample_factor ** 2)
            self.blur_kernel = k

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["weight"] = jax.random.normal(
            key, (self.kernel_size, self.kernel_size, self.in_channels, self.out_channels), dtype)
        if self.has_plain_bias:
            params["bias"] = jnp.zeros((self.out_channels,), dtype)
        return params

    def convert_torch_param(self, pname, tensor):
        if pname == "weight":  # OIHW -> HWIO
            return pname, tensor.transpose(2, 3, 1, 0)
        return pname, tensor

    def convert_param_to_torch(self, pname, array):
        if pname == "weight":
            return pname, array.transpose(3, 2, 0, 1)
        return pname, array

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.blur_kernel is not None:
            c = x.shape[-1]
            bk = jnp.broadcast_to(jnp.asarray(self.blur_kernel)[:, :, None, None],
                                  self.blur_kernel.shape + (1, c)).astype(x.dtype)
            x = jax.lax.conv_general_dilated(
                x, bk, window_strides=(1, 1),
                padding=(self.blur_padding, self.blur_padding),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
        kernel = (params["weight"] * self.scale).astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding),) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.has_plain_bias:
            x = x + params["bias"].astype(x.dtype)
        if self.use_activation:
            x = self.act_fn(params["act_fn"], x)
        return x


class MotionLinear(Module):
    def __init__(self, in_dim, out_dim, bias=True, use_activation=False):
        super().__init__()
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.use_activation = use_activation
        self.has_plain_bias = bias and not use_activation
        self.scale = 1 / math.sqrt(in_dim)
        if use_activation:
            self.act_fn = _FusedLeakyReLU(out_dim)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["weight"] = jax.random.normal(key, (self.out_dim, self.in_dim), dtype)
        if self.has_plain_bias:
            params["bias"] = jnp.zeros((self.out_dim,), dtype)
        return params

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        out = x @ (params["weight"].astype(x.dtype) * self.scale).T
        if self.has_plain_bias:
            out = out + params["bias"].astype(x.dtype)
        if self.use_activation:
            out = self.act_fn(params["act_fn"], out)
        return out


class MotionEncoderResBlock(Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, kernel_size_skip=1,
                 blur_kernel=(1, 3, 3, 1), downsample_factor=2):
        super().__init__()
        self.conv1 = MotionConv2d(in_channels, in_channels, kernel_size, stride=1,
                                  padding=kernel_size // 2, use_activation=True)
        self.conv2 = MotionConv2d(in_channels, out_channels, kernel_size, stride=downsample_factor,
                                  padding=0, blur_kernel=blur_kernel, use_activation=True)
        self.conv_skip = MotionConv2d(in_channels, out_channels, kernel_size_skip,
                                      stride=downsample_factor, padding=0, bias=False,
                                      blur_kernel=blur_kernel, use_activation=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.conv1(params["conv1"], x)
        h = self.conv2(params["conv2"], h)
        skip = self.conv_skip(params["conv_skip"], x)
        return (h + skip) / math.sqrt(2)


class WanAnimateMotionEncoder(Module):
    def __init__(self, size=512, style_dim=512, motion_dim=20, out_dim=512,
                 motion_blocks=5, channels=None):
        super().__init__()
        self.size = size
        self.out_dim = out_dim
        self.motion_dim = motion_dim
        if channels is None:
            channels = WAN_ANIMATE_MOTION_ENCODER_CHANNEL_SIZES
        self.conv_in = MotionConv2d(3, channels[str(size)], 1, use_activation=True)
        blocks = []
        in_channels = channels[str(size)]
        log_size = int(math.log(size, 2))
        for i in range(log_size, 2, -1):
            out_channels = channels[str(2 ** (i - 1))]
            blocks.append(MotionEncoderResBlock(in_channels, out_channels))
            in_channels = out_channels
        self.res_blocks = ModuleList(blocks)
        self.conv_out = MotionConv2d(in_channels, style_dim, 4, padding=0, bias=False,
                                     use_activation=False)
        linears = [MotionLinear(style_dim, style_dim) for _ in range(motion_blocks - 1)]
        linears.append(MotionLinear(style_dim, motion_dim))
        self.motion_network = ModuleList(linears)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["motion_synthesis_weight"] = jax.random.normal(
            jax.random.fold_in(key, 3), (self.out_dim, self.motion_dim), dtype)
        return params

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def __call__(self, params: Params, face_image: jax.Array) -> jax.Array:
        """face_image: [N, 3, size, size] → motion vec [N, out_dim]."""
        if face_image.shape[-1] != self.size or face_image.shape[-2] != self.size:
            raise ValueError(f"face frames must be {self.size}x{self.size}, got {face_image.shape}")
        x = jnp.transpose(face_image, (0, 2, 3, 1))  # NCHW → NHWC
        x = self.conv_in(params["conv_in"], x)
        for i, block in enumerate(self.res_blocks):
            x = block(params["res_blocks"][i], x)
        x = self.conv_out(params["conv_out"], x)
        motion_feat = x.reshape(x.shape[0], -1)  # 1x1 spatial left
        for i, lin in enumerate(self.motion_network):
            motion_feat = lin(params["motion_network"][i], motion_feat)
        # linear motion decomposition: QR-orthogonalize the synthesis basis
        weight = params["motion_synthesis_weight"].astype(jnp.float32) + 1e-8
        q = jnp.linalg.qr(weight)[0]
        motion = motion_feat.astype(jnp.float32)
        # diag_embed(motion) @ Q.T summed over the motion dim = motion @ Q.T... row-wise:
        # sum_j diag(m)_ij * Q.T_j: = m_i * Q[:, i] summed → motion @ Q.T
        motion_vec = motion @ q.T
        return motion_vec.astype(motion_feat.dtype)


class WanAnimateFaceEncoder(Module):
    def __init__(self, in_dim, out_dim, hidden_dim=1024, num_heads=4, kernel_size=3, eps=1e-6):
        super().__init__()
        self.num_heads = num_heads
        self.out_dim = out_dim
        self.kernel_size = kernel_size
        self.conv1_local = Conv1d(in_dim, hidden_dim * num_heads, kernel_size=kernel_size, stride=1)
        self.conv2 = Conv1d(hidden_dim, hidden_dim, kernel_size, stride=2)
        self.conv3 = Conv1d(hidden_dim, hidden_dim, kernel_size, stride=2)
        self.norm1 = LayerNorm(hidden_dim, eps=eps, use_scale=False, use_bias=False)
        self.norm2 = LayerNorm(hidden_dim, eps=eps, use_scale=False, use_bias=False)
        self.norm3 = LayerNorm(hidden_dim, eps=eps, use_scale=False, use_bias=False)
        self.out_proj = Linear(hidden_dim, out_dim)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["padding_tokens"] = jnp.zeros((1, 1, 1, self.out_dim), dtype)
        return params

    def convert_torch_param(self, pname, tensor):
        return pname, tensor

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        """x: [B, T, in_dim] → [B, T', num_heads+1, out_dim] (causal replicate pads)."""
        b = x.shape[0]
        pad = self.kernel_size - 1

        def causal(conv, p, h):
            h = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)), mode="edge")
            return conv(p, h)

        h = causal(self.conv1_local, params["conv1_local"], x)  # [B, T, N*hidden]
        n = self.num_heads
        hidden = h.shape[-1] // n
        h = h.reshape(b, h.shape[1], n, hidden)
        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(b * n, h.shape[1], hidden)
        h = jax.nn.silu(self.norm1({}, h))
        h = jax.nn.silu(self.norm2({}, causal(self.conv2, params["conv2"], h)))
        h = jax.nn.silu(self.norm3({}, causal(self.conv3, params["conv3"], h)))
        h = self.out_proj(params["out_proj"], h)
        h = h.reshape(b, n, h.shape[1], -1)
        h = jnp.transpose(h, (0, 2, 1, 3))  # [B, T', N, out]
        padding = jnp.broadcast_to(params["padding_tokens"].astype(h.dtype),
                                   (b, h.shape[1], 1, h.shape[-1]))
        return jnp.concatenate([h, padding], axis=-2)  # [B, T', N+1, out]


class WanAnimateFaceBlockCrossAttention(Module):
    """Per-frame-group cross attention with the face motion tokens
    (reference `:493`): each temporal group of S/T latent tokens attends to
    that frame's N+1 motion tokens."""

    def __init__(self, dim, heads=8, dim_head=64, eps=1e-6, cross_attention_dim_head=None, bias=True):
        super().__init__()
        self.heads = heads
        inner = dim_head * heads
        kv_inner = inner if cross_attention_dim_head is None else cross_attention_dim_head * heads
        self.pre_norm_q = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.pre_norm_kv = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.to_q = Linear(dim, inner, use_bias=bias)
        self.to_k = Linear(dim, kv_inner, use_bias=bias)
        self.to_v = Linear(dim, kv_inner, use_bias=bias)
        self.to_out = Linear(inner, dim, use_bias=bias)
        self.norm_q = RMSNorm(dim_head, eps=eps)
        self.norm_k = RMSNorm(dim_head, eps=eps)

    def __call__(self, params: Params, hidden_states: jax.Array,
                 motion_vec: jax.Array) -> jax.Array:
        b, s, dim = hidden_states.shape
        _, t, n, _ = motion_vec.shape
        if s % t != 0:
            raise ValueError(f"latent sequence {s} must divide by motion frames {t}")
        q_in = self.pre_norm_q({}, hidden_states)
        kv_in = self.pre_norm_kv({}, motion_vec).reshape(b, t * n, -1)
        q = self.to_q(params["to_q"], q_in).reshape(b, s, self.heads, -1)
        k = self.to_k(params["to_k"], kv_in).reshape(b, t, n, self.heads, -1)
        v = self.to_v(params["to_v"], kv_in).reshape(b, t, n, self.heads, -1)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)
        q = q.reshape(b * t, s // t, self.heads, -1)
        k = k.reshape(b * t, n, self.heads, -1)
        v = v.reshape(b * t, n, self.heads, -1)
        out = dispatch_attention_fn(q, k, v).reshape(b, s, -1)
        return self.to_out(params["to_out"], out)


class WanAnimateTransformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: Tuple[int, ...] = (1, 2, 2),
        num_attention_heads: int = 40,
        attention_head_dim: int = 128,
        in_channels: Optional[int] = 36,
        latent_channels: Optional[int] = 16,
        out_channels: Optional[int] = 16,
        text_dim: int = 4096,
        freq_dim: int = 256,
        ffn_dim: int = 13824,
        num_layers: int = 40,
        cross_attn_norm: bool = True,
        qk_norm: Optional[str] = "rms_norm_across_heads",
        eps: float = 1e-6,
        image_dim: Optional[int] = 1280,
        added_kv_proj_dim: Optional[int] = None,
        rope_max_seq_len: int = 1024,
        pos_embed_seq_len: Optional[int] = None,
        motion_encoder_channel_sizes: Optional[Dict[str, int]] = None,
        motion_encoder_size: int = 512,
        motion_style_dim: int = 512,
        motion_dim: int = 20,
        motion_encoder_dim: int = 512,
        face_encoder_hidden_dim: int = 1024,
        face_encoder_num_heads: int = 4,
        inject_face_latents_blocks: int = 5,
        motion_encoder_batch_size: int = 8,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        if in_channels is None and latent_channels is not None:
            in_channels = 2 * latent_channels + 4
        elif in_channels is not None and latent_channels is None:
            latent_channels = (in_channels - 4) // 2
        elif in_channels is None:
            raise ValueError("one of in_channels / latent_channels is required")
        if in_channels != 2 * latent_channels + 4:
            raise ValueError("in_channels should be 2 * latent_channels + 4")
        self.out_channels = out_channels or latent_channels

        self.rope = WanRotaryPosEmbed(attention_head_dim, patch_size, rope_max_seq_len)
        self.patch_embedding = Conv3d(in_channels, inner_dim, kernel_size=tuple(patch_size),
                                      stride=tuple(patch_size), padding=0)
        self.pose_patch_embedding = Conv3d(latent_channels, inner_dim, kernel_size=tuple(patch_size),
                                           stride=tuple(patch_size), padding=0)
        self.condition_embedder = WanTimeTextImageEmbedding(
            dim=inner_dim, time_freq_dim=freq_dim, time_proj_dim=inner_dim * 6,
            text_embed_dim=text_dim, image_embed_dim=image_dim,
            pos_embed_seq_len=pos_embed_seq_len)
        self.motion_encoder = WanAnimateMotionEncoder(
            size=motion_encoder_size, style_dim=motion_style_dim, motion_dim=motion_dim,
            out_dim=motion_encoder_dim, channels=motion_encoder_channel_sizes)
        self.face_encoder = WanAnimateFaceEncoder(
            in_dim=motion_encoder_dim, out_dim=inner_dim,
            hidden_dim=face_encoder_hidden_dim, num_heads=face_encoder_num_heads)
        self.blocks = ModuleList([
            WanTransformerBlock(inner_dim, ffn_dim, num_attention_heads, qk_norm,
                                cross_attn_norm, eps, added_kv_proj_dim)
            for _ in range(num_layers)
        ])
        self.face_adapter = ModuleList([
            WanAnimateFaceBlockCrossAttention(
                dim=inner_dim, heads=num_attention_heads,
                dim_head=inner_dim // num_attention_heads, eps=eps,
                cross_attention_dim_head=inner_dim // num_attention_heads)
            for _ in range(num_layers // inject_face_latents_blocks)
        ])
        self.norm_out = LayerNorm(inner_dim, eps=eps, use_scale=False, use_bias=False)
        self.proj_out = Linear(inner_dim, self.out_channels * math.prod(patch_size))

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 7)
        params["scale_shift_table"] = (
            jax.random.normal(k, (1, 2, self.inner_dim), jnp.float32) / self.inner_dim ** 0.5
        ).astype(jnp.float32)
        return params

    def encode_face_motion(self, params: Params, face_pixel_values: jax.Array) -> jax.Array:
        """[B, 3, S, size, size] face frames → [B, T'+1, N+1, D] motion tokens
        (motion encoder → face encoder → zero-prepended frame pad)."""
        fb, fc, ft, fh, fw = face_pixel_values.shape
        frames = jnp.transpose(face_pixel_values, (0, 2, 1, 3, 4)).reshape(fb * ft, fc, fh, fw)
        motion_vec = self.motion_encoder(params["motion_encoder"], frames)
        motion_vec = motion_vec.reshape(fb, ft, -1)
        motion_vec = self.face_encoder(params["face_encoder"], motion_vec)
        pad_face = jnp.zeros_like(motion_vec[:, :1])
        return jnp.concatenate([pad_face, motion_vec], axis=1)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, 2C+4, T+1, H, W]
        timestep: jax.Array,  # [B]
        encoder_hidden_states: jax.Array,
        encoder_hidden_states_image: Optional[jax.Array] = None,
        pose_hidden_states: Optional[jax.Array] = None,  # [B, C, T, H, W]
        face_pixel_values: Optional[jax.Array] = None,  # [B, 3, S, size, size]
        motion_vec: Optional[jax.Array] = None,  # precomputed [B, T'+1, N+1, D]
        return_dict: bool = True,
    ) -> Union[Transformer3DModelOutput, tuple]:
        if pose_hidden_states is not None and pose_hidden_states.shape[2] + 1 != hidden_states.shape[2]:
            raise ValueError("pose frames must be one less than hidden_states frames")
        b, c, f, h, w = hidden_states.shape
        p_t, p_h, p_w = self.config.patch_size
        ppf, pph, ppw = f // p_t, h // p_h, w // p_w

        rotary_emb = self.rope(f, h, w)

        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1))
        x = self.patch_embedding(params["patch_embedding"], x)  # [B, ppf, pph, ppw, D]
        pose = jnp.transpose(pose_hidden_states, (0, 2, 3, 4, 1))
        pose = self.pose_patch_embedding(params["pose_patch_embedding"], pose)
        x = x.at[:, 1:].add(pose)
        x = x.reshape(b, -1, x.shape[-1])

        temb, timestep_proj, encoder_hidden_states, ehs_image = self.condition_embedder(
            params["condition_embedder"], timestep, encoder_hidden_states,
            encoder_hidden_states_image)
        timestep_proj = timestep_proj.reshape(timestep_proj.shape[0], 6, -1)
        if ehs_image is not None:
            encoder_hidden_states = jnp.concatenate([ehs_image, encoder_hidden_states], axis=1)

        # face motion → per-frame multi-head motion tokens. The encoders are
        # step-invariant, so a pipeline's scanned denoise loop should compute
        # `motion_vec` once via `encode_face_motion` and pass it in.
        if motion_vec is None:
            motion_vec = self.encode_face_motion(params, face_pixel_values)

        inject = self.config.inject_face_latents_blocks
        for i, block in enumerate(self.blocks):
            x = block(params["blocks"][i], x, encoder_hidden_states, timestep_proj, rotary_emb)
            if i % inject == 0:
                adapter = self.face_adapter[i // inject]
                x = adapter(params["face_adapter"][i // inject], x, motion_vec) + x

        mods = params["scale_shift_table"].astype(jnp.float32) + temb.astype(jnp.float32)[:, None]
        shift, scale = jnp.split(mods, 2, axis=1)
        dtype = x.dtype
        x = self.norm_out({}, x.astype(jnp.float32))
        x = (x * (1 + scale) + shift).astype(dtype)
        x = self.proj_out(params["proj_out"], x)

        x = x.reshape(b, ppf, pph, ppw, p_t, p_h, p_w, -1)
        x = jnp.transpose(x, (0, 7, 1, 4, 2, 5, 3, 6))
        out = x.reshape(b, -1, ppf * p_t, pph * p_h, ppw * p_w)

        if not return_dict:
            return (out,)
        return Transformer3DModelOutput(sample=out)
