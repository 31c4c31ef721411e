"""LongCatAudioDiTTransformer — LongCat text-to-audio DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_longcat_audio_dit.py:455`;
AudioDiTBlock `:350`, global/local AdaLN `:370`, ConvNeXtV2 text conv `:111`,
rotate-half rope base 1e5 `:64`). Full-width qk RMSNorm (pre-head-split),
rope on BOTH cross-attention sides (audio positions on q, prompt positions
on k), long skip from the embedded input to the last block.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv1d, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import _PassThrough
from ..embeddings import get_1d_rotary_pos_embed_np
from ..modeling_utils import ModelMixin


@dataclass
class LongCatAudioDiTTransformerOutput(BaseOutput):
    sample: jax.Array


def _sinus_position_embedding(timesteps: jax.Array, dim: int, scale: float = 1000.0) -> jax.Array:
    """[sin | cos] ordering with log(10000)/(half-1) spacing (reference :39)."""
    half = dim // 2
    exponent = math.log(10000) / max(half - 1, 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -exponent)
    emb = scale * timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def _rope_table(seq_len: int, dim: int, base: float = 100000.0):
    cos, sin = get_1d_rotary_pos_embed_np(
        dim, np.arange(seq_len, dtype=np.float32), theta=base, repeat_interleave_real=False
    )
    return cos, sin


def _apply_rope_half(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half (reference `_apply_rotary_emb` :92). x: [B, S, H, D]."""
    x_f = x.astype(jnp.float32)
    x1, x2 = jnp.split(x_f, 2, axis=-1)
    x_rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x_f * cos[None, :, None] + x_rot * sin[None, :, None]).astype(x.dtype)


class AudioDiTTimestepEmbedding(Module):
    def __init__(self, dim: int, freq_embed_dim: int = 256):
        super().__init__()
        self.freq_embed_dim = freq_embed_dim
        self.time_mlp = ModuleList([Linear(freq_embed_dim, dim), _PassThrough(), Linear(dim, dim)])

    def __call__(self, params: Params, timestep: jax.Array) -> jax.Array:
        h = _sinus_position_embedding(timestep, self.freq_embed_dim).astype(timestep.dtype)
        h = self.time_mlp[0](params["time_mlp"][0], h)
        return self.time_mlp[2](params["time_mlp"][2], jax.nn.silu(h))


class AudioDiTGRN(Module):
    """Global response normalization over the sequence axis (reference :99);
    NLC activations, params stored [C] (torch [1, 1, C])."""

    def __init__(self, dim: int):
        super().__init__()
        self.dim = dim

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"gamma": jnp.zeros((self.dim,), dtype), "beta": jnp.zeros((self.dim,), dtype)}

    def convert_torch_param(self, pname, tensor):
        return pname, tensor.reshape(-1)

    def convert_param_to_torch(self, pname, array):
        return pname, array.reshape(1, 1, -1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return params["gamma"].astype(x.dtype) * (x * nx) + params["beta"].astype(x.dtype) + x


class AudioDiTConvNeXtV2Block(Module):
    def __init__(self, dim: int, intermediate_dim: int, dilation: int = 1,
                 kernel_size: int = 7, bias: bool = True, eps: float = 1e-6):
        super().__init__()
        padding = (dilation * (kernel_size - 1)) // 2
        self.dwconv = Conv1d(dim, dim, kernel_size=kernel_size, padding=padding,
                             groups=dim, dilation=dilation, use_bias=bias)
        self.norm = LayerNorm(dim, eps=eps)
        self.pwconv1 = Linear(dim, intermediate_dim, use_bias=bias)
        self.grn = AudioDiTGRN(intermediate_dim)
        self.pwconv2 = Linear(intermediate_dim, dim, use_bias=bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        residual = x
        x = self.dwconv(params["dwconv"], x)
        x = self.norm(params["norm"], x)
        x = jax.nn.silu(self.pwconv1(params["pwconv1"], x))
        x = self.grn(params["grn"], x)
        x = self.pwconv2(params["pwconv2"], x)
        return residual + x


class AudioDiTEmbedder(Module):
    """Masked 2-layer MLP projection (reference :143)."""

    def __init__(self, in_dim: int, out_dim: int):
        super().__init__()
        self.proj = ModuleList([Linear(in_dim, out_dim), _PassThrough(), Linear(out_dim, out_dim)])

    def __call__(self, params: Params, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        x = self.proj[0](params["proj"][0], x)
        x = self.proj[2](params["proj"][2], jax.nn.silu(x))
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x


class AudioDiTAdaLNMLP(Module):
    def __init__(self, in_dim: int, out_dim: int, bias: bool = True):
        super().__init__()
        self.mlp = ModuleList([_PassThrough(), Linear(in_dim, out_dim, use_bias=bias)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.mlp[1](params["mlp"][1], jax.nn.silu(x))


class AudioDiTAdaLayerNormZeroFinal(Module):
    def __init__(self, dim: int, bias: bool = True, eps: float = 1e-6):
        super().__init__()
        self.linear = Linear(dim, dim * 2, use_bias=bias)
        self.norm = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)

    def __call__(self, params: Params, x: jax.Array, embedding: jax.Array) -> jax.Array:
        emb = self.linear(params["linear"], jax.nn.silu(embedding))
        scale, shift = jnp.split(emb, 2, axis=-1)
        x = self.norm({}, x.astype(jnp.float32)).astype(x.dtype)
        if scale.ndim == 2:
            return x * (1 + scale[:, None]) + shift[:, None]
        return x * (1 + scale) + shift


class AudioDiTAttention(Module):
    """Full-width qk-RMSNorm attention; self variant ropes q and k with the
    audio table, cross variant ropes q with audio and k with prompt positions
    (reference :184/:284)."""

    def __init__(self, q_dim: int, kv_dim: Optional[int], heads: int, dim_head: int,
                 bias: bool = True, qk_norm: bool = False, eps: float = 1e-6):
        super().__init__()
        kv_dim = q_dim if kv_dim is None else kv_dim
        self.heads = heads
        self.inner_dim = dim_head * heads
        self.to_q = Linear(q_dim, self.inner_dim, use_bias=bias)
        self.to_k = Linear(kv_dim, self.inner_dim, use_bias=bias)
        self.to_v = Linear(kv_dim, self.inner_dim, use_bias=bias)
        self.qk_norm = qk_norm
        if qk_norm:
            self.q_norm = RMSNorm(self.inner_dim, eps=eps)
            self.k_norm = RMSNorm(self.inner_dim, eps=eps)
        self.to_out = ModuleList([Linear(self.inner_dim, q_dim, use_bias=bias)])

    def __call__(self, params: Params, hidden_states: jax.Array,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 post_attention_mask: Optional[jax.Array] = None,
                 attention_mask: Optional[jax.Array] = None,
                 audio_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
                 prompt_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None) -> jax.Array:
        b = hidden_states.shape[0]
        kv_input = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        q = self.to_q(params["to_q"], hidden_states)
        k = self.to_k(params["to_k"], kv_input)
        v = self.to_v(params["to_v"], kv_input)
        if self.qk_norm:
            q = self.q_norm(params["q_norm"], q)
            k = self.k_norm(params["k_norm"], k)
        head_dim = self.inner_dim // self.heads
        q = q.reshape(b, -1, self.heads, head_dim)
        k = k.reshape(b, -1, self.heads, head_dim)
        v = v.reshape(b, -1, self.heads, head_dim)
        if audio_rotary_emb is not None:
            q = _apply_rope_half(q, *audio_rotary_emb)
            if encoder_hidden_states is None:
                k = _apply_rope_half(k, *audio_rotary_emb)
        if encoder_hidden_states is not None and prompt_rotary_emb is not None:
            k = _apply_rope_half(k, *prompt_rotary_emb)

        attn_mask = None
        if attention_mask is not None:
            attn_mask = attention_mask.astype(bool)[:, None, None, :]
        out = dispatch_attention_fn(q, k, v, attn_mask=attn_mask)
        q_mask = attention_mask if encoder_hidden_states is None else post_attention_mask
        if q_mask is not None:
            out = out * q_mask[:, :, None, None].astype(out.dtype)
        out = out.reshape(b, -1, self.inner_dim).astype(q.dtype)
        return self.to_out[0](params["to_out"][0], out)


class AudioDiTFeedForward(Module):
    def __init__(self, dim: int, mult: float = 4.0, bias: bool = True):
        super().__init__()
        inner = int(dim * mult)
        self.ff = ModuleList([Linear(dim, inner, use_bias=bias), _PassThrough(), _PassThrough(),
                              Linear(inner, dim, use_bias=bias)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.ff[0](params["ff"][0], x)
        x = jax.nn.gelu(x, approximate=True)
        return self.ff[3](params["ff"][3], x)


class AudioDiTBlock(Module):
    def __init__(self, dim: int, cond_dim: int, heads: int, dim_head: int,
                 bias: bool = True, qk_norm: bool = False, eps: float = 1e-6,
                 cross_attn: bool = True, cross_attn_norm: bool = False,
                 adaln_type: str = "global", adaln_use_text_cond: bool = True,
                 ff_mult: float = 4.0):
        super().__init__()
        self.dim = dim
        self.adaln_type = adaln_type
        self.adaln_use_text_cond = adaln_use_text_cond
        if adaln_type == "local":
            self.adaln_mlp = AudioDiTAdaLNMLP(dim, dim * 6, bias=True)
        self.self_attn = AudioDiTAttention(dim, None, heads, dim_head, bias=bias,
                                           qk_norm=qk_norm, eps=eps)
        self.use_cross_attn = cross_attn
        self.has_cross_norm = cross_attn_norm
        if cross_attn:
            self.cross_attn = AudioDiTAttention(dim, cond_dim, heads, dim_head, bias=bias,
                                                qk_norm=qk_norm, eps=eps)
            if cross_attn_norm:
                self.cross_attn_norm = LayerNorm(dim, eps=eps)
                self.cross_attn_norm_c = LayerNorm(cond_dim, eps=eps)
        self.ffn = AudioDiTFeedForward(dim, mult=ff_mult, bias=bias)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        if self.adaln_type == "global":
            k = jax.random.fold_in(key, 31)
            params["adaln_scale_shift"] = (
                jax.random.normal(k, (self.dim * 6,), jnp.float32) / self.dim**0.5
            ).astype(dtype)
        return params

    def __call__(self, params: Params, hidden_states, timestep_embed, cond,
                 mask=None, cond_mask=None, rope=None, cond_rope=None,
                 adaln_global_out=None):
        if self.adaln_type == "local" and adaln_global_out is None:
            if self.adaln_use_text_cond:
                denom = jnp.clip(cond_mask.sum(axis=1, keepdims=True), 1, None).astype(cond.dtype)
                cond_mean = cond.sum(axis=1) / denom
                norm_cond = timestep_embed + cond_mean
            else:
                norm_cond = timestep_embed
            adaln_out = self.adaln_mlp(params["adaln_mlp"], norm_cond)
        else:
            adaln_out = adaln_global_out + params["adaln_scale_shift"].astype(adaln_global_out.dtype)[None]
        gate_sa, scale_sa, shift_sa, gate_ffn, scale_ffn, shift_ffn = jnp.split(adaln_out, 6, axis=-1)

        def _ln(x):
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-6)

        norm_h = _ln(hidden_states.astype(jnp.float32)).astype(hidden_states.dtype)
        norm_h = norm_h * (1 + scale_sa[:, None]) + shift_sa[:, None]
        attn_out = self.self_attn(params["self_attn"], norm_h, attention_mask=mask,
                                  audio_rotary_emb=rope)
        hidden_states = hidden_states + gate_sa[:, None] * attn_out

        if self.use_cross_attn:
            h_in = hidden_states
            c_in = cond
            if self.has_cross_norm:
                h_in = self.cross_attn_norm(params["cross_attn_norm"], h_in)
                c_in = self.cross_attn_norm_c(params["cross_attn_norm_c"], c_in)
            cross_out = self.cross_attn(params["cross_attn"], h_in,
                                        encoder_hidden_states=c_in,
                                        post_attention_mask=mask, attention_mask=cond_mask,
                                        audio_rotary_emb=rope, prompt_rotary_emb=cond_rope)
            hidden_states = hidden_states + cross_out

        norm_h = _ln(hidden_states.astype(jnp.float32)).astype(hidden_states.dtype)
        norm_h = norm_h * (1 + scale_ffn[:, None]) + shift_ffn[:, None]
        ff_out = self.ffn(params["ffn"], norm_h)
        return hidden_states + gate_ffn[:, None] * ff_out


class LongCatAudioDiTTransformer(Module, ModelMixin, ConfigMixin):
    """LongCat-AudioDiT (reference LongCatAudioDiTTransformer :455)."""

    @register_to_config
    def __init__(
        self,
        dit_dim: int = 1536,
        dit_depth: int = 24,
        dit_heads: int = 24,
        dit_text_dim: int = 768,
        latent_dim: int = 64,
        dropout: float = 0.0,
        bias: bool = True,
        cross_attn: bool = True,
        adaln_type: str = "global",
        adaln_use_text_cond: bool = True,
        long_skip: bool = True,
        text_conv: bool = True,
        qk_norm: bool = True,
        cross_attn_norm: bool = False,
        eps: float = 1e-6,
        use_latent_condition: bool = True,
        ff_mult: float = 4.0,
    ):
        super().__init__()
        dim = dit_dim
        dim_head = dim // dit_heads
        self.dim_head = dim_head
        self.time_embed = AudioDiTTimestepEmbedding(dim)
        self.input_embed = AudioDiTEmbedder(latent_dim, dim)
        self.text_embed = AudioDiTEmbedder(dit_text_dim, dim)
        self.blocks = ModuleList([
            AudioDiTBlock(dim=dim, cond_dim=dim, heads=dit_heads, dim_head=dim_head,
                          bias=bias, qk_norm=qk_norm, eps=eps, cross_attn=cross_attn,
                          cross_attn_norm=cross_attn_norm, adaln_type=adaln_type,
                          adaln_use_text_cond=adaln_use_text_cond, ff_mult=ff_mult)
            for _ in range(dit_depth)
        ])
        self.norm_out = AudioDiTAdaLayerNormZeroFinal(dim, bias=bias, eps=eps)
        self.proj_out = Linear(dim, latent_dim)
        if adaln_type == "global":
            self.adaln_global_mlp = AudioDiTAdaLNMLP(dim, dim * 6, bias=True)
        self.has_text_conv = text_conv
        if text_conv:
            self.text_conv_layer = ModuleList(
                [AudioDiTConvNeXtV2Block(dim, dim * 2, bias=bias, eps=eps) for _ in range(4)]
            )
        self.use_latent_condition = use_latent_condition
        if use_latent_condition:
            self.latent_embed = AudioDiTEmbedder(latent_dim, dim)
            self.latent_cond_embedder = AudioDiTEmbedder(dim * 2, dim)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: jax.Array,
        encoder_attention_mask: jax.Array,
        timestep: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        latent_cond: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        dtype = hidden_states.dtype
        batch = hidden_states.shape[0]
        timestep = jnp.broadcast_to(jnp.atleast_1d(timestep), (batch,)).astype(dtype)
        timestep_embed = self.time_embed(params["time_embed"], timestep)
        text_mask = encoder_attention_mask.astype(bool)
        cond = self.text_embed(params["text_embed"], encoder_hidden_states.astype(dtype), text_mask)
        if self.has_text_conv:
            for i, block in enumerate(self.text_conv_layer):
                cond = block(params["text_conv_layer"][i], cond)
            cond = cond * text_mask[..., None].astype(cond.dtype)
        h = self.input_embed(params["input_embed"], hidden_states, attention_mask)
        if self.use_latent_condition and latent_cond is not None:
            lc = self.latent_embed(params["latent_embed"], latent_cond.astype(h.dtype), attention_mask)
            h = self.latent_cond_embedder(params["latent_cond_embedder"],
                                          jnp.concatenate([h, lc], axis=-1))
        residual = h if self.config.long_skip else None

        cos_a, sin_a = _rope_table(h.shape[1], self.dim_head)
        cos_c, sin_c = _rope_table(cond.shape[1], self.dim_head)
        rope = (jnp.asarray(cos_a, dtype), jnp.asarray(sin_a, dtype))
        cond_rope = (jnp.asarray(cos_c, dtype), jnp.asarray(sin_c, dtype))

        adaln_global_out = None
        if self.config.adaln_type == "global":
            if self.config.adaln_use_text_cond:
                text_len = jnp.clip(text_mask.sum(axis=1), 1, None).astype(cond.dtype)
                text_mean = cond.sum(axis=1) / text_len[:, None]
                norm_cond = timestep_embed + text_mean
            else:
                norm_cond = timestep_embed
            adaln_global_out = self.adaln_global_mlp(params["adaln_global_mlp"], norm_cond)
        else:
            norm_cond = timestep_embed

        for i, block in enumerate(self.blocks):
            h = block(params["blocks"][i], h, timestep_embed, cond, mask=attention_mask,
                      cond_mask=text_mask, rope=rope, cond_rope=cond_rope,
                      adaln_global_out=adaln_global_out)

        if self.config.long_skip:
            h = h + residual
        h = self.norm_out(params["norm_out"], h, norm_cond)
        h = self.proj_out(params["proj_out"], h)
        if attention_mask is not None:
            h = h * attention_mask[..., None].astype(h.dtype)
        if not return_dict:
            return (h,)
        return LongCatAudioDiTTransformerOutput(sample=h)
