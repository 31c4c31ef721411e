"""ControlNetUnionModel (SDXL, multi-task control).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/controlnets/controlnet_union.py:85`):
one ControlNet trunk shared across control tasks (openpose/depth/edges/...).
Each active condition is embedded, tagged with its `task_embedding` row, fused
through a small transformer (`:676-713`) and summed into the conv_in stream;
the active-task bitmask is Fourier-embedded and added to the time embedding
(`:676-681`).

Checkpoint-compat note: the reference passes [B, S, C] into a default
(batch_first=False) nn.MultiheadAttention, so attention mixes the FIRST axis
at fixed token index — mirrored here verbatim (shipped checkpoints were
trained with that layout).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params
from ..embeddings import TimestepEmbedding, Timesteps
from .controlnet import ControlNetModel, ControlNetOutput


class TorchMultiheadAttention(Module):
    """torch.nn.MultiheadAttention layout (in_proj_weight [3d, d] packed
    q/k/v + out_proj Linear), attending over axis 0 (seq-first convention)."""

    def __init__(self, d_model: int, n_head: int):
        super().__init__()
        self.d_model = d_model
        self.n_head = n_head
        self.out_proj = Linear(d_model, d_model)

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k1, k2 = jax.random.split(key)
        scale = 1.0 / (self.d_model ** 0.5)
        params["in_proj_weight"] = (jax.random.normal(k1, (3 * self.d_model, self.d_model)) * scale).astype(dtype)
        params["in_proj_bias"] = jnp.zeros((3 * self.d_model,), dtype)
        return params

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [S, B, C] (axis 0 is the attention axis)
        s, b, c = x.shape
        h, dh = self.n_head, c // self.n_head
        qkv = jnp.einsum("sbc,ec->sbe", x, params["in_proj_weight"]) + params["in_proj_bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [S, B, C] -> [B, H, S, Dh]
            return jnp.transpose(t.reshape(s, b, h, dh), (1, 2, 0, 3))

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / (dh ** 0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = jnp.transpose(out, (2, 0, 1, 3)).reshape(s, b, c)
        return self.out_proj(params["out_proj"], out)


class _ResidualAttentionMlp(Module):
    def __init__(self, d_model: int):
        super().__init__()
        self.c_fc = Linear(d_model, d_model * 4)
        self.c_proj = Linear(d_model * 4, d_model)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.c_fc(params["c_fc"], x)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
        return self.c_proj(params["c_proj"], h)


class ResidualAttentionBlock(Module):
    """Reference `controlnet_union.py:66`: pre-LN attention + QuickGELU MLP."""

    def __init__(self, d_model: int, n_head: int):
        super().__init__()
        self.attn = TorchMultiheadAttention(d_model, n_head)
        self.ln_1 = LayerNorm(d_model)
        self.mlp = _ResidualAttentionMlp(d_model)
        self.ln_2 = LayerNorm(d_model)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = x + self.attn(params["attn"], self.ln_1(params["ln_1"], x))
        return x + self.mlp(params["mlp"], self.ln_2(params["ln_2"], x))


class ControlNetUnionModel(ControlNetModel):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 4,
        conditioning_channels: int = 3,
        flip_sin_to_cos: bool = True,
        freq_shift: int = 0,
        down_block_types: Tuple[str, ...] = (
            "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D",
        ),
        only_cross_attention: bool = False,
        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        layers_per_block: int = 2,
        downsample_padding: int = 1,
        mid_block_scale_factor: float = 1,
        act_fn: str = "silu",
        norm_num_groups: Optional[int] = 32,
        norm_eps: float = 1e-5,
        cross_attention_dim: int = 1280,
        transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        attention_head_dim: Union[int, Tuple[int, ...]] = 8,
        num_attention_heads: Optional[Union[int, Tuple[int, ...]]] = None,
        use_linear_projection: bool = False,
        class_embed_type: Optional[str] = None,
        addition_embed_type: Optional[str] = None,
        addition_time_embed_dim: Optional[int] = None,
        projection_class_embeddings_input_dim: Optional[int] = None,
        controlnet_conditioning_channel_order: str = "rgb",
        conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256),
        global_pool_conditions: bool = False,
        addition_embed_type_num_heads: int = 64,
        num_control_type: int = 6,
        num_trans_channel: int = 320,
        num_trans_head: int = 8,
        num_trans_layer: int = 1,
        num_proj_channel: int = 320,
    ):
        super().__init__(
            in_channels=in_channels,
            conditioning_channels=conditioning_channels,
            flip_sin_to_cos=flip_sin_to_cos,
            freq_shift=freq_shift,
            down_block_types=down_block_types,
            only_cross_attention=only_cross_attention,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
            downsample_padding=downsample_padding,
            mid_block_scale_factor=mid_block_scale_factor,
            act_fn=act_fn,
            norm_num_groups=norm_num_groups,
            norm_eps=norm_eps,
            cross_attention_dim=cross_attention_dim,
            transformer_layers_per_block=transformer_layers_per_block,
            attention_head_dim=attention_head_dim,
            num_attention_heads=num_attention_heads,
            use_linear_projection=use_linear_projection,
            class_embed_type=class_embed_type,
            addition_embed_type=addition_embed_type,
            addition_time_embed_dim=addition_time_embed_dim,
            projection_class_embeddings_input_dim=projection_class_embeddings_input_dim,
            controlnet_conditioning_channel_order=controlnet_conditioning_channel_order,
            conditioning_embedding_out_channels=conditioning_embedding_out_channels,
            global_pool_conditions=global_pool_conditions,
            addition_embed_type_num_heads=addition_embed_type_num_heads,
        )
        self.transformer_layes = ModuleList(
            [ResidualAttentionBlock(num_trans_channel, num_trans_head) for _ in range(num_trans_layer)]
        )
        self.spatial_ch_projs = Linear(num_trans_channel, num_proj_channel)
        self.control_type_proj = Timesteps(addition_time_embed_dim, flip_sin_to_cos, freq_shift)
        self.control_add_embedding = TimestepEmbedding(
            addition_time_embed_dim * num_control_type, block_out_channels[0] * 4
        )
        self._num_trans_channel = num_trans_channel

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["task_embedding"] = (
            (self._num_trans_channel ** 0.5)
            * jax.random.normal(key, (self.config.num_control_type, self._num_trans_channel))
        ).astype(dtype)
        # zero-init projection (reference zero_module(spatial_ch_projs))
        params["spatial_ch_projs"]["kernel"] = jnp.zeros_like(params["spatial_ch_projs"]["kernel"])
        return params

    def __call__(
        self,
        params: Params,
        sample: jax.Array,  # [B, C, H, W]
        timestep,
        encoder_hidden_states: jax.Array,
        controlnet_cond: List[jax.Array],  # list of [B, 3, H*8, W*8], one per active task
        control_type: jax.Array,  # [B, num_control_type] 0/1 bitmask
        control_type_idx: List[int],  # indices of the active tasks
        conditioning_scale: Union[float, List[float]] = 1.0,
        added_cond_kwargs: Optional[dict] = None,
        guess_mode: bool = False,
        return_dict: bool = True,
    ):
        if not isinstance(controlnet_cond, (list, tuple)):
            controlnet_cond = [controlnet_cond]
        if not isinstance(conditioning_scale, (list, tuple)):
            conditioning_scale = [conditioning_scale] * len(controlnet_cond)

        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = self.time_proj({}, timesteps).astype(sample.dtype)
        emb = self.time_embedding(params["time_embedding"], t_emb)

        if self.config.addition_embed_type == "text_time":
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = self.add_time_proj({}, time_ids.reshape(-1)).reshape(text_embeds.shape[0], -1)
            add_embeds = jnp.concatenate([text_embeds, time_embeds], axis=-1).astype(sample.dtype)
            emb = emb + self.add_embedding(params["add_embedding"], add_embeds)

        # active-task bitmask → Fourier embed → time-emb add (reference :676)
        control_embeds = self.control_type_proj({}, control_type.reshape(-1))
        control_embeds = control_embeds.reshape(t_emb.shape[0], -1).astype(emb.dtype)
        emb = emb + self.control_add_embedding(params["control_add_embedding"], control_embeds)

        sample = jnp.transpose(sample, (0, 2, 3, 1))
        sample = self.conv_in(params["conv_in"], sample)

        # condition fusion (reference :684-713); NHWC here, channel mean over (1, 2)
        inputs, condition_list = [], []
        for cond, control_idx in zip(controlnet_cond, control_type_idx):
            if self.config.controlnet_conditioning_channel_order == "bgr":
                cond = jnp.flip(cond, axis=1)
            condition = self.controlnet_cond_embedding(
                params["controlnet_cond_embedding"], jnp.transpose(cond, (0, 2, 3, 1))
            )
            feat_seq = jnp.mean(condition, axis=(1, 2)) + params["task_embedding"][control_idx]
            inputs.append(feat_seq[:, None])
            condition_list.append(condition)
        feat_seq = jnp.mean(sample, axis=(1, 2))
        inputs.append(feat_seq[:, None])
        condition_list.append(sample)

        x = jnp.concatenate(inputs, axis=1)  # [B, n_active+1, C]
        for i, layer in enumerate(self.transformer_layes):
            x = layer(params["transformer_layes"][i], x)

        fused = jnp.zeros_like(sample)
        for idx, condition in enumerate(condition_list[:-1]):
            alpha = self.spatial_ch_projs(params["spatial_ch_projs"], x[:, idx])
            fused = fused + condition + alpha[:, None, None, :]
        sample = sample + fused

        down_block_res_samples = (sample,)
        for i, block in enumerate(self.down_blocks):
            if getattr(block, "has_cross_attention", False):
                sample, res_samples = block(
                    params["down_blocks"][i], sample, temb=emb, encoder_hidden_states=encoder_hidden_states
                )
            else:
                sample, res_samples = block(params["down_blocks"][i], sample, temb=emb)
            down_block_res_samples += res_samples

        sample = self.mid_block(
            params["mid_block"], sample, temb=emb, encoder_hidden_states=encoder_hidden_states
        )

        controlnet_res = tuple(
            cb(params["controlnet_down_blocks"][i], r)
            for i, (r, cb) in enumerate(zip(down_block_res_samples, self.controlnet_down_blocks))
        )
        mid_res = self.controlnet_mid_block(params["controlnet_mid_block"], sample)

        scale = conditioning_scale[0]
        if guess_mode and not self.config.global_pool_conditions:
            scales = jnp.logspace(-1, 0, len(controlnet_res) + 1) * scale
            controlnet_res = tuple(r * s for r, s in zip(controlnet_res, scales[:-1]))
            mid_res = mid_res * scales[-1]
        else:
            controlnet_res = tuple(r * scale for r in controlnet_res)
            mid_res = mid_res * scale

        if self.config.global_pool_conditions:
            controlnet_res = tuple(jnp.mean(r, axis=(1, 2), keepdims=True) for r in controlnet_res)
            mid_res = jnp.mean(mid_res, axis=(1, 2), keepdims=True)

        controlnet_res = tuple(jnp.transpose(r, (0, 3, 1, 2)) for r in controlnet_res)
        mid_res = jnp.transpose(mid_res, (0, 3, 1, 2))

        if not return_dict:
            return (controlnet_res, mid_res)
        return ControlNetOutput(down_block_res_samples=controlnet_res, mid_block_res_sample=mid_res)
