"""AudioLDM2 conditioning projection + double-cross-attention UNet.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/audioldm2/modeling_audioldm2.py`):
`AudioLDM2ProjectionModel` (`:78`) projects the CLAP-pooled and T5/VITS text
streams to the GPT-2 width and wraps each with learned SOS/EOS tokens;
`AudioLDM2UNet2DConditionModel` (`:163`) is a UNet2DConditionModel variant
whose cross-attention blocks hold MULTIPLE Transformer2DModels per resnet —
one per entry of the per-block `cross_attention_dim` tuple, attending to
`encoder_hidden_states` (idx<=1, the GPT-2 generated stream) or
`encoder_hidden_states_1` (idx>1, the T5 stream), or running double
self-attention when the dim is None (`:938`, `:1100`, `:1254`).

TPU-first: NHWC conv path reusing our ResnetBlock2D / Transformer2DModel /
Downsample2D / Upsample2D; masks are bool keep-masks consumed directly by
the fused attention dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.embeddings import TimestepEmbedding, Timesteps
from ...models.modeling_utils import ModelMixin
from ...models.resnet import Downsample2D, ResnetBlock2D, Upsample2D
from ...models.transformers.transformer_2d import Transformer2DModel
from ...models.unets.unet_2d_blocks import DownBlock2D, UpBlock2D
from ...ops.module import Conv2d, Embedding, GroupNorm, Linear, Module, ModuleList, Params, get_activation
from ...utils import BaseOutput


@dataclass
class AudioLDM2ProjectionModelOutput(BaseOutput):
    hidden_states: jax.Array
    attention_mask: Optional[jax.Array] = None


@dataclass
class UNet2DConditionOutput(BaseOutput):
    sample: jax.Array


def add_special_tokens(hidden_states, attention_mask, sos_token, eos_token):
    """Wrap each sequence with SOS/EOS; EOS replaces the first pad slot
    (reference `:43`)."""
    batch_size = hidden_states.shape[0]
    if attention_mask is not None:
        new_attn_mask_step = jnp.ones((batch_size, 1), attention_mask.dtype)
        attention_mask = jnp.concatenate([new_attn_mask_step, attention_mask, new_attn_mask_step], axis=-1)
    sos = jnp.broadcast_to(sos_token, (batch_size, 1, sos_token.shape[-1]))
    eos = jnp.broadcast_to(eos_token, (batch_size, 1, eos_token.shape[-1]))
    hidden_states = jnp.concatenate([sos, hidden_states, eos], axis=1)
    return hidden_states, attention_mask


class AudioLDM2ProjectionModel(Module, ModelMixin, ConfigMixin):
    """Reference `:78`; note the reference's `langauge_model_dim` typo is a
    checkpoint config key and is kept."""

    @register_to_config
    def __init__(self, text_encoder_dim, text_encoder_1_dim, langauge_model_dim,
                 use_learned_position_embedding=None, max_seq_length=None):
        super().__init__()
        self.projection = Linear(text_encoder_dim, langauge_model_dim)
        self.projection_1 = Linear(text_encoder_1_dim, langauge_model_dim)
        self.dim = langauge_model_dim

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["sos_embed"] = jnp.ones((self.dim,), jnp.float32)
        params["eos_embed"] = jnp.ones((self.dim,), jnp.float32)
        params["sos_embed_1"] = jnp.ones((self.dim,), jnp.float32)
        params["eos_embed_1"] = jnp.ones((self.dim,), jnp.float32)
        if self.config.use_learned_position_embedding is not None:
            params["learnable_positional_embedding"] = jnp.zeros(
                (1, self.config.text_encoder_1_dim, self.config.max_seq_length), jnp.float32)
        return params

    def __call__(self, params: Params, hidden_states=None, hidden_states_1=None,
                 attention_mask=None, attention_mask_1=None):
        hidden_states = self.projection(params["projection"], hidden_states)
        hidden_states, attention_mask = add_special_tokens(
            hidden_states, attention_mask, params["sos_embed"], params["eos_embed"])

        if self.config.use_learned_position_embedding is not None:
            pos = jnp.transpose(params["learnable_positional_embedding"], (0, 2, 1))
            hidden_states_1 = hidden_states_1 + pos

        hidden_states_1 = self.projection_1(params["projection_1"], hidden_states_1)
        hidden_states_1, attention_mask_1 = add_special_tokens(
            hidden_states_1, attention_mask_1, params["sos_embed_1"], params["eos_embed_1"])

        hidden_states = jnp.concatenate([hidden_states, hidden_states_1], axis=1)
        if attention_mask is not None and attention_mask_1 is not None:
            attention_mask = jnp.concatenate([attention_mask, attention_mask_1], axis=-1)
        else:
            attention_mask = None
        return AudioLDM2ProjectionModelOutput(hidden_states=hidden_states, attention_mask=attention_mask)


def _pick_context(idx, cross_attention_dim, ehs, mask, ehs_1, mask_1):
    if cross_attention_dim is None:
        return None, None
    if idx <= 1:
        return ehs, mask
    return ehs_1, mask_1


class AudioLDM2CrossAttnDownBlock2D(Module):
    has_cross_attention = True

    def __init__(self, in_channels, out_channels, temb_channels, num_layers=1,
                 transformer_layers_per_block=1, resnet_eps=1e-6, resnet_time_scale_shift="default",
                 resnet_act_fn="swish", resnet_groups=32, num_attention_heads=1,
                 cross_attention_dim=1280, output_scale_factor=1.0, downsample_padding=1,
                 add_downsample=True, use_linear_projection=False, only_cross_attention=False):
        super().__init__()
        if isinstance(cross_attention_dim, int):
            cross_attention_dim = (cross_attention_dim,)
        self.cross_attention_dim = tuple(cross_attention_dim)
        self.resnets = ModuleList([
            ResnetBlock2D(in_channels=in_channels if i == 0 else out_channels, out_channels=out_channels,
                          temb_channels=temb_channels, eps=resnet_eps, groups=resnet_groups,
                          time_embedding_norm=resnet_time_scale_shift, non_linearity=resnet_act_fn,
                          output_scale_factor=output_scale_factor)
            for i in range(num_layers)
        ])
        self.attentions = ModuleList([
            Transformer2DModel(
                num_attention_heads, out_channels // num_attention_heads, in_channels=out_channels,
                num_layers=transformer_layers_per_block, cross_attention_dim=self.cross_attention_dim[j],
                norm_num_groups=resnet_groups, use_linear_projection=use_linear_projection,
                only_cross_attention=only_cross_attention,
                double_self_attention=self.cross_attention_dim[j] is None)
            for _ in range(num_layers) for j in range(len(self.cross_attention_dim))
        ])
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsamplers = ModuleList(
                [Downsample2D(out_channels, use_conv=True, out_channels=out_channels, padding=downsample_padding)])

    def __call__(self, params: Params, hidden_states, temb=None, encoder_hidden_states=None,
                 attention_mask=None, encoder_attention_mask=None,
                 encoder_hidden_states_1=None, encoder_attention_mask_1=None):
        output_states = ()
        n_attn = len(self.cross_attention_dim)
        for i, resnet in enumerate(self.resnets):
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            for j, dim in enumerate(self.cross_attention_dim):
                ehs, mask = _pick_context(j, dim, encoder_hidden_states, encoder_attention_mask,
                                          encoder_hidden_states_1, encoder_attention_mask_1)
                hidden_states = self.attentions[i * n_attn + j](
                    params["attentions"][i * n_attn + j], hidden_states,
                    encoder_hidden_states=ehs, attention_mask=attention_mask,
                    encoder_attention_mask=mask)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class AudioLDM2UNetMidBlock2DCrossAttn(Module):
    has_cross_attention = True

    def __init__(self, in_channels, temb_channels, num_layers=1, transformer_layers_per_block=1,
                 resnet_eps=1e-6, resnet_time_scale_shift="default", resnet_act_fn="swish",
                 resnet_groups=32, num_attention_heads=1, output_scale_factor=1.0,
                 cross_attention_dim=1280, use_linear_projection=False):
        super().__init__()
        if isinstance(cross_attention_dim, int):
            cross_attention_dim = (cross_attention_dim,)
        self.cross_attention_dim = tuple(cross_attention_dim)
        resnet_groups = resnet_groups if resnet_groups is not None else min(in_channels // 4, 32)
        self.resnets = ModuleList([
            ResnetBlock2D(in_channels=in_channels, out_channels=in_channels, temb_channels=temb_channels,
                          eps=resnet_eps, groups=resnet_groups, time_embedding_norm=resnet_time_scale_shift,
                          non_linearity=resnet_act_fn, output_scale_factor=output_scale_factor)
            for _ in range(num_layers + 1)
        ])
        self.attentions = ModuleList([
            Transformer2DModel(
                num_attention_heads, in_channels // num_attention_heads, in_channels=in_channels,
                num_layers=transformer_layers_per_block, cross_attention_dim=self.cross_attention_dim[j],
                norm_num_groups=resnet_groups, use_linear_projection=use_linear_projection,
                double_self_attention=self.cross_attention_dim[j] is None)
            for _ in range(num_layers) for j in range(len(self.cross_attention_dim))
        ])

    def __call__(self, params: Params, hidden_states, temb=None, encoder_hidden_states=None,
                 attention_mask=None, encoder_attention_mask=None,
                 encoder_hidden_states_1=None, encoder_attention_mask_1=None):
        hidden_states = self.resnets[0](params["resnets"][0], hidden_states, temb)
        n_attn = len(self.cross_attention_dim)
        for i in range(len(self.resnets) - 1):
            for j, dim in enumerate(self.cross_attention_dim):
                ehs, mask = _pick_context(j, dim, encoder_hidden_states, encoder_attention_mask,
                                          encoder_hidden_states_1, encoder_attention_mask_1)
                hidden_states = self.attentions[i * n_attn + j](
                    params["attentions"][i * n_attn + j], hidden_states,
                    encoder_hidden_states=ehs, attention_mask=attention_mask,
                    encoder_attention_mask=mask)
            hidden_states = self.resnets[i + 1](params["resnets"][i + 1], hidden_states, temb)
        return hidden_states


class AudioLDM2CrossAttnUpBlock2D(Module):
    has_cross_attention = True

    def __init__(self, in_channels, out_channels, prev_output_channel, temb_channels, num_layers=1,
                 transformer_layers_per_block=1, resnet_eps=1e-6, resnet_time_scale_shift="default",
                 resnet_act_fn="swish", resnet_groups=32, num_attention_heads=1,
                 cross_attention_dim=1280, output_scale_factor=1.0, add_upsample=True,
                 use_linear_projection=False, only_cross_attention=False):
        super().__init__()
        if isinstance(cross_attention_dim, int):
            cross_attention_dim = (cross_attention_dim,)
        self.cross_attention_dim = tuple(cross_attention_dim)
        resnets = []
        for i in range(num_layers):
            res_skip_channels = in_channels if (i == num_layers - 1) else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            resnets.append(ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels, out_channels=out_channels,
                temb_channels=temb_channels, eps=resnet_eps, groups=resnet_groups,
                time_embedding_norm=resnet_time_scale_shift, non_linearity=resnet_act_fn,
                output_scale_factor=output_scale_factor))
        self.resnets = ModuleList(resnets)
        self.attentions = ModuleList([
            Transformer2DModel(
                num_attention_heads, out_channels // num_attention_heads, in_channels=out_channels,
                num_layers=transformer_layers_per_block, cross_attention_dim=self.cross_attention_dim[j],
                norm_num_groups=resnet_groups, use_linear_projection=use_linear_projection,
                only_cross_attention=only_cross_attention,
                double_self_attention=self.cross_attention_dim[j] is None)
            for _ in range(num_layers) for j in range(len(self.cross_attention_dim))
        ])
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])

    def __call__(self, params: Params, hidden_states, res_hidden_states_tuple, temb=None,
                 encoder_hidden_states=None, attention_mask=None, encoder_attention_mask=None,
                 encoder_hidden_states_1=None, encoder_attention_mask_1=None):
        n_attn = len(self.cross_attention_dim)
        for i, resnet in enumerate(self.resnets):
            res = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            for j, dim in enumerate(self.cross_attention_dim):
                ehs, mask = _pick_context(j, dim, encoder_hidden_states, encoder_attention_mask,
                                          encoder_hidden_states_1, encoder_attention_mask_1)
                hidden_states = self.attentions[i * n_attn + j](
                    params["attentions"][i * n_attn + j], hidden_states,
                    encoder_hidden_states=ehs, attention_mask=attention_mask,
                    encoder_attention_mask=mask)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class AudioLDM2UNet2DConditionModel(Module, ModelMixin, ConfigMixin):
    """Reference `:163`. External API is channel-first [B, C, H, W]."""

    @register_to_config
    def __init__(
        self,
        sample_size: Optional[int] = None,
        in_channels: int = 4,
        out_channels: int = 4,
        flip_sin_to_cos: bool = True,
        freq_shift: int = 0,
        down_block_types: Tuple[str, ...] = ("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                                             "CrossAttnDownBlock2D", "DownBlock2D"),
        mid_block_type: str = "UNetMidBlock2DCrossAttn",
        up_block_types: Tuple[str, ...] = ("UpBlock2D", "CrossAttnUpBlock2D",
                                           "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
        only_cross_attention: Union[bool, Tuple[bool, ...]] = False,
        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        layers_per_block: Union[int, Tuple[int, ...]] = 2,
        downsample_padding: int = 1,
        mid_block_scale_factor: float = 1,
        act_fn: str = "silu",
        norm_num_groups: Optional[int] = 32,
        norm_eps: float = 1e-5,
        cross_attention_dim: Union[int, Tuple] = 1280,
        transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        attention_head_dim: Union[int, Tuple[int, ...]] = 8,
        num_attention_heads: Optional[Union[int, Tuple[int, ...]]] = None,
        use_linear_projection: bool = False,
        class_embed_type: Optional[str] = None,
        num_class_embeds: Optional[int] = None,
        upcast_attention: bool = False,
        resnet_time_scale_shift: str = "default",
        time_embedding_type: str = "positional",
        time_embedding_dim: Optional[int] = None,
        time_embedding_act_fn: Optional[str] = None,
        timestep_post_act: Optional[str] = None,
        time_cond_proj_dim: Optional[int] = None,
        conv_in_kernel: int = 3,
        conv_out_kernel: int = 3,
        projection_class_embeddings_input_dim: Optional[int] = None,
        class_embeddings_concat: bool = False,
    ):
        super().__init__()
        num_attention_heads = num_attention_heads or attention_head_dim
        n_blocks = len(down_block_types)

        conv_in_padding = (conv_in_kernel - 1) // 2
        self.conv_in = Conv2d(in_channels, block_out_channels[0], kernel_size=conv_in_kernel,
                              padding=conv_in_padding)

        time_embed_dim = time_embedding_dim or block_out_channels[0] * 4
        self.time_proj = Timesteps(block_out_channels[0], flip_sin_to_cos, freq_shift)
        self.time_embedding = TimestepEmbedding(
            block_out_channels[0], time_embed_dim, act_fn=act_fn, post_act_fn=timestep_post_act,
            cond_proj_dim=time_cond_proj_dim)

        if class_embed_type is None and num_class_embeds is not None:
            self.class_embedding = Embedding(num_class_embeds, time_embed_dim)
        elif class_embed_type == "timestep":
            self.class_embedding = TimestepEmbedding(block_out_channels[0], time_embed_dim, act_fn=act_fn)
        elif class_embed_type == "projection":
            self.class_embedding = TimestepEmbedding(projection_class_embeddings_input_dim, time_embed_dim)
        elif class_embed_type == "simple_projection":
            self.class_embedding = Linear(projection_class_embeddings_input_dim, time_embed_dim)
        else:
            self.class_embedding = None
        self.time_embed_act = get_activation(time_embedding_act_fn) if time_embedding_act_fn else None

        if isinstance(only_cross_attention, bool):
            only_cross_attention = (only_cross_attention,) * n_blocks
        if isinstance(num_attention_heads, int):
            num_attention_heads = (num_attention_heads,) * n_blocks
        if isinstance(cross_attention_dim, int):
            cross_attention_dim = (cross_attention_dim,) * n_blocks
        if isinstance(layers_per_block, int):
            layers_per_block = (layers_per_block,) * n_blocks
        if isinstance(transformer_layers_per_block, int):
            transformer_layers_per_block = (transformer_layers_per_block,) * n_blocks
        blocks_time_embed_dim = time_embed_dim * 2 if class_embeddings_concat else time_embed_dim

        down_blocks = []
        output_channel = block_out_channels[0]
        for i, block_type in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final = i == n_blocks - 1
            if block_type == "CrossAttnDownBlock2D":
                down_blocks.append(AudioLDM2CrossAttnDownBlock2D(
                    input_channel, output_channel, blocks_time_embed_dim,
                    num_layers=layers_per_block[i],
                    transformer_layers_per_block=transformer_layers_per_block[i],
                    resnet_eps=norm_eps, resnet_act_fn=act_fn, resnet_groups=norm_num_groups,
                    cross_attention_dim=cross_attention_dim[i],
                    num_attention_heads=num_attention_heads[i],
                    downsample_padding=downsample_padding, add_downsample=not is_final,
                    use_linear_projection=use_linear_projection,
                    only_cross_attention=only_cross_attention[i],
                    resnet_time_scale_shift=resnet_time_scale_shift))
            elif block_type == "DownBlock2D":
                down_blocks.append(DownBlock2D(
                    input_channel, output_channel, blocks_time_embed_dim,
                    num_layers=layers_per_block[i], resnet_eps=norm_eps, resnet_act_fn=act_fn,
                    resnet_groups=norm_num_groups, downsample_padding=downsample_padding,
                    add_downsample=not is_final, resnet_time_scale_shift=resnet_time_scale_shift))
            else:
                raise ValueError(f"unknown down_block_type {block_type}")
        self.down_blocks = ModuleList(down_blocks)

        self.mid_block = AudioLDM2UNetMidBlock2DCrossAttn(
            block_out_channels[-1], blocks_time_embed_dim,
            transformer_layers_per_block=transformer_layers_per_block[-1], resnet_eps=norm_eps,
            resnet_act_fn=act_fn, output_scale_factor=mid_block_scale_factor,
            resnet_time_scale_shift=resnet_time_scale_shift,
            cross_attention_dim=cross_attention_dim[-1],
            num_attention_heads=num_attention_heads[-1], resnet_groups=norm_num_groups,
            use_linear_projection=use_linear_projection)

        up_blocks = []
        rev_out = list(reversed(block_out_channels))
        rev_heads = list(reversed(num_attention_heads))
        rev_layers = list(reversed(layers_per_block))
        rev_cad = list(reversed(cross_attention_dim))
        rev_tl = list(reversed(transformer_layers_per_block))
        rev_oca = list(reversed(only_cross_attention))
        output_channel = rev_out[0]
        for i, block_type in enumerate(up_block_types):
            is_final = i == n_blocks - 1
            prev_output_channel = output_channel
            output_channel = rev_out[i]
            input_channel = rev_out[min(i + 1, n_blocks - 1)]
            if block_type == "CrossAttnUpBlock2D":
                up_blocks.append(AudioLDM2CrossAttnUpBlock2D(
                    input_channel, output_channel, prev_output_channel, blocks_time_embed_dim,
                    num_layers=rev_layers[i] + 1, transformer_layers_per_block=rev_tl[i],
                    resnet_eps=norm_eps, resnet_act_fn=act_fn, resnet_groups=norm_num_groups,
                    cross_attention_dim=rev_cad[i], num_attention_heads=rev_heads[i],
                    add_upsample=not is_final, use_linear_projection=use_linear_projection,
                    only_cross_attention=rev_oca[i], resnet_time_scale_shift=resnet_time_scale_shift))
            elif block_type == "UpBlock2D":
                up_blocks.append(UpBlock2D(
                    input_channel, prev_output_channel, output_channel, blocks_time_embed_dim,
                    num_layers=rev_layers[i] + 1, resnet_eps=norm_eps, resnet_act_fn=act_fn,
                    resnet_groups=norm_num_groups, add_upsample=not is_final,
                    resnet_time_scale_shift=resnet_time_scale_shift))
            else:
                raise ValueError(f"unknown up_block_type {block_type}")
        self.up_blocks = ModuleList(up_blocks)

        if norm_num_groups is not None:
            self.conv_norm_out = GroupNorm(num_channels=block_out_channels[0],
                                           num_groups=norm_num_groups, eps=norm_eps)
            self.conv_act = get_activation(act_fn)
        else:
            self.conv_norm_out = None
        conv_out_padding = (conv_out_kernel - 1) // 2
        self.conv_out = Conv2d(block_out_channels[0], out_channels, kernel_size=conv_out_kernel,
                               padding=conv_out_padding)

    def __call__(
        self,
        params: Params,
        sample: jax.Array,  # [B, C, H, W]
        timestep,
        encoder_hidden_states: jax.Array,
        class_labels: Optional[jax.Array] = None,
        timestep_cond: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
        encoder_hidden_states_1: Optional[jax.Array] = None,
        encoder_attention_mask_1: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        # bool keep-masks broadcast as [B, 1, 1, S]
        def to_keep(m):
            return None if m is None else m.astype(bool)[:, None, None, :]

        attention_mask = to_keep(attention_mask)
        encoder_attention_mask = to_keep(encoder_attention_mask)
        encoder_attention_mask_1 = to_keep(encoder_attention_mask_1)

        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = self.time_proj({}, timesteps).astype(sample.dtype)
        emb = self.time_embedding(params["time_embedding"], t_emb, timestep_cond)

        if self.class_embedding is not None:
            if class_labels is None:
                raise ValueError("class_labels must be provided for class conditioning")
            if self.config.class_embed_type == "timestep":
                class_labels = self.time_proj({}, class_labels).astype(sample.dtype)
            class_emb = self.class_embedding(params["class_embedding"], class_labels).astype(sample.dtype)
            if self.config.class_embeddings_concat:
                emb = jnp.concatenate([emb, class_emb], axis=-1)
            else:
                emb = emb + class_emb
        if self.time_embed_act is not None:
            emb = self.time_embed_act(emb)

        sample = jnp.transpose(sample, (0, 2, 3, 1))
        sample = self.conv_in(params["conv_in"], sample)

        down_block_res_samples = (sample,)
        for i, block in enumerate(self.down_blocks):
            if getattr(block, "has_cross_attention", False):
                sample, res_samples = block(
                    params["down_blocks"][i], sample, temb=emb,
                    encoder_hidden_states=encoder_hidden_states, attention_mask=attention_mask,
                    encoder_attention_mask=encoder_attention_mask,
                    encoder_hidden_states_1=encoder_hidden_states_1,
                    encoder_attention_mask_1=encoder_attention_mask_1)
            else:
                sample, res_samples = block(params["down_blocks"][i], sample, temb=emb)
            down_block_res_samples += res_samples

        sample = self.mid_block(
            params["mid_block"], sample, temb=emb,
            encoder_hidden_states=encoder_hidden_states, attention_mask=attention_mask,
            encoder_attention_mask=encoder_attention_mask,
            encoder_hidden_states_1=encoder_hidden_states_1,
            encoder_attention_mask_1=encoder_attention_mask_1)

        for i, block in enumerate(self.up_blocks):
            n = len(block.resnets)
            res_samples = down_block_res_samples[-n:]
            down_block_res_samples = down_block_res_samples[:-n]
            if getattr(block, "has_cross_attention", False):
                sample = block(
                    params["up_blocks"][i], sample, res_samples, temb=emb,
                    encoder_hidden_states=encoder_hidden_states, attention_mask=attention_mask,
                    encoder_attention_mask=encoder_attention_mask,
                    encoder_hidden_states_1=encoder_hidden_states_1,
                    encoder_attention_mask_1=encoder_attention_mask_1)
            else:
                sample = block(params["up_blocks"][i], sample, res_samples, temb=emb)

        if self.conv_norm_out is not None:
            sample = self.conv_norm_out(params["conv_norm_out"], sample)
            sample = self.conv_act(sample)
        sample = self.conv_out(params["conv_out"], sample)
        sample = jnp.transpose(sample, (0, 3, 1, 2))
        if not return_dict:
            return (sample,)
        return UNet2DConditionOutput(sample=sample)
