"""UNet2DConditionModel — the SD1.x/SD2.x/SDXL conditional UNet.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/unets/unet_2d_condition.py:69`;
forward `:985-1345`). Supports the conditioning paths used by the SD family:
text cross-attention, class embeddings, SDXL "text_time" additional
embeddings, and LCM's `time_cond_proj_dim`. NHWC internals, NCHW public API.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...utils import BaseOutput
from ...ops.module import Conv2d, Embedding, GroupNorm, Identity, Linear, Module, ModuleList, Params, get_activation
from ..embeddings import TextTimeEmbedding, TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from .unet_2d_blocks import get_down_block, get_up_block
from .unet_2d_condition_blocks import UNetMidBlock2DCrossAttn


@dataclass
class UNet2DConditionOutput(BaseOutput):
    sample: jax.Array


def _tuple_per_block(value, n):
    if isinstance(value, (list, tuple)):
        return list(value)
    return [value] * n


class UNet2DConditionModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        sample_size: Optional[int] = None,
        in_channels: int = 4,
        out_channels: int = 4,
        center_input_sample: bool = False,
        flip_sin_to_cos: bool = True,
        freq_shift: int = 0,
        down_block_types: Tuple[str, ...] = (
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "DownBlock2D",
        ),
        mid_block_type: Optional[str] = "UNetMidBlock2DCrossAttn",
        up_block_types: Tuple[str, ...] = (
            "UpBlock2D",
            "CrossAttnUpBlock2D",
            "CrossAttnUpBlock2D",
            "CrossAttnUpBlock2D",
        ),
        only_cross_attention: Union[bool, Tuple[bool, ...]] = False,
        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        layers_per_block: Union[int, Tuple[int, ...]] = 2,
        downsample_padding: int = 1,
        mid_block_scale_factor: float = 1,
        dropout: float = 0.0,
        act_fn: str = "silu",
        norm_num_groups: Optional[int] = 32,
        norm_eps: float = 1e-5,
        cross_attention_dim: Union[int, Tuple[int, ...]] = 1280,
        transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        reverse_transformer_layers_per_block: Optional[Tuple] = None,
        encoder_hid_dim: Optional[int] = None,
        encoder_hid_dim_type: Optional[str] = None,
        attention_head_dim: Union[int, Tuple[int, ...]] = 8,
        num_attention_heads: Optional[Union[int, Tuple[int, ...]]] = None,
        dual_cross_attention: bool = False,
        use_linear_projection: bool = False,
        class_embed_type: Optional[str] = None,
        addition_embed_type: Optional[str] = None,
        addition_time_embed_dim: Optional[int] = None,
        num_class_embeds: Optional[int] = None,
        upcast_attention: bool = False,
        resnet_time_scale_shift: str = "default",
        resnet_skip_time_act: bool = False,
        resnet_out_scale_factor: float = 1.0,
        time_embedding_type: str = "positional",
        time_embedding_dim: Optional[int] = None,
        time_embedding_act_fn: Optional[str] = None,
        timestep_post_act: Optional[str] = None,
        time_cond_proj_dim: Optional[int] = None,
        conv_in_kernel: int = 3,
        conv_out_kernel: int = 3,
        projection_class_embeddings_input_dim: Optional[int] = None,
        attention_type: str = "default",
        class_embeddings_concat: bool = False,
        mid_block_only_cross_attention: Optional[bool] = None,
        cross_attention_norm: Optional[str] = None,
        addition_embed_type_num_heads: int = 64,
    ):
        super().__init__()
        # the historical naming quirk: attention_head_dim is the head *count*
        # for the SD family (reference unet_2d_condition.py:137-143)
        num_attention_heads = num_attention_heads or attention_head_dim

        n_blocks = len(down_block_types)
        num_attention_heads = _tuple_per_block(num_attention_heads, n_blocks)
        cross_attention_dims = _tuple_per_block(cross_attention_dim, n_blocks)
        layers_per_block_l = _tuple_per_block(layers_per_block, n_blocks)
        transformer_layers = _tuple_per_block(transformer_layers_per_block, n_blocks)
        only_cross_attention_l = _tuple_per_block(only_cross_attention, n_blocks)

        time_embed_dim = time_embedding_dim or block_out_channels[0] * 4

        conv_in_padding = (conv_in_kernel - 1) // 2
        self.conv_in = Conv2d(in_channels, block_out_channels[0], kernel_size=conv_in_kernel, padding=conv_in_padding)

        if time_embedding_type != "positional":
            raise NotImplementedError(f"time_embedding_type {time_embedding_type} not yet supported")
        self.time_proj = Timesteps(block_out_channels[0], flip_sin_to_cos, freq_shift)
        timestep_input_dim = block_out_channels[0]
        self.time_embedding = TimestepEmbedding(
            timestep_input_dim,
            time_embed_dim,
            act_fn=act_fn,
            post_act_fn=timestep_post_act,
            cond_proj_dim=time_cond_proj_dim,
        )

        if encoder_hid_dim_type is None and encoder_hid_dim is not None:
            encoder_hid_dim_type = "text_proj"
        if encoder_hid_dim_type == "text_proj":
            self.encoder_hid_proj = Linear(encoder_hid_dim, cross_attention_dims[0])
        elif encoder_hid_dim_type == "text_image_proj":
            # Kandinsky 2.1: text+image embeds → joint cross-attention tokens
            # (reference unet_2d_condition.py:596)
            from ..embeddings import TextImageProjection

            self.encoder_hid_proj = TextImageProjection(
                text_embed_dim=encoder_hid_dim,
                image_embed_dim=cross_attention_dims[0],
                cross_attention_dim=cross_attention_dims[0],
            )
        elif encoder_hid_dim_type == "image_proj":
            # Kandinsky 2.2: image embeds → 32 cross-attention tokens
            from ..embeddings import ImageProjection

            self.encoder_hid_proj = ImageProjection(
                image_embed_dim=encoder_hid_dim, cross_attention_dim=cross_attention_dims[0]
            )
        elif encoder_hid_dim_type == "ip_image_proj":
            # populated post-hoc by loaders.ip_adapter.load_ip_adapter
            self.encoder_hid_proj = None
        elif encoder_hid_dim_type is not None:
            raise NotImplementedError(f"encoder_hid_dim_type {encoder_hid_dim_type} not yet supported")
        else:
            self.encoder_hid_proj = None

        if class_embed_type is None and num_class_embeds is not None:
            self.class_embedding = Embedding(num_class_embeds, time_embed_dim)
        elif class_embed_type == "timestep":
            self.class_embedding = TimestepEmbedding(timestep_input_dim, time_embed_dim, act_fn=act_fn)
        elif class_embed_type == "identity":
            self.class_embedding = Identity()
        elif class_embed_type == "projection":
            self.class_embedding = TimestepEmbedding(projection_class_embeddings_input_dim, time_embed_dim)
        elif class_embed_type == "simple_projection":
            # AudioLDM: one linear over the CLAP embedding (reference :539)
            self.class_embedding = Linear(projection_class_embeddings_input_dim, time_embed_dim)
        else:
            self.class_embedding = None

        if addition_embed_type == "text":
            # DeepFloyd IF: attention-pooled text aug embedding over the RAW
            # encoder states (reference unet_2d_condition.py:667)
            text_time_embedding_from_dim = encoder_hid_dim if encoder_hid_dim is not None else cross_attention_dims[0]
            self.add_embedding = TextTimeEmbedding(
                text_time_embedding_from_dim, time_embed_dim, num_heads=addition_embed_type_num_heads
            )
        elif addition_embed_type == "text_time":
            self.add_time_proj = Timesteps(addition_time_embed_dim, flip_sin_to_cos, freq_shift)
            self.add_embedding = TimestepEmbedding(projection_class_embeddings_input_dim, time_embed_dim)
        elif addition_embed_type == "text_image":
            # Kandinsky 2.1 (reference unet_2d_condition.py:676)
            from ..embeddings import TextImageTimeEmbedding

            self.add_embedding = TextImageTimeEmbedding(
                text_embed_dim=cross_attention_dims[0], image_embed_dim=cross_attention_dims[0],
                time_embed_dim=time_embed_dim,
            )
        elif addition_embed_type == "image":
            # Kandinsky 2.2
            from ..embeddings import ImageTimeEmbedding

            self.add_embedding = ImageTimeEmbedding(image_embed_dim=encoder_hid_dim, time_embed_dim=time_embed_dim)
        elif addition_embed_type is not None:
            raise NotImplementedError(f"addition_embed_type {addition_embed_type} not yet supported")

        self.time_embed_act = get_activation(time_embedding_act_fn) if time_embedding_act_fn else None

        # AudioLDM concatenates the class (CLAP) embedding onto the time
        # embedding, so every block's temb projection is double-width
        # (reference unet_2d_condition.py `blocks_time_embed_dim`).
        blocks_time_embed_dim = time_embed_dim * 2 if class_embeddings_concat else time_embed_dim

        # down
        down_blocks = []
        output_channel = block_out_channels[0]
        for i, down_block_type in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final_block = i == n_blocks - 1
            down_blocks.append(
                get_down_block(
                    down_block_type,
                    num_layers=layers_per_block_l[i],
                    transformer_layers_per_block=transformer_layers[i],
                    in_channels=input_channel,
                    out_channels=output_channel,
                    temb_channels=blocks_time_embed_dim,
                    add_downsample=not is_final_block,
                    resnet_eps=norm_eps,
                    resnet_act_fn=act_fn,
                    resnet_groups=norm_num_groups,
                    cross_attention_dim=cross_attention_dims[i],
                    num_attention_heads=num_attention_heads[i],
                    attention_head_dim=num_attention_heads[i],
                    downsample_padding=downsample_padding,
                    use_linear_projection=use_linear_projection,
                    only_cross_attention=only_cross_attention_l[i],
                    resnet_time_scale_shift=resnet_time_scale_shift,
                )
            )
        self.down_blocks = ModuleList(down_blocks)

        # mid
        if mid_block_type == "UNetMidBlock2DSimpleCrossAttn":
            from .unet_2d_simple_blocks import UNetMidBlock2DSimpleCrossAttn

            self.mid_block = UNetMidBlock2DSimpleCrossAttn(
                in_channels=block_out_channels[-1],
                temb_channels=blocks_time_embed_dim,
                resnet_eps=norm_eps,
                resnet_act_fn=act_fn,
                output_scale_factor=mid_block_scale_factor,
                resnet_time_scale_shift=resnet_time_scale_shift,
                cross_attention_dim=cross_attention_dims[-1],
                attention_head_dim=attention_head_dim if isinstance(attention_head_dim, int) else attention_head_dim[-1],
                resnet_groups=norm_num_groups,
            )
        elif mid_block_type == "UNetMidBlock2DCrossAttn":
            self.mid_block = UNetMidBlock2DCrossAttn(
                transformer_layers_per_block=transformer_layers[-1],
                in_channels=block_out_channels[-1],
                temb_channels=blocks_time_embed_dim,
                resnet_eps=norm_eps,
                resnet_act_fn=act_fn,
                output_scale_factor=mid_block_scale_factor,
                resnet_time_scale_shift=resnet_time_scale_shift,
                cross_attention_dim=cross_attention_dims[-1],
                num_attention_heads=num_attention_heads[-1],
                resnet_groups=norm_num_groups,
                use_linear_projection=use_linear_projection,
            )
        elif mid_block_type is None:
            self.mid_block = None
        else:
            raise NotImplementedError(f"mid_block_type {mid_block_type} not yet supported")

        # up
        up_blocks = []
        reversed_block_out_channels = list(reversed(block_out_channels))
        reversed_num_attention_heads = list(reversed(num_attention_heads))
        reversed_layers_per_block = list(reversed(layers_per_block_l))
        reversed_cross_attention_dim = list(reversed(cross_attention_dims))
        reversed_transformer_layers = (
            list(reversed(transformer_layers))
            if reverse_transformer_layers_per_block is None
            else list(reverse_transformer_layers_per_block)
        )
        reversed_only_cross_attention = list(reversed(only_cross_attention_l))
        output_channel = reversed_block_out_channels[0]
        for i, up_block_type in enumerate(up_block_types):
            is_final_block = i == n_blocks - 1
            prev_output_channel = output_channel
            output_channel = reversed_block_out_channels[i]
            input_channel = reversed_block_out_channels[min(i + 1, n_blocks - 1)]
            up_blocks.append(
                get_up_block(
                    up_block_type,
                    num_layers=reversed_layers_per_block[i] + 1,
                    transformer_layers_per_block=reversed_transformer_layers[i],
                    in_channels=input_channel,
                    out_channels=output_channel,
                    prev_output_channel=prev_output_channel,
                    temb_channels=blocks_time_embed_dim,
                    add_upsample=not is_final_block,
                    resnet_eps=norm_eps,
                    resnet_act_fn=act_fn,
                    resnet_groups=norm_num_groups,
                    cross_attention_dim=reversed_cross_attention_dim[i],
                    num_attention_heads=reversed_num_attention_heads[i],
                    attention_head_dim=reversed_num_attention_heads[i],
                    use_linear_projection=use_linear_projection,
                    only_cross_attention=reversed_only_cross_attention[i],
                    resnet_time_scale_shift=resnet_time_scale_shift,
                )
            )
        self.up_blocks = ModuleList(up_blocks)

        if norm_num_groups is not None:
            self.conv_norm_out = GroupNorm(
                num_channels=block_out_channels[0], num_groups=norm_num_groups, eps=norm_eps
            )
            self.conv_act = get_activation(act_fn)
        else:
            self.conv_norm_out = None
        conv_out_padding = (conv_out_kernel - 1) // 2
        self.conv_out = Conv2d(block_out_channels[0], out_channels, kernel_size=conv_out_kernel, padding=conv_out_padding)

    # ------------------------------------------------------------------
    def __call__(
        self,
        params: Params,
        sample: jax.Array,  # [B, C, H, W]
        timestep: Union[jax.Array, float, int],
        encoder_hidden_states: jax.Array,  # [B, S, D]
        class_labels: Optional[jax.Array] = None,
        timestep_cond: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        added_cond_kwargs: Optional[Dict[str, jax.Array]] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
        down_block_additional_residuals: Optional[Tuple[jax.Array, ...]] = None,
        mid_block_additional_residual: Optional[jax.Array] = None,
        down_intrablock_additional_residuals: Optional[Tuple[jax.Array, ...]] = None,
        return_dict: bool = True,
    ) -> Union[UNet2DConditionOutput, tuple]:
        if self.config.center_input_sample:
            sample = 2 * sample - 1.0

        # 1. time
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
            # Identity class embedding ("identity" type) owns no params
            class_emb = self.class_embedding(params.get("class_embedding", {}), class_labels).astype(sample.dtype)
            if self.config.class_embeddings_concat:
                emb = jnp.concatenate([emb, class_emb], axis=-1)
            else:
                emb = emb + class_emb

        if self.config.addition_embed_type == "text":
            emb = emb + self.add_embedding(params["add_embedding"], encoder_hidden_states)
        elif self.config.addition_embed_type == "text_image":
            # Kandinsky 2.1 (reference unet_2d_condition.py:896)
            if added_cond_kwargs is None or "image_embeds" not in added_cond_kwargs:
                raise ValueError("addition_embed_type 'text_image' requires added_cond_kwargs with image_embeds")
            image_embs = added_cond_kwargs["image_embeds"]
            text_embs = added_cond_kwargs.get("text_embeds", encoder_hidden_states)
            emb = emb + self.add_embedding(params["add_embedding"], text_embs, image_embs)
        elif self.config.addition_embed_type == "image":
            if added_cond_kwargs is None or "image_embeds" not in added_cond_kwargs:
                raise ValueError("addition_embed_type 'image' requires added_cond_kwargs with image_embeds")
            emb = emb + self.add_embedding(params["add_embedding"], added_cond_kwargs["image_embeds"])
        elif self.config.addition_embed_type == "text_time":
            if added_cond_kwargs is None or "text_embeds" not in added_cond_kwargs:
                raise ValueError("addition_embed_type 'text_time' requires added_cond_kwargs with text_embeds/time_ids")
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = self.add_time_proj({}, time_ids.reshape(-1))
            time_embeds = time_embeds.reshape(text_embeds.shape[0], -1)
            add_embeds = jnp.concatenate([text_embeds, time_embeds], axis=-1).astype(sample.dtype)
            aug_emb = self.add_embedding(params["add_embedding"], add_embeds)
            emb = emb + aug_emb

        if self.time_embed_act is not None:
            emb = self.time_embed_act(emb)

        if self.encoder_hid_proj is not None:
            from ..ip_adapter import MultiIPAdapterImageProjection

            if isinstance(self.encoder_hid_proj, MultiIPAdapterImageProjection):
                # IP-Adapter: project image embeds, carry as (text, ip_list)
                # tuple (reference process_encoder_hidden_states,
                # unet_2d_condition.py:964 'ip_image_proj')
                if added_cond_kwargs is None or "image_embeds" not in added_cond_kwargs:
                    raise ValueError("IP-Adapter is loaded: pass added_cond_kwargs={'image_embeds': [...]}")
                image_embeds = self.encoder_hid_proj(params["encoder_hid_proj"], added_cond_kwargs["image_embeds"])
                encoder_hidden_states = (encoder_hidden_states, image_embeds)
            elif self.config.encoder_hid_dim_type == "text_image_proj":
                # Kandinsky 2.1: joint text+image cross-attention tokens
                if added_cond_kwargs is None or "image_embeds" not in added_cond_kwargs:
                    raise ValueError("encoder_hid_dim_type 'text_image_proj' requires added_cond_kwargs with image_embeds")
                encoder_hidden_states = self.encoder_hid_proj(
                    params["encoder_hid_proj"], encoder_hidden_states, added_cond_kwargs["image_embeds"]
                )
            elif self.config.encoder_hid_dim_type == "image_proj":
                # Kandinsky 2.2: cross-attend to projected image tokens only
                encoder_hidden_states = self.encoder_hid_proj(
                    params["encoder_hid_proj"], added_cond_kwargs["image_embeds"]
                )
            else:
                encoder_hidden_states = self.encoder_hid_proj(params["encoder_hid_proj"], encoder_hidden_states)

        # boolean/int [B, K] text mask → additive bias broadcastable over
        # [B, H, Q, K] (reference unet_2d_condition.py encoder_attention_mask
        # preprocessing: (1 − mask)·−10000, unsqueeze)
        if encoder_attention_mask is not None and encoder_attention_mask.ndim == 2:
            encoder_attention_mask = (
                (1 - encoder_attention_mask.astype(sample.dtype)) * -10000.0)[:, None, None, :]

        # 2. pre-process (NCHW -> NHWC)
        sample = jnp.transpose(sample, (0, 2, 3, 1))
        sample = self.conv_in(params["conv_in"], sample)

        # 3. down — T2I-Adapter intrablock residuals arrive NCHW (reference
        # unet_2d_condition.py:1214 is_adapter branches), consumed one per block
        intrablock = None
        if down_intrablock_additional_residuals is not None:
            intrablock = [jnp.transpose(r, (0, 2, 3, 1)) for r in down_intrablock_additional_residuals]

        down_block_res_samples = (sample,)
        for i, block in enumerate(self.down_blocks):
            if getattr(block, "has_cross_attention", False):
                extra = intrablock.pop(0) if intrablock else None
                sample, res_samples = block(
                    params["down_blocks"][i],
                    sample,
                    temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    attention_mask=attention_mask,
                    encoder_attention_mask=encoder_attention_mask,
                    additional_residual=extra,
                )
            else:
                sample, res_samples = block(params["down_blocks"][i], sample, temb=emb)
                if intrablock and sample.shape == intrablock[0].shape:
                    sample = sample + intrablock.pop(0)
                    res_samples = res_samples[:-1] + (sample,)
            down_block_res_samples += res_samples

        # 3.5 ControlNet residuals (public contract is NCHW; internals NHWC)
        if down_block_additional_residuals is not None:
            down_block_res_samples = tuple(
                r + jnp.transpose(cr, (0, 2, 3, 1))
                for r, cr in zip(down_block_res_samples, down_block_additional_residuals)
            )

        # 4. mid — a leftover adapter feature at mid resolution applies here
        # (reference unet_2d_condition.py:1262)
        if intrablock and self.mid_block is not None and sample.shape == intrablock[0].shape:
            sample = sample + intrablock.pop(0)
        if self.mid_block is not None:
            sample = self.mid_block(
                params["mid_block"],
                sample,
                temb=emb,
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=attention_mask,
                encoder_attention_mask=encoder_attention_mask,
            )
        if mid_block_additional_residual is not None:
            sample = sample + jnp.transpose(mid_block_additional_residual, (0, 2, 3, 1))

        # 5. up
        for i, block in enumerate(self.up_blocks):
            n = len(block.resnets)
            res_samples = down_block_res_samples[-n:]
            down_block_res_samples = down_block_res_samples[:-n]
            if getattr(block, "has_cross_attention", False):
                sample = block(
                    params["up_blocks"][i],
                    sample,
                    res_samples,
                    temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    attention_mask=attention_mask,
                    encoder_attention_mask=encoder_attention_mask,
                )
            else:
                sample = block(params["up_blocks"][i], sample, res_samples, temb=emb)

        # 6. post-process
        if self.conv_norm_out is not None:
            sample = self.conv_norm_out(params["conv_norm_out"], sample)
            sample = self.conv_act(sample)
        sample = self.conv_out(params["conv_out"], sample)
        sample = jnp.transpose(sample, (0, 3, 1, 2))

        if not return_dict:
            return (sample,)
        return UNet2DConditionOutput(sample=sample)

    # ------------------------------------------------------------- FreeU
    def enable_freeu(self, s1: float, s2: float, b1: float, b2: float):
        """Enable FreeU (arXiv:2309.11497) — trace-time flags on the up
        blocks (reference `StableDiffusionMixin.enable_freeu`,
        `pipelines/pipeline_utils.py:2288`). Pipelines must clear their jit
        cache after toggling (DiffusionPipeline.enable_freeu does)."""
        freeu = {"s1": s1, "s2": s2, "b1": b1, "b2": b2}
        for i, block in enumerate(self.up_blocks):
            block.freeu = freeu
            block.resolution_idx = i

    def disable_freeu(self):
        for block in self.up_blocks:
            block.freeu = None
