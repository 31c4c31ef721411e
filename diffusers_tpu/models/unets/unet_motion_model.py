"""AnimateDiff motion UNet: UNet2DCondition blocks interleaved with temporal
transformers, plus the MotionAdapter weight container.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/unets/unet_motion_model.py`
(DownBlockMotion `:214`, CrossAttnDownBlockMotion `:342`, CrossAttnUpBlockMotion
`:527`, UpBlockMotion `:719`, UNetMidBlockCrossAttnMotion `:854`, MotionAdapter
`:1060`, UNetMotionModel `:1201`, forward `:1883`).

TPU design: spatial blocks run on NHWC ``[B*F, H, W, C]`` exactly like
UNet2DConditionModel; the motion modules view the same activations as
``[(B H W), F, C]`` sequences. ``num_frames`` is a static Python int so the
whole video forward stays a single fused XLA program. Public API keeps the
reference's NCFHW sample layout ``[B, C, F, H, W]``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, GroupNorm, Linear, Module, ModuleList, Params, get_activation
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from ..resnet import Downsample2D, ResnetBlock2D, Upsample2D
from ..transformers.transformer_2d import Transformer2DModel
from ..transformers.transformer_temporal import AnimateDiffTransformer3D
from .unet_2d_condition import UNet2DConditionModel


@dataclass
class UNetMotionOutput(BaseOutput):
    sample: jax.Array


def _per_layer(value, num_layers):
    if isinstance(value, (list, tuple)):
        return list(value)
    return [value] * num_layers


def _make_motion_modules(
    out_channels: int,
    num_layers: int,
    temporal_num_attention_heads,
    temporal_transformer_layers_per_block,
    resnet_groups: int,
    temporal_cross_attention_dim: Optional[int],
    temporal_max_seq_length: int,
    temporal_double_self_attention: bool = True,
) -> ModuleList:
    heads = _per_layer(temporal_num_attention_heads, num_layers)
    tlayers = _per_layer(temporal_transformer_layers_per_block, num_layers)
    return ModuleList(
        [
            AnimateDiffTransformer3D(
                num_attention_heads=heads[i],
                attention_head_dim=out_channels // heads[i],
                in_channels=out_channels,
                num_layers=tlayers[i],
                norm_num_groups=resnet_groups,
                cross_attention_dim=temporal_cross_attention_dim,
                attention_bias=False,
                activation_fn="geglu",
                positional_embeddings="sinusoidal",
                num_positional_embeddings=temporal_max_seq_length,
                double_self_attention=temporal_double_self_attention,
            )
            for i in range(num_layers)
        ]
    )


class DownBlockMotion(Module):
    has_cross_attention = False

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        temb_channels: int,
        num_layers: int = 1,
        resnet_eps: float = 1e-6,
        resnet_time_scale_shift: str = "default",
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        output_scale_factor: float = 1.0,
        add_downsample: bool = True,
        downsample_padding: int = 1,
        temporal_num_attention_heads: Union[int, Tuple[int, ...]] = 1,
        temporal_cross_attention_dim: Optional[int] = None,
        temporal_max_seq_length: int = 32,
        temporal_transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        temporal_double_self_attention: bool = True,
    ):
        super().__init__()
        self.resnets = ModuleList(
            [
                ResnetBlock2D(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                )
                for i in range(num_layers)
            ]
        )
        self.motion_modules = _make_motion_modules(
            out_channels,
            num_layers,
            temporal_num_attention_heads,
            temporal_transformer_layers_per_block,
            resnet_groups,
            temporal_cross_attention_dim,
            temporal_max_seq_length,
            temporal_double_self_attention,
        )
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsamplers = ModuleList(
                [Downsample2D(out_channels, use_conv=True, out_channels=out_channels, padding=downsample_padding)]
            )

    def __call__(self, params: Params, hidden_states, temb=None, num_frames: int = 1):
        output_states = ()
        for i, (resnet, motion) in enumerate(zip(self.resnets, self.motion_modules)):
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            hidden_states = motion(params["motion_modules"][i], hidden_states, num_frames=num_frames)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class CrossAttnDownBlockMotion(Module):
    has_cross_attention = True

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        temb_channels: int,
        num_layers: int = 1,
        transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        resnet_eps: float = 1e-6,
        resnet_time_scale_shift: str = "default",
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        num_attention_heads: int = 1,
        cross_attention_dim: int = 1280,
        output_scale_factor: float = 1.0,
        downsample_padding: int = 1,
        add_downsample: bool = True,
        use_linear_projection: bool = False,
        only_cross_attention: bool = False,
        temporal_num_attention_heads: int = 8,
        temporal_cross_attention_dim: Optional[int] = None,
        temporal_max_seq_length: int = 32,
        temporal_transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        temporal_double_self_attention: bool = True,
    ):
        super().__init__()
        tl = _per_layer(transformer_layers_per_block, num_layers)
        self.resnets = ModuleList(
            [
                ResnetBlock2D(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                )
                for i in range(num_layers)
            ]
        )
        self.attentions = ModuleList(
            [
                Transformer2DModel(
                    num_attention_heads,
                    out_channels // num_attention_heads,
                    in_channels=out_channels,
                    num_layers=tl[i],
                    cross_attention_dim=cross_attention_dim,
                    norm_num_groups=resnet_groups,
                    use_linear_projection=use_linear_projection,
                    only_cross_attention=only_cross_attention,
                )
                for i in range(num_layers)
            ]
        )
        self.motion_modules = _make_motion_modules(
            out_channels,
            num_layers,
            temporal_num_attention_heads,
            temporal_transformer_layers_per_block,
            resnet_groups,
            temporal_cross_attention_dim,
            temporal_max_seq_length,
            temporal_double_self_attention,
        )
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsamplers = ModuleList(
                [Downsample2D(out_channels, use_conv=True, out_channels=out_channels, padding=downsample_padding)]
            )

    def __call__(
        self,
        params: Params,
        hidden_states,
        temb=None,
        encoder_hidden_states=None,
        attention_mask=None,
        encoder_attention_mask=None,
        num_frames: int = 1,
        additional_residual=None,
    ):
        output_states = ()
        n = len(self.resnets)
        for i in range(n):
            hidden_states = self.resnets[i](params["resnets"][i], hidden_states, temb)
            hidden_states = self.attentions[i](
                params["attentions"][i],
                hidden_states,
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=attention_mask,
                encoder_attention_mask=encoder_attention_mask,
            )
            hidden_states = self.motion_modules[i](params["motion_modules"][i], hidden_states, num_frames=num_frames)
            if i == n - 1 and additional_residual is not None:
                hidden_states = hidden_states + additional_residual
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UpBlockMotion(Module):
    has_cross_attention = False

    def __init__(
        self,
        in_channels: int,
        prev_output_channel: int,
        out_channels: int,
        temb_channels: int,
        num_layers: int = 1,
        resnet_eps: float = 1e-6,
        resnet_time_scale_shift: str = "default",
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        output_scale_factor: float = 1.0,
        add_upsample: bool = True,
        temporal_num_attention_heads: int = 8,
        temporal_cross_attention_dim: Optional[int] = None,
        temporal_max_seq_length: int = 32,
        temporal_transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
    ):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            res_skip_channels = in_channels if (i == num_layers - 1) else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            resnets.append(
                ResnetBlock2D(
                    in_channels=resnet_in_channels + res_skip_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                )
            )
        self.resnets = ModuleList(resnets)
        self.motion_modules = _make_motion_modules(
            out_channels,
            num_layers,
            temporal_num_attention_heads,
            temporal_transformer_layers_per_block,
            resnet_groups,
            temporal_cross_attention_dim,
            temporal_max_seq_length,
        )
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])

    def __call__(self, params: Params, hidden_states, res_hidden_states_tuple, temb=None, num_frames: int = 1):
        from ...utils.freeu_utils import apply_freeu

        freeu = getattr(self, "freeu", None)
        for i, (resnet, motion) in enumerate(zip(self.resnets, self.motion_modules)):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            if freeu:
                hidden_states, res_hidden_states = apply_freeu(
                    self.resolution_idx, hidden_states, res_hidden_states, **freeu
                )
            hidden_states = jnp.concatenate([hidden_states, res_hidden_states], axis=-1)
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            hidden_states = motion(params["motion_modules"][i], hidden_states, num_frames=num_frames)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class CrossAttnUpBlockMotion(Module):
    has_cross_attention = True

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        prev_output_channel: int,
        temb_channels: int,
        num_layers: int = 1,
        transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        resnet_eps: float = 1e-6,
        resnet_time_scale_shift: str = "default",
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        num_attention_heads: int = 1,
        cross_attention_dim: int = 1280,
        output_scale_factor: float = 1.0,
        add_upsample: bool = True,
        use_linear_projection: bool = False,
        only_cross_attention: bool = False,
        temporal_num_attention_heads: int = 8,
        temporal_cross_attention_dim: Optional[int] = None,
        temporal_max_seq_length: int = 32,
        temporal_transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
    ):
        super().__init__()
        tl = _per_layer(transformer_layers_per_block, num_layers)
        resnets = []
        attentions = []
        for i in range(num_layers):
            res_skip_channels = in_channels if (i == num_layers - 1) else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            resnets.append(
                ResnetBlock2D(
                    in_channels=resnet_in_channels + res_skip_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                )
            )
            attentions.append(
                Transformer2DModel(
                    num_attention_heads,
                    out_channels // num_attention_heads,
                    in_channels=out_channels,
                    num_layers=tl[i],
                    cross_attention_dim=cross_attention_dim,
                    norm_num_groups=resnet_groups,
                    use_linear_projection=use_linear_projection,
                    only_cross_attention=only_cross_attention,
                )
            )
        self.resnets = ModuleList(resnets)
        self.attentions = ModuleList(attentions)
        self.motion_modules = _make_motion_modules(
            out_channels,
            num_layers,
            temporal_num_attention_heads,
            temporal_transformer_layers_per_block,
            resnet_groups,
            temporal_cross_attention_dim,
            temporal_max_seq_length,
        )
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])

    def __call__(
        self,
        params: Params,
        hidden_states,
        res_hidden_states_tuple,
        temb=None,
        encoder_hidden_states=None,
        attention_mask=None,
        encoder_attention_mask=None,
        num_frames: int = 1,
    ):
        from ...utils.freeu_utils import apply_freeu

        freeu = getattr(self, "freeu", None)
        for i in range(len(self.resnets)):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            if freeu:
                hidden_states, res_hidden_states = apply_freeu(
                    self.resolution_idx, hidden_states, res_hidden_states, **freeu
                )
            hidden_states = jnp.concatenate([hidden_states, res_hidden_states], axis=-1)
            hidden_states = self.resnets[i](params["resnets"][i], hidden_states, temb)
            hidden_states = self.attentions[i](
                params["attentions"][i],
                hidden_states,
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=attention_mask,
                encoder_attention_mask=encoder_attention_mask,
            )
            hidden_states = self.motion_modules[i](params["motion_modules"][i], hidden_states, num_frames=num_frames)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class UNetMidBlockCrossAttnMotion(Module):
    has_cross_attention = True

    def __init__(
        self,
        in_channels: int,
        temb_channels: int,
        num_layers: int = 1,
        transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        resnet_eps: float = 1e-6,
        resnet_time_scale_shift: str = "default",
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        num_attention_heads: int = 1,
        cross_attention_dim: int = 1280,
        output_scale_factor: float = 1.0,
        use_linear_projection: bool = False,
        temporal_num_attention_heads: int = 1,
        temporal_cross_attention_dim: Optional[int] = None,
        temporal_max_seq_length: int = 32,
        temporal_transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
    ):
        super().__init__()
        tl = _per_layer(transformer_layers_per_block, num_layers)
        resnets = [
            ResnetBlock2D(
                in_channels=in_channels,
                out_channels=in_channels,
                temb_channels=temb_channels,
                eps=resnet_eps,
                groups=resnet_groups,
                time_embedding_norm=resnet_time_scale_shift,
                non_linearity=resnet_act_fn,
                output_scale_factor=output_scale_factor,
            )
        ]
        attentions = []
        for i in range(num_layers):
            attentions.append(
                Transformer2DModel(
                    num_attention_heads,
                    in_channels // num_attention_heads,
                    in_channels=in_channels,
                    num_layers=tl[i],
                    cross_attention_dim=cross_attention_dim,
                    norm_num_groups=resnet_groups,
                    use_linear_projection=use_linear_projection,
                )
            )
            resnets.append(
                ResnetBlock2D(
                    in_channels=in_channels,
                    out_channels=in_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    time_embedding_norm=resnet_time_scale_shift,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                )
            )
        self.resnets = ModuleList(resnets)
        self.attentions = ModuleList(attentions)
        self.motion_modules = _make_motion_modules(
            in_channels,
            num_layers,
            temporal_num_attention_heads,
            temporal_transformer_layers_per_block,
            resnet_groups,
            temporal_cross_attention_dim,
            temporal_max_seq_length,
        )

    def __call__(
        self,
        params: Params,
        hidden_states,
        temb=None,
        encoder_hidden_states=None,
        attention_mask=None,
        encoder_attention_mask=None,
        num_frames: int = 1,
    ):
        hidden_states = self.resnets[0](params["resnets"][0], hidden_states, temb)
        for i in range(len(self.attentions)):
            hidden_states = self.attentions[i](
                params["attentions"][i],
                hidden_states,
                encoder_hidden_states=encoder_hidden_states,
                attention_mask=attention_mask,
                encoder_attention_mask=encoder_attention_mask,
            )
            hidden_states = self.motion_modules[i](params["motion_modules"][i], hidden_states, num_frames=num_frames)
            hidden_states = self.resnets[i + 1](params["resnets"][i + 1], hidden_states, temb)
        return hidden_states


class _MotionModules(Module):
    """A stack of AnimateDiffTransformer3D modules (reference MotionModules
    `unet_motion_model.py:1019`); exists so MotionAdapter's param tree uses the
    reference's `<block>.motion_modules.<i>` key layout."""

    def __init__(
        self,
        in_channels: int,
        layers_per_block: int,
        transformer_layers_per_block,
        num_attention_heads,
        norm_num_groups: int,
        max_seq_length: int,
    ):
        super().__init__()
        self.motion_modules = _make_motion_modules(
            in_channels,
            layers_per_block,
            num_attention_heads,
            transformer_layers_per_block,
            norm_num_groups,
            None,
            max_seq_length,
        )


class MotionAdapter(Module, ModelMixin, ConfigMixin):
    """Weight container for AnimateDiff motion modules (reference
    `unet_motion_model.py:1060`). Holds no forward logic; combined with a
    spatial UNet via `UNetMotionModel.from_unet2d`."""

    @register_to_config
    def __init__(
        self,
        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        motion_layers_per_block: Union[int, Tuple[int, ...]] = 2,
        motion_transformer_layers_per_block: Union[int, Tuple] = 1,
        motion_mid_block_layers_per_block: int = 1,
        motion_transformer_layers_per_mid_block: Union[int, Tuple[int, ...]] = 1,
        motion_num_attention_heads: Union[int, Tuple[int, ...]] = 8,
        motion_norm_num_groups: int = 32,
        motion_max_seq_length: int = 32,
        use_motion_mid_block: bool = True,
        conv_in_channels: Optional[int] = None,
    ):
        super().__init__()
        n = len(block_out_channels)
        layers = _per_layer(motion_layers_per_block, n)
        tlayers = _per_layer(motion_transformer_layers_per_block, n)
        heads = _per_layer(motion_num_attention_heads, n)
        mid_tlayers = _per_layer(motion_transformer_layers_per_mid_block, motion_mid_block_layers_per_block)

        if conv_in_channels:
            self.conv_in = Conv2d(conv_in_channels, block_out_channels[0], kernel_size=3, padding=1)
        else:
            self.conv_in = None

        self.down_blocks = ModuleList(
            [
                _MotionModules(
                    block_out_channels[i],
                    layers[i],
                    tlayers[i],
                    heads[i],
                    motion_norm_num_groups,
                    motion_max_seq_length,
                )
                for i in range(n)
            ]
        )
        if use_motion_mid_block:
            self.mid_block = _MotionModules(
                block_out_channels[-1],
                motion_mid_block_layers_per_block,
                mid_tlayers,
                heads[-1],
                motion_norm_num_groups,
                motion_max_seq_length,
            )
        else:
            self.mid_block = None
        rev_channels = list(reversed(block_out_channels))
        rev_layers = list(reversed(layers))
        rev_tlayers = list(reversed(tlayers))
        rev_heads = list(reversed(heads))
        self.up_blocks = ModuleList(
            [
                _MotionModules(
                    rev_channels[i],
                    rev_layers[i] + 1,
                    rev_tlayers[i],
                    rev_heads[i],
                    motion_norm_num_groups,
                    motion_max_seq_length,
                )
                for i in range(n)
            ]
        )

    def __call__(self, params: Params, sample):
        raise RuntimeError("MotionAdapter is a weight container; use UNetMotionModel.from_unet2d")


class UNetMotionModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        sample_size: Optional[int] = None,
        in_channels: int = 4,
        out_channels: int = 4,
        down_block_types: Tuple[str, ...] = (
            "CrossAttnDownBlockMotion",
            "CrossAttnDownBlockMotion",
            "CrossAttnDownBlockMotion",
            "DownBlockMotion",
        ),
        up_block_types: Tuple[str, ...] = (
            "UpBlockMotion",
            "CrossAttnUpBlockMotion",
            "CrossAttnUpBlockMotion",
            "CrossAttnUpBlockMotion",
        ),
        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        layers_per_block: Union[int, Tuple[int, ...]] = 2,
        downsample_padding: int = 1,
        mid_block_scale_factor: float = 1,
        act_fn: str = "silu",
        norm_num_groups: int = 32,
        norm_eps: float = 1e-5,
        cross_attention_dim: int = 1280,
        transformer_layers_per_block: Union[int, Tuple] = 1,
        reverse_transformer_layers_per_block: Optional[Tuple] = None,
        temporal_transformer_layers_per_block: Union[int, Tuple] = 1,
        reverse_temporal_transformer_layers_per_block: Optional[Tuple] = None,
        transformer_layers_per_mid_block: Optional[Union[int, Tuple[int, ...]]] = None,
        temporal_transformer_layers_per_mid_block: Union[int, Tuple[int, ...]] = 1,
        use_linear_projection: bool = False,
        num_attention_heads: Union[int, Tuple[int, ...]] = 8,
        motion_max_seq_length: int = 32,
        motion_num_attention_heads: Union[int, Tuple[int, ...]] = 8,
        use_motion_mid_block: bool = True,
        mid_block_layers: int = 1,
        encoder_hid_dim: Optional[int] = None,
        encoder_hid_dim_type: Optional[str] = None,
        addition_embed_type: Optional[str] = None,
        addition_time_embed_dim: Optional[int] = None,
        projection_class_embeddings_input_dim: Optional[int] = None,
        time_cond_proj_dim: Optional[int] = None,
    ):
        super().__init__()
        n_blocks = len(down_block_types)
        num_attention_heads_l = _per_layer(num_attention_heads, n_blocks)
        layers_per_block_l = _per_layer(layers_per_block, n_blocks)
        transformer_layers = _per_layer(transformer_layers_per_block, n_blocks)
        temporal_transformer_layers = _per_layer(temporal_transformer_layers_per_block, n_blocks)
        motion_heads_l = _per_layer(motion_num_attention_heads, n_blocks)

        time_embed_dim = block_out_channels[0] * 4
        self.conv_in = Conv2d(in_channels, block_out_channels[0], kernel_size=3, padding=1)
        self.time_proj = Timesteps(block_out_channels[0], True, 0)
        self.time_embedding = TimestepEmbedding(
            block_out_channels[0], time_embed_dim, act_fn=act_fn, cond_proj_dim=time_cond_proj_dim
        )

        if encoder_hid_dim_type is None:
            self.encoder_hid_proj = None
        elif encoder_hid_dim_type == "ip_image_proj":
            self.encoder_hid_proj = None  # populated by IP-Adapter loader
        else:
            raise NotImplementedError(f"encoder_hid_dim_type {encoder_hid_dim_type} not yet supported")

        if addition_embed_type == "text_time":
            self.add_time_proj = Timesteps(addition_time_embed_dim, True, 0)
            self.add_embedding = TimestepEmbedding(projection_class_embeddings_input_dim, time_embed_dim)
        elif addition_embed_type is not None:
            raise NotImplementedError(f"addition_embed_type {addition_embed_type} not yet supported")

        # down
        down_blocks = []
        output_channel = block_out_channels[0]
        for i, block_type in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final = i == n_blocks - 1
            common = dict(
                num_layers=layers_per_block_l[i],
                in_channels=input_channel,
                out_channels=output_channel,
                temb_channels=time_embed_dim,
                resnet_eps=norm_eps,
                resnet_act_fn=act_fn,
                resnet_groups=norm_num_groups,
                add_downsample=not is_final,
                downsample_padding=downsample_padding,
                temporal_num_attention_heads=motion_heads_l[i],
                temporal_max_seq_length=motion_max_seq_length,
                temporal_transformer_layers_per_block=temporal_transformer_layers[i],
            )
            if block_type == "CrossAttnDownBlockMotion":
                down_blocks.append(
                    CrossAttnDownBlockMotion(
                        transformer_layers_per_block=transformer_layers[i],
                        num_attention_heads=num_attention_heads_l[i],
                        cross_attention_dim=cross_attention_dim,
                        use_linear_projection=use_linear_projection,
                        **common,
                    )
                )
            elif block_type == "DownBlockMotion":
                down_blocks.append(DownBlockMotion(**common))
            else:
                raise ValueError(f"unsupported down_block_type {block_type}")
        self.down_blocks = ModuleList(down_blocks)

        # mid
        mid_tl = (
            transformer_layers_per_mid_block
            if transformer_layers_per_mid_block is not None
            else (transformer_layers[-1] if isinstance(transformer_layers[-1], int) else 1)
        )
        if use_motion_mid_block:
            self.mid_block = UNetMidBlockCrossAttnMotion(
                in_channels=block_out_channels[-1],
                temb_channels=time_embed_dim,
                num_layers=mid_block_layers,
                transformer_layers_per_block=mid_tl,
                resnet_eps=norm_eps,
                resnet_act_fn=act_fn,
                output_scale_factor=mid_block_scale_factor,
                cross_attention_dim=cross_attention_dim,
                num_attention_heads=num_attention_heads_l[-1],
                resnet_groups=norm_num_groups,
                use_linear_projection=use_linear_projection,
                temporal_num_attention_heads=motion_heads_l[-1],
                temporal_max_seq_length=motion_max_seq_length,
                temporal_transformer_layers_per_block=temporal_transformer_layers_per_mid_block,
            )
        else:
            from .unet_2d_condition_blocks import UNetMidBlock2DCrossAttn

            self.mid_block = UNetMidBlock2DCrossAttn(
                in_channels=block_out_channels[-1],
                temb_channels=time_embed_dim,
                num_layers=mid_block_layers,
                transformer_layers_per_block=mid_tl,
                resnet_eps=norm_eps,
                resnet_act_fn=act_fn,
                output_scale_factor=mid_block_scale_factor,
                cross_attention_dim=cross_attention_dim,
                num_attention_heads=num_attention_heads_l[-1],
                resnet_groups=norm_num_groups,
                use_linear_projection=use_linear_projection,
            )

        # up
        up_blocks = []
        rev_channels = list(reversed(block_out_channels))
        rev_heads = list(reversed(num_attention_heads_l))
        rev_layers = list(reversed(layers_per_block_l))
        rev_tl = (
            list(reversed(transformer_layers))
            if reverse_transformer_layers_per_block is None
            else list(reverse_transformer_layers_per_block)
        )
        rev_temporal_tl = (
            list(reversed(temporal_transformer_layers))
            if reverse_temporal_transformer_layers_per_block is None
            else list(reverse_temporal_transformer_layers_per_block)
        )
        rev_motion_heads = list(reversed(motion_heads_l))
        output_channel = rev_channels[0]
        for i, block_type in enumerate(up_block_types):
            is_final = i == n_blocks - 1
            prev_output_channel = output_channel
            output_channel = rev_channels[i]
            input_channel = rev_channels[min(i + 1, n_blocks - 1)]
            common = dict(
                num_layers=rev_layers[i] + 1,
                in_channels=input_channel,
                out_channels=output_channel,
                prev_output_channel=prev_output_channel,
                temb_channels=time_embed_dim,
                resnet_eps=norm_eps,
                resnet_act_fn=act_fn,
                resnet_groups=norm_num_groups,
                add_upsample=not is_final,
                temporal_num_attention_heads=rev_motion_heads[i],
                temporal_max_seq_length=motion_max_seq_length,
                temporal_transformer_layers_per_block=rev_temporal_tl[i],
            )
            if block_type == "CrossAttnUpBlockMotion":
                up_blocks.append(
                    CrossAttnUpBlockMotion(
                        transformer_layers_per_block=rev_tl[i],
                        num_attention_heads=rev_heads[i],
                        cross_attention_dim=cross_attention_dim,
                        use_linear_projection=use_linear_projection,
                        **common,
                    )
                )
            elif block_type == "UpBlockMotion":
                up_blocks.append(UpBlockMotion(**common))
            else:
                raise ValueError(f"unsupported up_block_type {block_type}")
        self.up_blocks = ModuleList(up_blocks)

        self.conv_norm_out = GroupNorm(num_channels=block_out_channels[0], num_groups=norm_num_groups, eps=norm_eps)
        self.conv_act = get_activation(act_fn)
        self.conv_out = Conv2d(block_out_channels[0], out_channels, kernel_size=3, padding=1)

    # ------------------------------------------------------------------
    @classmethod
    def from_unet2d(
        cls,
        unet: UNet2DConditionModel,
        unet_params: Params,
        motion_adapter: Optional[MotionAdapter] = None,
        adapter_params: Optional[Params] = None,
    ):
        """Build a UNetMotionModel from a spatial UNet + MotionAdapter,
        merging their param trees (reference `UNetMotionModel.from_unet2d`
        `unet_motion_model.py:1404`). Returns `(model, params)`."""
        config = dict(unet.config)
        config["_class_name"] = cls.__name__
        config["down_block_types"] = [
            "CrossAttnDownBlockMotion" if "CrossAttn" in t else "DownBlockMotion" for t in config["down_block_types"]
        ]
        config["up_block_types"] = [
            "CrossAttnUpBlockMotion" if "CrossAttn" in t else "UpBlockMotion" for t in config["up_block_types"]
        ]
        if motion_adapter is not None:
            mcfg = motion_adapter.config
            config["motion_num_attention_heads"] = mcfg.motion_num_attention_heads
            config["motion_max_seq_length"] = mcfg.motion_max_seq_length
            config["use_motion_mid_block"] = mcfg.use_motion_mid_block
            config["temporal_transformer_layers_per_block"] = mcfg.motion_transformer_layers_per_block
            config["temporal_transformer_layers_per_mid_block"] = mcfg.motion_transformer_layers_per_mid_block
        if isinstance(config.get("num_attention_heads"), (int, list, tuple)) and config.get("num_attention_heads"):
            pass
        else:
            config["num_attention_heads"] = config.get("attention_head_dim", 8)
        allowed = {
            "sample_size", "in_channels", "out_channels", "down_block_types", "up_block_types",
            "block_out_channels", "layers_per_block", "downsample_padding", "mid_block_scale_factor",
            "act_fn", "norm_num_groups", "norm_eps", "cross_attention_dim", "transformer_layers_per_block",
            "reverse_transformer_layers_per_block", "temporal_transformer_layers_per_block",
            "reverse_temporal_transformer_layers_per_block", "transformer_layers_per_mid_block",
            "temporal_transformer_layers_per_mid_block", "use_linear_projection", "num_attention_heads",
            "motion_max_seq_length", "motion_num_attention_heads", "use_motion_mid_block", "mid_block_layers",
            "encoder_hid_dim", "encoder_hid_dim_type", "addition_embed_type", "addition_time_embed_dim",
            "projection_class_embeddings_input_dim", "time_cond_proj_dim",
        }
        model = cls(**{k: v for k, v in config.items() if k in allowed})

        params = jax.tree_util.tree_map(lambda x: x, unet_params)  # shallow copy of tree
        if motion_adapter is not None and adapter_params is not None:
            for i in range(len(model.down_blocks)):
                params["down_blocks"][i]["motion_modules"] = adapter_params["down_blocks"][i]["motion_modules"]
            for i in range(len(model.up_blocks)):
                params["up_blocks"][i]["motion_modules"] = adapter_params["up_blocks"][i]["motion_modules"]
            if model.config.use_motion_mid_block and "mid_block" in adapter_params:
                params["mid_block"]["motion_modules"] = adapter_params["mid_block"]["motion_modules"]
        else:
            key = jax.random.PRNGKey(0)
            fresh = model.init_params(key)
            for i in range(len(model.down_blocks)):
                params["down_blocks"][i]["motion_modules"] = fresh["down_blocks"][i]["motion_modules"]
            for i in range(len(model.up_blocks)):
                params["up_blocks"][i]["motion_modules"] = fresh["up_blocks"][i]["motion_modules"]
            if model.config.use_motion_mid_block:
                params["mid_block"]["motion_modules"] = fresh["mid_block"]["motion_modules"]
        return model, params

    # ------------------------------------------------------------------
    def __call__(
        self,
        params: Params,
        sample: jax.Array,  # [B, C, F, H, W]
        timestep: Union[jax.Array, float, int],
        encoder_hidden_states: jax.Array,  # [B*F, S, D] (pipeline pre-repeats per frame)
        timestep_cond: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        added_cond_kwargs: Optional[Dict[str, jax.Array]] = None,
        down_block_additional_residuals: Optional[Tuple[jax.Array, ...]] = None,
        mid_block_additional_residual: Optional[jax.Array] = None,
        return_dict: bool = True,
    ) -> Union[UNetMotionOutput, tuple]:
        batch, channels, num_frames, height, width = sample.shape

        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (batch,))
        t_emb = self.time_proj({}, timesteps).astype(sample.dtype)
        emb = self.time_embedding(params["time_embedding"], t_emb, timestep_cond)

        aug_emb = None
        if self.config.addition_embed_type == "text_time":
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = self.add_time_proj({}, time_ids.reshape(-1))
            time_embeds = time_embeds.reshape(text_embeds.shape[0], -1)
            add_embeds = jnp.concatenate([text_embeds, time_embeds], axis=-1).astype(emb.dtype)
            aug_emb = self.add_embedding(params["add_embedding"], add_embeds)
        emb = emb if aug_emb is None else emb + aug_emb
        emb = jnp.repeat(emb, num_frames, axis=0)

        if self.encoder_hid_proj is not None:
            from ..ip_adapter import MultiIPAdapterImageProjection

            if isinstance(self.encoder_hid_proj, MultiIPAdapterImageProjection):
                image_embeds = self.encoder_hid_proj(params["encoder_hid_proj"], added_cond_kwargs["image_embeds"])
                image_embeds = [jnp.repeat(e, num_frames, axis=0) for e in image_embeds]
                encoder_hidden_states = (encoder_hidden_states, image_embeds)

        # [B, C, F, H, W] -> [B*F, H, W, C]
        sample = jnp.transpose(sample, (0, 2, 3, 4, 1)).reshape(batch * num_frames, height, width, channels)
        sample = self.conv_in(params["conv_in"], sample)

        down_block_res_samples = (sample,)
        for i, block in enumerate(self.down_blocks):
            if block.has_cross_attention:
                sample, res_samples = block(
                    params["down_blocks"][i],
                    sample,
                    temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    attention_mask=attention_mask,
                    num_frames=num_frames,
                )
            else:
                sample, res_samples = block(params["down_blocks"][i], sample, temb=emb, num_frames=num_frames)
            down_block_res_samples += res_samples

        if down_block_additional_residuals is not None:
            down_block_res_samples = tuple(
                r + jnp.transpose(cr, (0, 2, 3, 1))
                for r, cr in zip(down_block_res_samples, down_block_additional_residuals)
            )

        if self.mid_block is not None:
            if hasattr(self.mid_block, "motion_modules"):
                sample = self.mid_block(
                    params["mid_block"],
                    sample,
                    temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    attention_mask=attention_mask,
                    num_frames=num_frames,
                )
            else:
                sample = self.mid_block(
                    params["mid_block"],
                    sample,
                    temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    attention_mask=attention_mask,
                )
        if mid_block_additional_residual is not None:
            sample = sample + jnp.transpose(mid_block_additional_residual, (0, 2, 3, 1))

        for i, block in enumerate(self.up_blocks):
            n = len(block.resnets)
            res_samples = down_block_res_samples[-n:]
            down_block_res_samples = down_block_res_samples[:-n]
            if block.has_cross_attention:
                sample = block(
                    params["up_blocks"][i],
                    sample,
                    res_samples,
                    temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    attention_mask=attention_mask,
                    num_frames=num_frames,
                )
            else:
                sample = block(params["up_blocks"][i], sample, res_samples, temb=emb, num_frames=num_frames)

        sample = self.conv_norm_out(params["conv_norm_out"], sample)
        sample = self.conv_act(sample)
        sample = self.conv_out(params["conv_out"], sample)

        # [B*F, H, W, C] -> [B, C, F, H, W]
        sample = sample.reshape(batch, num_frames, sample.shape[1], sample.shape[2], sample.shape[3])
        sample = jnp.transpose(sample, (0, 4, 1, 2, 3))

        if not return_dict:
            return (sample,)
        return UNetMotionOutput(sample=sample)

    def enable_freeu(self, s1: float, s2: float, b1: float, b2: float):
        freeu = {"s1": s1, "s2": s2, "b1": b1, "b2": b2}
        for i, block in enumerate(self.up_blocks):
            block.freeu = freeu
            block.resolution_idx = i

    def disable_freeu(self):
        for block in self.up_blocks:
            block.freeu = None
