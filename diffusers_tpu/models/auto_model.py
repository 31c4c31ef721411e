"""AutoModel: config-sniffing model class resolution (mirror of the reference
`models/auto_model.py:27`): reads `config.json`'s `_class_name` and loads the
matching TPU-native model class."""

from __future__ import annotations

import importlib
import json
import os
from typing import Optional

_MODEL_REGISTRY = {
    "UNet2DModel": "diffusers_tpu.models.unets.unet_2d.UNet2DModel",
    "UNet2DConditionModel": "diffusers_tpu.models.unets.unet_2d_condition.UNet2DConditionModel",
    "UNetMotionModel": "diffusers_tpu.models.unets.unet_motion_model.UNetMotionModel",
    "MotionAdapter": "diffusers_tpu.models.unets.unet_motion_model.MotionAdapter",
    "UNetSpatioTemporalConditionModel": "diffusers_tpu.models.unets.unet_spatio_temporal_condition.UNetSpatioTemporalConditionModel",
    "AutoencoderKLTemporalDecoder": "diffusers_tpu.models.autoencoders.autoencoder_kl_temporal_decoder.AutoencoderKLTemporalDecoder",
    "MochiTransformer3DModel": "diffusers_tpu.models.transformers.transformer_mochi.MochiTransformer3DModel",
    "AutoencoderKLMochi": "diffusers_tpu.models.autoencoders.autoencoder_kl_mochi.AutoencoderKLMochi",
    "StableAudioDiTModel": "diffusers_tpu.models.transformers.stable_audio_transformer.StableAudioDiTModel",
    "AutoencoderOobleck": "diffusers_tpu.models.autoencoders.autoencoder_oobleck.AutoencoderOobleck",
    "CogView3PlusTransformer2DModel": "diffusers_tpu.models.transformers.transformer_cogview3plus.CogView3PlusTransformer2DModel",
    "LuminaNextDiT2DModel": "diffusers_tpu.models.transformers.lumina_nextdit2d.LuminaNextDiT2DModel",
    "Kandinsky3UNet": "diffusers_tpu.models.unets.unet_kandinsky3.Kandinsky3UNet",
    "OmniGenTransformer2DModel": "diffusers_tpu.models.transformers.transformer_omnigen.OmniGenTransformer2DModel",
    "StableCascadeUNet": "diffusers_tpu.models.unets.unet_stable_cascade.StableCascadeUNet",
    "PaellaVQModel": "diffusers_tpu.models.autoencoders.paella_vq_model.PaellaVQModel",
    "AllegroTransformer3DModel": "diffusers_tpu.models.transformers.transformer_allegro.AllegroTransformer3DModel",
    "EasyAnimateTransformer3DModel": "diffusers_tpu.models.transformers.transformer_easyanimate.EasyAnimateTransformer3DModel",
    "HiDreamImageTransformer2DModel": "diffusers_tpu.models.transformers.transformer_hidream_image.HiDreamImageTransformer2DModel",
    "WanVACETransformer3DModel": "diffusers_tpu.models.transformers.transformer_wan_vace.WanVACETransformer3DModel",
    "SanaVideoTransformer3DModel": "diffusers_tpu.models.transformers.transformer_sana_video.SanaVideoTransformer3DModel",
    "Flux2Transformer2DModel": "diffusers_tpu.models.transformers.transformer_flux2.Flux2Transformer2DModel",
    "BriaTransformer2DModel": "diffusers_tpu.models.transformers.transformer_bria.BriaTransformer2DModel",
    "CosmosTransformer3DModel": "diffusers_tpu.models.transformers.transformer_cosmos.CosmosTransformer3DModel",
    "AuraFlowTransformer2DModel": "diffusers_tpu.models.transformers.auraflow_transformer_2d.AuraFlowTransformer2DModel",
    "Lumina2Transformer2DModel": "diffusers_tpu.models.transformers.transformer_lumina2.Lumina2Transformer2DModel",
    "ChromaTransformer2DModel": "diffusers_tpu.models.transformers.transformer_chroma.ChromaTransformer2DModel",
    "HunyuanDiT2DModel": "diffusers_tpu.models.transformers.hunyuan_transformer_2d.HunyuanDiT2DModel",
    "CogView4Transformer2DModel": "diffusers_tpu.models.transformers.transformer_cogview4.CogView4Transformer2DModel",
    "AsymmetricAutoencoderKL": "diffusers_tpu.models.autoencoders.autoencoder_asym_kl.AsymmetricAutoencoderKL",
    "LatteTransformer3DModel": "diffusers_tpu.models.transformers.latte_transformer_3d.LatteTransformer3DModel",
    "SkyReelsV2Transformer3DModel": "diffusers_tpu.models.transformers.transformer_skyreels_v2.SkyReelsV2Transformer3DModel",
    "QwenImageTransformer2DModel": "diffusers_tpu.models.transformers.transformer_qwenimage.QwenImageTransformer2DModel",
    "PriorTransformer": "diffusers_tpu.models.transformers.prior_transformer.PriorTransformer",
    "AutoencoderKL": "diffusers_tpu.models.autoencoders.autoencoder_kl.AutoencoderKL",
    "AutoencoderKLWan": "diffusers_tpu.models.autoencoders.autoencoder_kl_wan.AutoencoderKLWan",
    "FluxTransformer2DModel": "diffusers_tpu.models.transformers.transformer_flux.FluxTransformer2DModel",
    "SD3Transformer2DModel": "diffusers_tpu.models.transformers.transformer_sd3.SD3Transformer2DModel",
    "WanTransformer3DModel": "diffusers_tpu.models.transformers.transformer_wan.WanTransformer3DModel",
    "ControlNetModel": "diffusers_tpu.models.controlnets.controlnet.ControlNetModel",
    "CLIPTextModel": "diffusers_tpu.models.text_encoders.clip.CLIPTextModel",
    "CLIPTextModelWithProjection": "diffusers_tpu.models.text_encoders.clip.CLIPTextModelWithProjection",
    "T5EncoderModel": "diffusers_tpu.models.text_encoders.t5.T5EncoderModel",
}


class AutoModel:
    def __init__(self, *args, **kwargs):
        raise EnvironmentError("AutoModel is instantiated via `AutoModel.from_pretrained(...)`.")

    @classmethod
    def from_pretrained(cls, pretrained_model_or_path, subfolder: Optional[str] = None, **kwargs):
        path = str(pretrained_model_or_path)
        if subfolder:
            config_path = os.path.join(path, subfolder, "config.json")
        else:
            config_path = os.path.join(path, "config.json")
        with open(config_path) as f:
            config = json.load(f)
        class_name = config.get("_class_name") or config.get("architectures", [None])[0]
        if class_name not in _MODEL_REGISTRY:
            raise ValueError(f"AutoModel cannot resolve class {class_name!r}; known: {list(_MODEL_REGISTRY)}")
        module_name, cls_name = _MODEL_REGISTRY[class_name].rsplit(".", 1)
        model_cls = getattr(importlib.import_module(module_name), cls_name)
        return model_cls.from_pretrained(path, subfolder=subfolder, **kwargs)
