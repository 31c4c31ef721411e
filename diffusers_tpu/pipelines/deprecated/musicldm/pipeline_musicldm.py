"""MusicLDM text-to-music pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/musicldm/pipeline_musicldm.py`
MusicLDMPipeline): identical conditioning contract to AudioLDM — normalized
CLAP pooled text features as FiLM `class_labels` with
`encoder_hidden_states=None` — over a mel VAE + SpeechT5 HiFi-GAN vocoder;
MusicLDM's CLAP is the full `ClapModel` (music-tuned), whose text tower our
`ClapTextModelWithProjection` loads directly.
"""

from __future__ import annotations

from ..audioldm.pipeline_audioldm import AudioLDMPipeline, AudioPipelineOutput


class MusicLDMPipeline(AudioLDMPipeline):
    _optional_components = ["feature_extractor"]

    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler, vocoder,
                 feature_extractor=None):
        super().__init__(vae, text_encoder, tokenizer, unet, scheduler, vocoder)
        self.register_modules(feature_extractor=feature_extractor)


__all__ = ["AudioPipelineOutput", "MusicLDMPipeline"]
