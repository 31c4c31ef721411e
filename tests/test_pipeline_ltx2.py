"""LTX2Pipeline end-to-end: serialize a tiny REFERENCE-layout checkpoint
(torch diffusers + transformers components via their own save_pretrained) and
run this framework's `from_pretrained` → 2-step audiovisual generate.

Reference: `/root/reference/src/diffusers/pipelines/ltx2/pipeline_ltx2.py:185`.
"""

import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


class DummyTokenizer:
    model_max_length = 512
    padding_side = "left"

    def __call__(self, prompts, padding=None, max_length=32, truncation=True,
                 return_tensors="np", **kwargs):
        if isinstance(prompts, str):
            prompts = [prompts]

        class Out(dict):
            pass

        ids, masks = [], []
        for p in prompts:
            n = min(max_length, max(4, len(p) % 7 + 4))
            # left padding (gemma chat style)
            ids.append([0] * (max_length - n) + [((hash(p) + i) % 70) + 1 for i in range(n)])
            masks.append([0] * (max_length - n) + [1] * n)
        o = Out()
        o.input_ids = np.array(ids)
        o.attention_mask = np.array(masks)
        o["input_ids"] = o.input_ids
        o["attention_mask"] = o.attention_mask
        return o


# consistent tiny geometry:
#   gemma hidden 32 x (2 layers + emb) = 96 stacked -> connectors (factor 3)
#   connector inner dims 32 (video) / 32 (audio) == transformer caption_channels
#   video VAE latent_channels 8 == transformer in_channels
#   audio VAE latent 4ch x (16 mel / 4) = 16 == transformer audio_in_channels
#   audio VAE base_channels 16 == packed audio dim (latents_mean/std broadcast)
VIDEO_VAE = dict(
    in_channels=3, out_channels=3, latent_channels=8,
    block_out_channels=(8, 16, 16), decoder_block_out_channels=(16, 32),
    layers_per_block=(1, 1, 1, 1), decoder_layers_per_block=(1, 1, 1),
    spatio_temporal_scaling=(True, True, True),
    decoder_spatio_temporal_scaling=(False, True),
    decoder_inject_noise=(False, False, False),
    downsample_type=("spatial", "temporal", "spatiotemporal"),
    upsample_type=("spatial", "spatiotemporal"),
    upsample_residual=(False, True), upsample_factor=(1, 2),
    timestep_conditioning=False, patch_size=2, patch_size_t=1,
    encoder_causal=True, decoder_causal=True,
)

AUDIO_VAE = dict(
    base_channels=16, output_channels=2, ch_mult=(1, 2, 2), num_res_blocks=1,
    attn_resolutions=None, in_channels=2, resolution=16, latent_channels=4,
    norm_type="pixel", causality_axis="height", mid_block_add_attention=False,
    mel_bins=16, double_z=True, sample_rate=16000, mel_hop_length=160,
)

TRANSFORMER = dict(
    in_channels=8, out_channels=8, num_attention_heads=2, attention_head_dim=12,
    cross_attention_dim=24, audio_in_channels=16, audio_out_channels=16,
    audio_num_attention_heads=2, audio_attention_head_dim=8,
    audio_cross_attention_dim=16, num_layers=2, caption_channels=32,
)

CONNECTORS = dict(
    caption_channels=32, text_proj_in_factor=3,
    video_connector_num_attention_heads=2, video_connector_attention_head_dim=16,
    video_connector_num_layers=1, video_connector_num_learnable_registers=4,
    audio_connector_num_attention_heads=2, audio_connector_attention_head_dim=16,
    audio_connector_num_layers=1, audio_connector_num_learnable_registers=4,
)

VOCODER = dict(
    in_channels=32, hidden_channels=16, out_channels=2,
    upsample_kernel_sizes=[4, 4], upsample_factors=[2, 2],
    resnet_kernel_sizes=[3, 7], resnet_dilations=[[1, 3], [1, 3]],
    act_fn="leaky_relu",
)


def _tiny_gemma3(torch):
    from transformers import Gemma3ForConditionalGeneration
    from transformers.models.gemma3.configuration_gemma3 import Gemma3Config

    cfg = Gemma3Config(
        text_config=dict(vocab_size=256, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=8,
                         sliding_window=8, sliding_window_pattern=2),
        vision_config=dict(hidden_size=16, intermediate_size=16, num_hidden_layers=1,
                           num_attention_heads=2, image_size=14, patch_size=7),
        mm_tokens_per_image=4,
    )
    return Gemma3ForConditionalGeneration(cfg)


def test_ltx2_from_pretrained_generate(tmp_path, torch):
    from diffusers import (
        AutoencoderKLLTX2Audio as TorchAudioVAE,
        AutoencoderKLLTX2Video as TorchVAE,
        FlowMatchEulerDiscreteScheduler as TorchSched,
        LTX2VideoTransformer3DModel as TorchTf,
    )
    from diffusers.pipelines.ltx2.connectors import LTX2TextConnectors as TorchConnectors
    from diffusers.pipelines.ltx2.vocoder import LTX2Vocoder as TorchVocoder

    from diffusers_tpu.pipelines.ltx2 import LTX2Pipeline

    torch.manual_seed(0)
    vcfg = dict(VIDEO_VAE)
    vcfg["down_block_types"] = ("LTX2VideoDownBlock3D",) * len(VIDEO_VAE["block_out_channels"])
    TorchVAE(**vcfg).save_pretrained(tmp_path / "vae")
    TorchAudioVAE(**AUDIO_VAE).save_pretrained(tmp_path / "audio_vae")
    TorchTf(**TRANSFORMER).save_pretrained(tmp_path / "transformer")
    TorchConnectors(**CONNECTORS).save_pretrained(tmp_path / "connectors")
    TorchVocoder(**VOCODER).save_pretrained(tmp_path / "vocoder")
    _tiny_gemma3(torch).save_pretrained(tmp_path / "text_encoder")
    TorchSched(use_dynamic_shifting=True, base_shift=0.95, max_shift=2.05).save_pretrained(
        tmp_path / "scheduler")

    index = {
        "_class_name": "LTX2Pipeline", "_diffusers_version": "0.40.0.dev0",
        "transformer": ["diffusers", "LTX2VideoTransformer3DModel"],
        "vae": ["diffusers", "AutoencoderKLLTX2Video"],
        "audio_vae": ["diffusers", "AutoencoderKLLTX2Audio"],
        "connectors": ["diffusers", "LTX2TextConnectors"],
        "vocoder": ["diffusers", "LTX2Vocoder"],
        "text_encoder": ["transformers", "Gemma3ForConditionalGeneration"],
        "tokenizer": [None, None],
        "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
    }
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(index, f)

    pipe = LTX2Pipeline.from_pretrained(str(tmp_path), tokenizer=DummyTokenizer())
    out = pipe(
        "a tide pool at dawn", height=32, width=32, num_frames=9, frame_rate=24.0,
        num_inference_steps=2, guidance_scale=3.0, key=jax.random.PRNGKey(0),
        max_sequence_length=8, output_type="np",
    )
    video, audio = np.asarray(out.frames), np.asarray(out.audio)
    assert video.ndim == 5 and np.isfinite(video).all()
    assert audio is not None and np.isfinite(audio).all()
    assert video.min() >= 0.0 and video.max() <= 1.0


def test_ltx2_stg_and_latent_output(tmp_path, torch):
    """STG + modality-isolation guidance branches and latent output, built
    directly (no serialization round-trip)."""
    from diffusers_tpu.models.autoencoders.autoencoder_kl_ltx2 import AutoencoderKLLTX2Video
    from diffusers_tpu.models.autoencoders.autoencoder_kl_ltx2_audio import AutoencoderKLLTX2Audio
    from diffusers_tpu.models.transformers.transformer_ltx2 import LTX2VideoTransformer3DModel
    from diffusers_tpu.pipelines.ltx2 import LTX2Pipeline, LTX2TextConnectors, LTX2Vocoder
    from diffusers_tpu.models.text_encoders.gemma import Gemma3ForConditionalGeneration
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    vae = AutoencoderKLLTX2Video(**VIDEO_VAE)
    audio_vae = AutoencoderKLLTX2Audio(**AUDIO_VAE)
    tf = LTX2VideoTransformer3DModel(**TRANSFORMER)
    conn = LTX2TextConnectors(**CONNECTORS)
    voc = LTX2Vocoder(**VOCODER)
    te = Gemma3ForConditionalGeneration(text_config=dict(
        vocab_size=256, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        sliding_window=8, sliding_window_pattern=2))
    pipe = LTX2Pipeline(
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        vae=(vae, vae.init(jax.random.PRNGKey(1))),
        audio_vae=(audio_vae, audio_vae.init(jax.random.PRNGKey(2))),
        text_encoder=(te, te.init(jax.random.PRNGKey(3))),
        tokenizer=DummyTokenizer(),
        connectors=(conn, conn.init(jax.random.PRNGKey(4))),
        transformer=(tf, tf.init(jax.random.PRNGKey(5))),
        vocoder=(voc, voc.init(jax.random.PRNGKey(6))),
    )
    out = pipe(
        "stg smoke", height=32, width=32, num_frames=9, num_inference_steps=2,
        guidance_scale=2.0, stg_scale=1.0, modality_scale=1.5,
        spatio_temporal_guidance_blocks=[1], key=key, max_sequence_length=8,
        output_type="latent", return_dict=False,
    )
    latents, audio_latents = out
    assert np.isfinite(np.asarray(latents)).all()
    assert np.isfinite(np.asarray(audio_latents)).all()
