"""Round-5 modular block packs (SD3 / Wan / QwenImage): each pack's
Sequential graph must reproduce the monolithic pipeline bit-for-bit on the
same key (reference `modular_pipelines/` wan + qwenimage packs; the sd3 pack
mirrors the flux pack structure)."""

import jax
import numpy as np

from diffusers_tpu.modular_pipelines import ComponentsBundle, ModularPipeline


def _get_sd3_pipeline():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.clip import CLIPTextModelWithProjection
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.transformers.transformer_sd3 import SD3Transformer2DModel
    from diffusers_tpu.pipelines.stable_diffusion_3.pipeline_stable_diffusion_3 import (
        StableDiffusion3Pipeline,
    )
    from diffusers_tpu.schedulers import FlowMatchEulerDiscreteScheduler
    from tests.test_pipeline_stable_diffusion import DummyTokenizer

    key = jax.random.PRNGKey(0)
    transformer = SD3Transformer2DModel(
        sample_size=8, patch_size=2, in_channels=4, num_layers=2, attention_head_dim=8,
        num_attention_heads=2, joint_attention_dim=32, caption_projection_dim=16,
        pooled_projection_dim=32, out_channels=4, pos_embed_max_size=96,
    )
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=8,
        scaling_factor=1.5, shift_factor=0.06,
    )
    te = CLIPTextModelWithProjection(vocab_size=1000, hidden_size=8, intermediate_size=16,
                                     num_hidden_layers=1, num_attention_heads=2, projection_dim=16)
    t5 = T5EncoderModel(vocab_size=1000, d_model=32, d_kv=8, d_ff=32, num_layers=1, num_heads=2,
                        feed_forward_proj="gated-gelu")
    return StableDiffusion3Pipeline(
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(shift=3.0),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyTokenizer(),
        text_encoder_2=(te, te.init_params(key)),
        tokenizer_2=DummyTokenizer(),
        text_encoder_3=(t5, t5.init_params(key)),
        tokenizer_3=DummyTokenizer(),
    )


def test_sd3_modular_blocks_match_monolithic_pipeline():
    from diffusers_tpu.modular_pipelines.stable_diffusion_3 import SD3_BLOCKS

    pipe = _get_sd3_pipeline()
    components = ComponentsBundle(
        transformer=pipe.transformer, vae=pipe.vae, scheduler=pipe.scheduler,
        text_encoder=pipe.text_encoder, text_encoder_2=pipe.text_encoder_2,
        text_encoder_3=pipe.text_encoder_3,
        tokenizer=pipe.tokenizer, tokenizer_2=pipe.tokenizer_2, tokenizer_3=pipe.tokenizer_3,
    )
    modular = ModularPipeline(SD3_BLOCKS(), components)
    kwargs = dict(prompt="a modular koi pond", height=16, width=16, num_inference_steps=3,
                  guidance_scale=5.0, max_sequence_length=16, key=jax.random.PRNGKey(5))
    images = modular(output="images", **kwargs, output_type="np")
    ref = np.asarray(pipe(**kwargs, output_type="np").images)
    np.testing.assert_allclose(np.asarray(images), ref, atol=1e-3)


def test_wan_modular_blocks_match_monolithic_pipeline():
    from diffusers_tpu.modular_pipelines.wan import WAN_BLOCKS
    from tests.test_pipeline_wan import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    components = ComponentsBundle(
        transformer=pipe.transformer, vae=pipe.vae, scheduler=pipe.scheduler,
        text_encoder=pipe.text_encoder, tokenizer=pipe.tokenizer,
    )
    modular = ModularPipeline(WAN_BLOCKS(), components)
    kwargs = dict(prompt="a modular heron", height=16, width=16, num_frames=5,
                  num_inference_steps=3, guidance_scale=5.0, key=jax.random.PRNGKey(2))
    videos = modular(output="videos", **kwargs, output_type="np")
    ref = np.asarray(pipe(**kwargs, output_type="np").frames)
    np.testing.assert_allclose(np.asarray(videos), ref, atol=1e-3)


def test_qwenimage_modular_blocks_match_monolithic_pipeline():
    from diffusers_tpu.modular_pipelines.qwenimage import QWENIMAGE_BLOCKS
    from tests.test_qwenimage import TINY
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.transformers.transformer_qwenimage import (
        QwenImageTransformer2DModel,
    )
    from diffusers_tpu.pipelines.qwenimage import QwenImagePipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = QwenImageTransformer2DModel(**TINY)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
        scaling_factor=1.0,
    )

    class DummyQwen:
        def __call__(self, params, ids, attention_mask=None, output_hidden_states=False):
            class Out:
                pass

            o = Out()
            rng = np.random.RandomState(int(np.asarray(ids).sum()) % 991)
            hs = jax.numpy.asarray(rng.randn(ids.shape[0], ids.shape[1], 24).astype(np.float32))
            o.hidden_states = [hs * 0.3, hs]
            o.last_hidden_state = hs
            return o

    class Tok:
        def __call__(self, prompts, padding=None, max_length=40, truncation=True,
                     return_tensors="np"):
            import zlib

            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = min(36, len(p) % 5 + 35)
                h = zlib.crc32(p.encode())
                ids.append([((h + i) % 70) + 1 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = QwenImagePipeline(
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        vae=(vae, vae.init_params(key)),
        text_encoder=(DummyQwen(), {}),
        tokenizer=Tok(),
        transformer=(transformer, transformer.init_params(key)),
    )
    components = ComponentsBundle(
        transformer=pipe.transformer, vae=pipe.vae, scheduler=pipe.scheduler,
        text_encoder=pipe.text_encoder, tokenizer=pipe.tokenizer,
    )
    modular = ModularPipeline(QWENIMAGE_BLOCKS(), components)
    kwargs = dict(prompt="a modular jade rabbit", height=32, width=32, num_inference_steps=2,
                  true_cfg_scale=3.0, max_sequence_length=6, key=key)
    images = modular(output="images", **kwargs, output_type="np")
    ref = np.asarray(pipe(**kwargs, output_type="np").images)
    np.testing.assert_allclose(np.asarray(images), ref, atol=1e-3)


def test_new_packs_resolve_from_class_name():
    from diffusers_tpu.modular_pipelines.modular_pipeline import _resolve_block_pack
    from diffusers_tpu.modular_pipelines.qwenimage import QWENIMAGE_BLOCKS
    from diffusers_tpu.modular_pipelines.stable_diffusion_3 import SD3_BLOCKS
    from diffusers_tpu.modular_pipelines.wan import WAN_BLOCKS

    assert _resolve_block_pack("StableDiffusion3Pipeline") is SD3_BLOCKS
    assert _resolve_block_pack("WanPipeline") is WAN_BLOCKS
    assert _resolve_block_pack("QwenImagePipeline") is QWENIMAGE_BLOCKS


def test_ltx_modular_blocks_match_monolithic_pipeline():
    from diffusers_tpu.modular_pipelines.ltx import LTX_BLOCKS
    from tests.test_pipeline_ltx import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    components = ComponentsBundle(
        transformer=pipe.transformer, vae=pipe.vae, scheduler=pipe.scheduler,
        text_encoder=pipe.text_encoder, tokenizer=pipe.tokenizer,
    )
    modular = ModularPipeline(LTX_BLOCKS(), components)
    kwargs = dict(prompt="a modular otter", height=32, width=32, num_frames=9,
                  num_inference_steps=3, guidance_scale=3.0, key=jax.random.PRNGKey(4))
    videos = modular(output="videos", **kwargs, output_type="np")
    ref = np.asarray(pipe(**kwargs, output_type="np").frames)
    np.testing.assert_allclose(np.asarray(videos), ref, atol=1e-3)
