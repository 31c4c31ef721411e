"""HunyuanVideoPipeline end-to-end smoke test with tiny hermetic components."""

import jax
import numpy as np

from diffusers_tpu.models.autoencoders.autoencoder_kl_hunyuan_video import AutoencoderKLHunyuanVideo
from diffusers_tpu.models.text_encoders.clip import CLIPTextModel
from diffusers_tpu.models.text_encoders.llama import LlamaModel
from diffusers_tpu.models.transformers.transformer_hunyuan_video import HunyuanVideoTransformer3DModel
from diffusers_tpu.pipelines.hunyuan_video import HunyuanVideoPipeline
from diffusers_tpu.schedulers import FlowMatchEulerDiscreteScheduler


class DummyTokenizer:
    model_max_length = 77

    def __call__(self, prompts, padding=None, max_length=16, truncation=True, return_tensors="np"):
        class Out:
            pass

        if isinstance(prompts, str):
            prompts = [prompts]
        out = Out()
        ids, masks = [], []
        for p in prompts:
            toks = [((hash(p) + i * 13) % 400) + 2 for i in range(min(8, max_length))]
            pad = max_length - len(toks)
            ids.append(toks + [0] * pad)
            masks.append([1] * len(toks) + [0] * pad)
        out.input_ids = np.array(ids)
        out.attention_mask = np.array(masks)
        return out

    def save_pretrained(self, path):
        pass


def get_dummy_pipeline():
    key = jax.random.PRNGKey(0)
    transformer = HunyuanVideoTransformer3DModel(
        in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=10,
        num_layers=1, num_single_layers=1, num_refiner_layers=1, patch_size=1, patch_size_t=1,
        guidance_embeds=True, text_embed_dim=16, pooled_projection_dim=8,
        rope_axes_dim=(2, 4, 4),
    )
    vae = AutoencoderKLHunyuanVideo(
        in_channels=3, out_channels=3, latent_channels=4, block_out_channels=(8, 8, 8, 8),
        layers_per_block=1, norm_num_groups=4,
    )
    llama = LlamaModel(vocab_size=500, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                       num_attention_heads=2, num_key_value_heads=2)
    clip = CLIPTextModel(vocab_size=500, hidden_size=8, intermediate_size=16, num_hidden_layers=1,
                         num_attention_heads=2, max_position_embeddings=77, projection_dim=8)
    return HunyuanVideoPipeline(
        text_encoder=(llama, llama.init_params(key)),
        tokenizer=DummyTokenizer(),
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(shift=7.0),
        text_encoder_2=(clip, clip.init_params(key)),
        tokenizer_2=DummyTokenizer(),
    )


TEMPLATE = {"template": "sys: {}", "crop_start": 2}


def test_hunyuan_video_t2v():
    pipe = get_dummy_pipeline()
    out = pipe("a cat walks on grass", height=16, width=16, num_frames=5,
               num_inference_steps=2, guidance_scale=6.0, prompt_template=TEMPLATE,
               max_sequence_length=8, key=jax.random.PRNGKey(0), output_type="np")
    assert out.frames.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(out.frames).all()


def test_hunyuan_video_true_cfg():
    pipe = get_dummy_pipeline()
    a = pipe("a cat", height=16, width=16, num_frames=1, num_inference_steps=2,
             guidance_scale=6.0, prompt_template=TEMPLATE, max_sequence_length=8,
             key=jax.random.PRNGKey(0), output_type="np").frames
    b = pipe("a cat", negative_prompt="blurry", true_cfg_scale=3.0, height=16, width=16,
             num_frames=1, num_inference_steps=2, guidance_scale=6.0, prompt_template=TEMPLATE,
             max_sequence_length=8, key=jax.random.PRNGKey(0), output_type="np").frames
    assert a.shape == b.shape == (1, 1, 16, 16, 3)
    assert np.abs(a - b).max() > 1e-6
