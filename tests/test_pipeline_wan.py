"""Wan text-to-video pipeline test with tiny hermetic components."""

import jax
import numpy as np

from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
from diffusers_tpu.models.transformers.transformer_wan import WanTransformer3DModel
from diffusers_tpu.pipelines.wan.pipeline_wan import WanPipeline
from diffusers_tpu.schedulers import UniPCMultistepScheduler


class DummyTokenizer:
    model_max_length = 226

    def __call__(self, prompts, padding=None, max_length=16, truncation=True, return_tensors="np"):
        class Out:
            pass

        out = Out()
        ids, masks = [], []
        for p in prompts:
            n = 5
            h = [((hash(p) + i * 31) % 400) + 2 for i in range(n)]
            ids.append(h + [1] + [0] * (max_length - n - 1))
            masks.append([1] * (n + 1) + [0] * (max_length - n - 1))
        out.input_ids = np.array(ids)
        out.attention_mask = np.array(masks)
        return out

    def save_pretrained(self, path):
        pass


def get_dummy_pipeline():
    key = jax.random.PRNGKey(0)
    transformer = WanTransformer3DModel(
        patch_size=(1, 2, 2),
        num_attention_heads=2,
        attention_head_dim=12,
        in_channels=4,
        out_channels=4,
        text_dim=16,
        freq_dim=16,
        ffn_dim=32,
        num_layers=1,
        cross_attn_norm=True,
        rope_max_seq_len=64,
    )
    vae = AutoencoderKLWan(
        base_dim=16,
        z_dim=4,
        dim_mult=[1, 2],
        num_res_blocks=1,
        attn_scales=[],
        temperal_downsample=[False, True],
        latents_mean=[0.0] * 4,
        latents_std=[1.0] * 4,
        scale_factor_temporal=2,
        scale_factor_spatial=2,
    )
    t5 = T5EncoderModel(vocab_size=512, d_model=16, d_kv=8, d_ff=32, num_layers=1, num_heads=2,
                        feed_forward_proj="gated-gelu")
    scheduler = UniPCMultistepScheduler(prediction_type="flow_prediction", use_flow_sigmas=True, flow_shift=3.0)
    return WanPipeline(
        tokenizer=DummyTokenizer(),
        text_encoder=(t5, t5.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        scheduler=scheduler,
    )


def test_wan_text2video():
    pipe = get_dummy_pipeline()
    out = pipe(
        "a robot dancing",
        height=16,
        width=16,
        num_frames=5,
        num_inference_steps=2,
        guidance_scale=5.0,
        key=jax.random.PRNGKey(0),
        output_type="np",
    )
    # latent frames: (5-1)/2+1 = 3 → decoded: 1 + 2*(3-1) = 5 frames
    assert out.frames.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(out.frames).all()
