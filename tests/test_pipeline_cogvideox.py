"""CogVideoXPipeline end-to-end (hermetic tiny components)."""

import jax
import numpy as np

from diffusers_tpu import (
    AutoencoderKLCogVideoX,
    CogVideoXDDIMScheduler,
    CogVideoXPipeline,
    CogVideoXTransformer3DModel,
)
from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
from tests.test_autoencoder_cogvideox import TINY as VAE_TINY


class DummyT5Tokenizer:
    model_max_length = 226

    def __call__(self, prompts, padding=None, max_length=16, truncation=True, return_tensors="np"):
        class Out:
            pass

        out = Out()
        ids = []
        for p in prompts:
            h = [((hash(p) + i * 37) % 900) + 2 for i in range(6)]
            ids.append(h + [1] + [0] * (max_length - 7))
        out.input_ids = np.array(ids) % 256
        out.attention_mask = (out.input_ids != 0).astype(np.int32)
        return out

    def save_pretrained(self, path):
        pass


def get_dummy_pipeline(use_rope=False):
    key = jax.random.PRNGKey(0)
    transformer = CogVideoXTransformer3DModel(
        num_attention_heads=2, attention_head_dim=16, in_channels=4, out_channels=4,
        time_embed_dim=16, text_embed_dim=16, num_layers=2,
        sample_width=8, sample_height=8, sample_frames=5, patch_size=2,
        temporal_compression_ratio=2, max_text_seq_length=16,
        use_rotary_positional_embeddings=use_rope,
    )
    t_params = transformer.init_params(key)
    vae = AutoencoderKLCogVideoX(**VAE_TINY)
    vae_params = vae.init_params(key)
    te = T5EncoderModel(vocab_size=256, d_model=16, d_kv=8, num_heads=2, d_ff=32, num_layers=2)
    te_params = te.init_params(key)
    scheduler = CogVideoXDDIMScheduler(
        prediction_type="v_prediction", rescale_betas_zero_snr=True, timestep_spacing="trailing"
    )
    return CogVideoXPipeline(
        tokenizer=DummyT5Tokenizer(),
        text_encoder=(te, te_params),
        vae=(vae, vae_params),
        transformer=(transformer, t_params),
        scheduler=scheduler,
    )


def test_cogvideox_pipeline_generates():
    pipe = get_dummy_pipeline()
    out = pipe(prompt="a panda riding a bike", height=16, width=16, num_frames=3,
               num_inference_steps=2, guidance_scale=6.0, max_sequence_length=16,
               key=jax.random.PRNGKey(0), output_type="np")
    frames = out.frames
    assert frames.ndim == 5 and frames.shape[0] == 1 and frames.shape[-1] == 3
    assert frames.min() >= 0 and frames.max() <= 1
    assert np.isfinite(frames).all()


def test_cogvideox_pipeline_rope_and_dynamic_cfg():
    pipe = get_dummy_pipeline(use_rope=True)
    a = pipe(prompt="p", height=16, width=16, num_frames=3, num_inference_steps=2,
             guidance_scale=6.0, use_dynamic_cfg=True, max_sequence_length=16,
             key=jax.random.PRNGKey(1), output_type="latent").frames
    b = pipe(prompt="p", height=16, width=16, num_frames=3, num_inference_steps=2,
             guidance_scale=6.0, use_dynamic_cfg=False, max_sequence_length=16,
             key=jax.random.PRNGKey(1), output_type="latent").frames
    assert not np.allclose(np.asarray(a), np.asarray(b)), "dynamic CFG must change the trajectory"
