"""Lucy-Edit (Wan-based video editing): pipeline smoke incl. two-stage boundary.

Reference: `/root/reference/src/diffusers/pipelines/lucy/pipeline_lucy_edit.py:134`.
"""

import jax
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
from diffusers_tpu.models.text_encoders.t5 import UMT5EncoderModel
from diffusers_tpu.models.transformers.transformer_wan import WanTransformer3DModel
from diffusers_tpu.pipelines.lucy import LucyEditPipeline
from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
    FlowMatchEulerDiscreteScheduler,
)


class DummyTok:
    def __call__(self, text, padding=None, max_length=None, truncation=True,
                 add_special_tokens=True, return_attention_mask=True, return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        ids = np.zeros((len(text), max_length), dtype=np.int64)
        mask = np.zeros((len(text), max_length), dtype=np.int64)
        for i, t in enumerate(text):
            n = min(max_length, 6 + len(t) % 4)
            ids[i, :n] = [(hash(t) + j) % 60 + 2 for j in range(n)]
            mask[i, :n] = 1

        class R(dict):
            input_ids = ids
            attention_mask = mask

            def __getitem__(self, k):
                return getattr(self, k)

        return R()


def _components(key):
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[True, False], latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
        scale_factor_temporal=2, scale_factor_spatial=2,
    )
    te = UMT5EncoderModel(vocab_size=64, d_model=16, d_kv=8, d_ff=32, num_layers=2, num_heads=2)
    tr = WanTransformer3DModel(
        patch_size=(1, 2, 2), num_attention_heads=2, attention_head_dim=8, in_channels=8,
        out_channels=4, text_dim=16, freq_dim=32, ffn_dim=32, num_layers=2,
        cross_attn_norm=True, qk_norm="rms_norm_across_heads", rope_max_seq_len=32,
    )
    return vae, te, tr


def test_lucy_edit_pipeline_smoke():
    key = jax.random.PRNGKey(0)
    vae, te, tr = _components(key)
    pipe = LucyEditPipeline(
        tokenizer=DummyTok(), text_encoder=(te, te.init_params(key)),
        vae=(vae, vae.init_params(key)), scheduler=FlowMatchEulerDiscreteScheduler(),
        transformer=(tr, tr.init_params(key)),
    )
    video = np.random.RandomState(0).rand(5, 32, 32, 3).astype(np.float32)
    out = pipe(video, prompt="make it a clown costume", height=32, width=32, num_frames=5,
               num_inference_steps=2, guidance_scale=2.0, key=key, max_sequence_length=12,
               output_type="np")
    frames = np.asarray(out.frames)
    # tiny 2-level VAE decodes 3 latent frames without the full temporal
    # upsample chain; check spatial dims + finiteness (frame count is a
    # tiny-config artifact, not pipeline logic)
    assert frames.shape[0] == 1 and frames.shape[2:] == (32, 32, 3)
    assert np.isfinite(frames).all()


def test_lucy_edit_two_stage_boundary():
    key = jax.random.PRNGKey(1)
    vae, te, tr = _components(key)
    tr2 = WanTransformer3DModel(
        patch_size=(1, 2, 2), num_attention_heads=2, attention_head_dim=8, in_channels=8,
        out_channels=4, text_dim=16, freq_dim=32, ffn_dim=32, num_layers=2,
        cross_attn_norm=True, qk_norm="rms_norm_across_heads", rope_max_seq_len=32,
    )
    pipe = LucyEditPipeline(
        tokenizer=DummyTok(), text_encoder=(te, te.init_params(key)),
        vae=(vae, vae.init_params(key)), scheduler=FlowMatchEulerDiscreteScheduler(),
        transformer=(tr, tr.init_params(key)),
        transformer_2=(tr2, tr2.init_params(jax.random.PRNGKey(2))),
        boundary_ratio=0.5,
    )
    video = np.random.RandomState(1).rand(5, 32, 32, 3).astype(np.float32)
    out = pipe(video, prompt="repaint the walls blue", height=32, width=32, num_frames=5,
               num_inference_steps=4, guidance_scale=2.0, guidance_scale_2=1.0, key=key,
               max_sequence_length=12, output_type="latent")
    assert np.isfinite(np.asarray(out.frames)).all()
