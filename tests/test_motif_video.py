"""Motif-Video: transformer parity vs torch reference + t2v pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_motif_video.py:730`,
`/root/reference/src/diffusers/pipelines/motif_video/pipeline_motif_video.py:158`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_motif_video import MotifVideoTransformer3DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=9,   # 4 latent + 4 condition + 1 mask
    out_channels=4,
    num_attention_heads=2,
    attention_head_dim=12,
    num_layers=1,
    num_single_layers=2,
    num_decoder_layers=1,
    mlp_ratio=2.0,
    patch_size=2,
    patch_size_t=1,
    text_embed_dim=16,
    image_embed_dim=10,
    rope_theta=256.0,
    rope_axes_dim=(4, 4, 4),
    enable_text_cross_attention_dual=True,
    enable_text_cross_attention_single=True,
)


@pytest.mark.refparity
def test_motif_video_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.transformers.transformer_motif_video import (
        MotifVideoTransformer3DModel as TorchModel,
    )

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = MotifVideoTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, F = 2, 2
    x = rng.randn(B, 9, F, 8, 8).astype(np.float32)
    ehs = rng.randn(B, 5, 16).astype(np.float32)
    emask = np.ones((B, 5), dtype=np.int64)
    emask[0, 3:] = 0
    img = rng.randn(B, 3, 10).astype(np.float32)
    t = np.array([500.0, 20.0], dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
            encoder_attention_mask=torch.from_numpy(emask),
            image_embeds=torch.from_numpy(img),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs),
          encoder_attention_mask=jnp.asarray(emask), image_embeds=jnp.asarray(img)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


class DummyTok:
    def __call__(self, text, padding=None, max_length=None, truncation=True,
                 return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        ids = np.zeros((len(text), max_length), dtype=np.int64)
        mask = np.zeros((len(text), max_length), dtype=np.int64)
        for i, t in enumerate(text):
            n = min(max_length, 4 + len(t) % 3)
            ids[i, :n] = [(hash(t) + j) % 60 + 2 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def test_motif_video_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from diffusers_tpu.models.text_encoders.t5 import UMT5EncoderModel
    from diffusers_tpu.pipelines.motif_video import MotifVideoPipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = MotifVideoTransformer3DModel(**dict(TINY, image_embed_dim=None))
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[True, False], latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
        scale_factor_temporal=2, scale_factor_spatial=2,
    )
    te = UMT5EncoderModel(vocab_size=64, d_model=16, d_kv=8, d_ff=32, num_layers=2, num_heads=2)
    pipe = MotifVideoPipeline(
        tokenizer=DummyTok(), text_encoder=(te, te.init_params(key)),
        vae=(vae, vae.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(),
    )
    out = pipe("a drone shot over mountains", height=16, width=16, num_frames=5,
               num_inference_steps=2, guidance_scale=2.0, key=key,
               max_sequence_length=8, output_type="latent")
    assert np.isfinite(np.asarray(out.frames)).all()
