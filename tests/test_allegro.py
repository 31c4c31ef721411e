"""Allegro transformer parity + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TF_KWARGS = dict(
    patch_size=2,
    patch_size_t=1,
    num_attention_heads=2,
    attention_head_dim=12,
    in_channels=4,
    out_channels=4,
    num_layers=2,
    cross_attention_dim=24,
    attention_bias=True,
    sample_height=8,
    sample_width=8,
    sample_frames=2,
    norm_elementwise_affine=False,
    norm_eps=1e-6,
    caption_channels=16,
    interpolation_scale_h=1.0,
    interpolation_scale_w=1.0,
    interpolation_scale_t=1.0,
)


def test_allegro_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AllegroTransformer3DModel as TorchModel
    from diffusers.models.embeddings import get_3d_rotary_pos_embed_allegro

    from diffusers_tpu.models.transformers.transformer_allegro import (
        AllegroTransformer3DModel,
        get_3d_rotary_pos_embed_allegro_np,
    )

    tm = TorchModel(**TF_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AllegroTransformer3DModel(**TF_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 2, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 6, 16).astype(np.float32)
    enc_mask = np.ones((2, 6), dtype=np.int64)
    enc_mask[0, 4:] = 0
    t = np.array([5, 9], dtype=np.int64)

    # torch rope: tables + gathered positions like the reference pipeline
    freqs_t, freqs_h, freqs_w, grid_t, grid_h, grid_w = get_3d_rotary_pos_embed_allegro(
        embed_dim=12, crops_coords=((0, 0), (4, 4)), grid_size=(4, 4), temporal_size=2,
        interpolation_scale=(1.0, 1.0, 1.0),
    )
    pos = torch.cartesian_prod(grid_t.long(), grid_h.long(), grid_w.long())
    pos = pos.reshape(-1, 3).transpose(0, 1).reshape(3, 1, -1).contiguous()
    ref_rope = ((freqs_t, freqs_h, freqs_w), pos)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t),
            encoder_attention_mask=torch.from_numpy(enc_mask),
            image_rotary_emb=((freqs_t, freqs_h, freqs_w), (pos[0], pos[1], pos[2])),
        ).sample.numpy()

    rope = get_3d_rotary_pos_embed_allegro_np(12, (4, 4), 2, interpolation_scale=(1.0, 1.0, 1.0))
    rope = tuple((jnp.asarray(c), jnp.asarray(s)) for c, s in rope)
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t),
          encoder_attention_mask=jnp.asarray(enc_mask), image_rotary_emb=rope).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_allegro_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_cogvideox import AutoencoderKLCogVideoX
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.transformers.transformer_allegro import AllegroTransformer3DModel
    from diffusers_tpu.pipelines.allegro import AllegroPipeline
    from diffusers_tpu.schedulers.scheduling_ddim import DDIMScheduler

    key = jax.random.PRNGKey(0)
    transformer = AllegroTransformer3DModel(**TF_KWARGS)
    # stand-in causal 3D VAE with matching 2x spatial / 1x temporal factors
    vae = AutoencoderKLCogVideoX(
        in_channels=3, out_channels=3, down_block_types=("CogVideoXDownBlock3D",) * 2,
        up_block_types=("CogVideoXUpBlock3D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32,
        temporal_compression_ratio=1, scaling_factor=0.7,
    )
    te = T5EncoderModel(vocab_size=60, d_model=16, d_kv=8, d_ff=32, num_layers=2, num_heads=2)

    class Tok:
        model_max_length = 8

        def __call__(self, prompts, padding=None, max_length=8, truncation=True,
                     return_tensors="np", add_special_tokens=True):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 3 + 2
                ids.append([((hash(p) + i) % 50) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = AllegroPipeline(
        tokenizer=Tok(), text_encoder=(te, te.init_params(key)),
        vae=(vae, vae.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=DDIMScheduler(),
    )
    out = pipe("a hummingbird", height=16, width=16, num_frames=2,
               num_inference_steps=2, guidance_scale=7.5, key=key,
               max_sequence_length=8, output_type="np")
    assert out.frames.shape[0] == 1 and out.frames.shape[-1] == 3
    assert np.isfinite(out.frames).all()
