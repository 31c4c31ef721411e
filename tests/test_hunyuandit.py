"""HunyuanDiT transformer parity vs the torch reference + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.hunyuan_transformer_2d import HunyuanDiT2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=8,
    in_channels=4,
    patch_size=2,
    sample_size=8,
    hidden_size=16,
    num_layers=4,
    mlp_ratio=2.0,
    cross_attention_dim=16,
    cross_attention_dim_t5=16,
    pooled_projection_dim=16,
    text_len=6,
    text_len_t5=8,
    use_style_cond_and_image_meta_size=True,
)


def test_hunyuandit_parity():
    torch = pytest.importorskip("torch")
    from diffusers import HunyuanDiT2DModel as TorchModel
    from diffusers.models.embeddings import get_2d_rotary_pos_embed

    from diffusers_tpu.models.embeddings import get_2d_rotary_pos_embed_np

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = HunyuanDiT2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    clip_embeds = rng.randn(2, 6, 16).astype(np.float32)
    clip_mask = np.ones((2, 6), dtype=np.int64)
    clip_mask[0, 4:] = 0
    t5_embeds = rng.randn(2, 8, 16).astype(np.float32)
    t5_mask = np.ones((2, 8), dtype=np.int64)
    t5_mask[1, 5:] = 0
    meta = np.array([[1024, 1024, 1024, 1024, 0, 0]] * 2, dtype=np.float32)
    style = np.zeros((2,), dtype=np.int64)
    t = np.array([500, 100], dtype=np.float32)

    grid = (4, 4)
    crops = ((0, 0), (4, 4))
    cos, sin = get_2d_rotary_pos_embed_np(8, crops, grid)
    ref_rope = get_2d_rotary_pos_embed(8, crops, grid, output_type="pt")
    np.testing.assert_allclose(cos, ref_rope[0].numpy(), atol=1e-5)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(clip_embeds),
            text_embedding_mask=torch.from_numpy(clip_mask),
            encoder_hidden_states_t5=torch.from_numpy(t5_embeds),
            text_embedding_mask_t5=torch.from_numpy(t5_mask),
            image_meta_size=torch.from_numpy(meta),
            style=torch.from_numpy(style),
            image_rotary_emb=(ref_rope[0], ref_rope[1]),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t),
          encoder_hidden_states=jnp.asarray(clip_embeds),
          text_embedding_mask=jnp.asarray(clip_mask),
          encoder_hidden_states_t5=jnp.asarray(t5_embeds),
          text_embedding_mask_t5=jnp.asarray(t5_mask),
          image_meta_size=jnp.asarray(meta),
          style=jnp.asarray(style),
          image_rotary_emb=(jnp.asarray(cos), jnp.asarray(sin))).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_hunyuandit_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.pipelines.hunyuandit import HunyuanDiTPipeline
    from diffusers_tpu.schedulers.scheduling_ddpm import DDPMScheduler

    key = jax.random.PRNGKey(0)
    transformer = HunyuanDiT2DModel(**TINY)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
    )

    class DummyEnc:
        def __init__(self, dim):
            self.dim = dim

        def __call__(self, params, ids, attention_mask=None):
            class Out:
                pass

            o = Out()
            rng = np.random.RandomState(int(np.asarray(ids).sum()) % 1000)
            o.last_hidden_state = jnp.asarray(rng.randn(ids.shape[0], ids.shape[1], self.dim).astype(np.float32))
            return o

    class Tok:
        def __call__(self, prompts, padding=None, max_length=8, truncation=True, return_tensors="np"):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 3 + 2
                ids.append([((hash(p) + i) % 50) + 1 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = HunyuanDiTPipeline(
        vae=(vae, vae.init_params(key)),
        text_encoder=(DummyEnc(16), {}),
        tokenizer=Tok(),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=DDPMScheduler(),
        text_encoder_2=(DummyEnc(16), {}),
        tokenizer_2=Tok(),
    )
    out = pipe("mountain shrine at dusk", height=16, width=16, num_inference_steps=2,
               guidance_scale=5.0, guidance_rescale=0.2, key=key, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
