"""HunyuanDiT ControlNet: controlnet-model parity vs torch reference +
pipeline smoke.

Reference: `/root/reference/src/diffusers/models/controlnets/controlnet_hunyuan.py:40`,
`/root/reference/src/diffusers/pipelines/controlnet_hunyuandit/pipeline_hunyuandit_controlnet.py`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.controlnets.controlnet_hunyuan import HunyuanDiT2DControlNetModel
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY_CN = dict(
    num_attention_heads=2,
    attention_head_dim=8,
    in_channels=4,
    patch_size=2,
    sample_size=8,
    hidden_size=16,
    transformer_num_layers=6,  # -> 2 controlnet blocks
    mlp_ratio=2.0,
    cross_attention_dim=16,
    cross_attention_dim_t5=16,
    pooled_projection_dim=16,
    text_len=6,
    text_len_t5=8,
)


@pytest.mark.refparity
def test_hunyuandit_controlnet_parity():
    torch = pytest.importorskip("torch")
    from diffusers import HunyuanDiT2DControlNetModel as TorchModel

    from diffusers_tpu.models.embeddings import get_2d_rotary_pos_embed_np

    tm = TorchModel(**TINY_CN)
    tm.eval()
    with torch.no_grad():  # zero-init projections degenerate; randomize
        for n, p in tm.named_parameters():
            if (p == 0).all():
                p.data.normal_(0.0, 0.05)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = HunyuanDiT2DControlNetModel(**TINY_CN)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B = 2
    x = rng.randn(B, 4, 8, 8).astype(np.float32)
    cond = rng.randn(B, 4, 8, 8).astype(np.float32)
    t = np.array([500, 20], dtype=np.float32)
    clip = rng.randn(B, 6, 16).astype(np.float32)
    clip_mask = np.ones((B, 6), np.int64)
    clip_mask[0, 4:] = 0
    t5 = rng.randn(B, 8, 16).astype(np.float32)
    t5_mask = np.ones((B, 8), np.int64)
    t5_mask[1, 5:] = 0
    meta = np.tile(np.array([[1024, 1024, 1024, 1024, 0, 0]], np.float32), (B, 1))
    style = np.zeros((B,), np.int64)
    cos, sin = get_2d_rotary_pos_embed_np(8, ((0, 0), (4, 4)), (4, 4))

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(t),
            controlnet_cond=torch.from_numpy(cond), conditioning_scale=0.7,
            encoder_hidden_states=torch.from_numpy(clip),
            text_embedding_mask=torch.from_numpy(clip_mask),
            encoder_hidden_states_t5=torch.from_numpy(t5),
            text_embedding_mask_t5=torch.from_numpy(t5_mask),
            image_meta_size=torch.from_numpy(meta), style=torch.from_numpy(style),
            image_rotary_emb=(torch.from_numpy(np.asarray(cos)), torch.from_numpy(np.asarray(sin))),
        ).controlnet_block_samples
    out = m(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(cond), conditioning_scale=0.7,
        encoder_hidden_states=jnp.asarray(clip), text_embedding_mask=jnp.asarray(clip_mask),
        encoder_hidden_states_t5=jnp.asarray(t5), text_embedding_mask_t5=jnp.asarray(t5_mask),
        image_meta_size=jnp.asarray(meta), style=jnp.asarray(style),
        image_rotary_emb=(jnp.asarray(cos), jnp.asarray(sin)),
    ).controlnet_block_samples
    assert len(out) == len(ref) == 2
    for o, r in zip(out, ref):
        assert np.max(np.abs(np.asarray(o) - r.numpy())) < 2e-3


class DummyTok:
    def __call__(self, text, padding=None, max_length=None, truncation=True, return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        ids = np.zeros((len(text), max_length), dtype=np.int64)
        mask = np.zeros((len(text), max_length), dtype=np.int64)
        for i, t in enumerate(text):
            n = min(max_length, 3 + len(t) % 3)
            ids[i, :n] = [(hash(t) + j) % 60 + 2 for j in range(n)]
            mask[i, :n] = 1

        class R:
            input_ids = ids
            attention_mask = mask

        return R()


class DummyTE:
    def __init__(self, dim, key):
        self.dim = dim
        self.key = key

    def init_params(self, key):
        return {}

    def __call__(self, params, ids, attention_mask=None):
        import jax.numpy as jnp

        class Out:
            last_hidden_state = jax.random.normal(
                jax.random.fold_in(self.key, int(ids.shape[1])),
                (ids.shape[0], ids.shape[1], self.dim)) * 0.1

        return Out()


def test_hunyuandit_controlnet_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.transformers.hunyuan_transformer_2d import HunyuanDiT2DModel
    from diffusers_tpu.pipelines.controlnet_hunyuandit import HunyuanDiTControlNetPipeline
    from diffusers_tpu.schedulers.scheduling_ddpm import DDPMScheduler

    key = jax.random.PRNGKey(0)
    transformer = HunyuanDiT2DModel(
        num_attention_heads=2, attention_head_dim=8, in_channels=4, patch_size=2,
        sample_size=8, hidden_size=16, num_layers=6, mlp_ratio=2.0,
        cross_attention_dim=16, cross_attention_dim_t5=16, pooled_projection_dim=16,
        text_len=6, text_len_t5=8,
    )
    controlnet = HunyuanDiT2DControlNetModel(**TINY_CN)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        block_out_channels=(8, 8), layers_per_block=1, latent_channels=4, norm_num_groups=4,
    )
    pipe = HunyuanDiTControlNetPipeline(
        vae=(vae, vae.init_params(key)),
        text_encoder=(DummyTE(16, key), {}),
        tokenizer=DummyTok(),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=DDPMScheduler(),
        controlnet=(controlnet, controlnet.init_params(jax.random.PRNGKey(1))),
        text_encoder_2=(DummyTE(16, jax.random.PRNGKey(2)), {}),
        tokenizer_2=DummyTok(),
    )
    control = np.random.RandomState(0).rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    out = pipe("a controlled image", control_image=control, height=16, width=16,
               num_inference_steps=2, guidance_scale=2.0, key=key, output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()
