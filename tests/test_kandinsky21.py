"""Kandinsky 2.1: MultilingualCLIP (XLM-Roberta) parity vs the reference
wrapper + prior->decoder t2i smoke.

Reference: `/root/reference/src/diffusers/pipelines/kandinsky/text_encoder.py:14`,
`pipeline_kandinsky.py:81`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.text_encoders.xlm_roberta import MultilingualCLIP

sys.path.insert(0, "/root/reference/src")

MCLIP_TINY = dict(
    vocab_size=120,
    hidden_size=16,
    intermediate_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    max_position_embeddings=64,
    type_vocab_size=1,
    pad_token_id=1,
    transformerDimensions=16,
    numDims=8,
)


@pytest.mark.refparity
def test_mclip_parity():
    torch = pytest.importorskip("torch")
    from diffusers.pipelines.kandinsky.text_encoder import MCLIPConfig, MultilingualCLIP as TorchMCLIP

    cfg = MCLIPConfig(
        transformerDimSize=16, imageDimSize=8, vocab_size=120, hidden_size=16,
        intermediate_size=32, num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=64, type_vocab_size=1, pad_token_id=1,
    )
    tm = TorchMCLIP(cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
          if "pooler" not in k and "position_ids" not in k}
    m = MultilingualCLIP(**MCLIP_TINY)
    params = convert_torch_state_dict(m, sd)

    ids = np.array([[0, 34, 56, 78, 2, 1, 1, 1], [0, 9, 2, 1, 1, 1, 1, 1]], dtype=np.int64)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        ref_proj, ref_hidden = tm(torch.from_numpy(ids), torch.from_numpy(mask))
    out = m(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    assert np.max(np.abs(np.asarray(out.projected) - ref_proj.numpy())) < 1e-4
    err = np.abs(np.asarray(out.last_hidden_state) - ref_hidden.numpy())[mask.astype(bool)].max()
    assert err < 1e-4, err


class DummyXLMRTok:
    model_max_length = 77

    def __call__(self, prompts, padding=None, max_length=77, truncation=True,
                 return_attention_mask=True, add_special_tokens=True, return_tensors="np"):
        ids = np.ones((len(prompts), max_length), dtype=np.int64)  # pad id 1
        mask = np.zeros((len(prompts), max_length), dtype=np.int64)
        for i, p in enumerate(prompts):
            n = min(max_length, max(3, len(p) % 9 + 3))
            ids[i, 0] = 0
            ids[i, 1: n - 1] = [(hash(p) + j) % 110 + 4 for j in range(n - 2)]
            ids[i, n - 1] = 2
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def test_kandinsky21_t2i_smoke():
    from diffusers_tpu.models.autoencoders.vq_model import VQModel
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
    from diffusers_tpu.pipelines.kandinsky import KandinskyPipeline
    from diffusers_tpu.schedulers import DDIMScheduler

    key = jax.random.PRNGKey(0)
    te = MultilingualCLIP(**MCLIP_TINY)
    unet = UNet2DConditionModel(
        sample_size=16, in_channels=4, out_channels=8,
        down_block_types=("ResnetDownsampleBlock2D", "SimpleCrossAttnDownBlock2D"),
        up_block_types=("SimpleCrossAttnUpBlock2D", "ResnetUpsampleBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1, attention_head_dim=4,
        cross_attention_dim=8, norm_num_groups=4,
        encoder_hid_dim_type="text_image_proj", encoder_hid_dim=16,
        addition_embed_type="text_image", class_embed_type=None,
        resnet_time_scale_shift="scale_shift",
    )
    movq = VQModel(
        block_out_channels=[32, 64],
        down_block_types=["DownEncoderBlock2D", "AttnDownEncoderBlock2D"],
        in_channels=3, latent_channels=4, layers_per_block=1, norm_num_groups=8,
        norm_type="spatial", num_vq_embeddings=12, out_channels=3,
        up_block_types=["AttnUpDecoderBlock2D", "UpDecoderBlock2D"], vq_embed_dim=4,
    )
    scheduler = DDIMScheduler(
        num_train_timesteps=1000, beta_schedule="linear", beta_start=0.00085, beta_end=0.012,
        clip_sample=False, set_alpha_to_one=False, steps_offset=1, prediction_type="epsilon",
    )
    pipe = KandinskyPipeline(
        text_encoder=(te, te.init_params(key)), tokenizer=DummyXLMRTok(),
        unet=(unet, unet.init_params(key)), scheduler=scheduler,
        movq=(movq, movq.init_params(key)),
    )
    image_embeds = jnp.asarray(np.random.RandomState(0).randn(1, 8).astype(np.float32))
    out = pipe("красный кот", image_embeds=image_embeds, height=32, width=32,
               num_inference_steps=2, guidance_scale=4.0, key=key, output_type="np")
    img = np.asarray(out.images)
    assert img.shape == (1, 32, 32, 3) and np.isfinite(img).all()
