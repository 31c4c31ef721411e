"""LongCat-Image: transformer parity vs the torch reference + split_quotation
host parity + pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_longcat_image.py:395`,
`/root/reference/src/diffusers/pipelines/longcat_image/pipeline_longcat_image.py:205`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_longcat_image import LongCatImageTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=1,
    in_channels=16,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=24,
    pooled_projection_dim=24,
    axes_dims_rope=[8, 4, 4],
)


@pytest.mark.refparity
def test_longcat_image_parity():
    torch = pytest.importorskip("torch")
    from diffusers import LongCatImageTransformer2DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = LongCatImageTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, S_img, S_txt = 2, 16, 7
    x = rng.randn(B, S_img, 16).astype(np.float32)
    ehs = rng.randn(B, S_txt, 24).astype(np.float32)
    t = np.array([0.5, 0.9], dtype=np.float32)
    img_ids = np.zeros((S_img, 3), np.float32)
    img_ids[:, 0] = 1
    img_ids[:, 1] = np.repeat(np.arange(4), 4) + 512
    img_ids[:, 2] = np.tile(np.arange(4), 4) + 512
    txt_ids = np.zeros((S_txt, 3), np.float32)
    txt_ids[:, 1] = np.arange(S_txt)
    txt_ids[:, 2] = np.arange(S_txt)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t), img_ids=torch.from_numpy(img_ids),
            txt_ids=torch.from_numpy(txt_ids),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t),
          img_ids=img_ids, txt_ids=txt_ids).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_split_quotation_parity():
    # the reference pipeline module's import chain needs a newer huggingface_hub;
    # extract just the pure-python helper from the source
    import re as _re

    src = open("/root/reference/src/diffusers/pipelines/longcat_image/pipeline_longcat_image.py").read()
    fn_src = src[src.index("def split_quotation"):]
    fn_src = fn_src[: fn_src.index("\ndef ")]
    ns = {"re": _re}
    exec(fn_src, ns)
    ref_split = ns["split_quotation"]

    from diffusers_tpu.pipelines.longcat_image.pipeline_longcat_image import split_quotation

    for prompt in [
        "Please write 'Hello' on the blackboard for me.",
        'a sign saying "OPEN 24h" next to a door',
        "it's a dog's life with 'quotes' inside",
        "no quotes at all",
        "中文“引号”测试",
    ]:
        assert split_quotation(prompt) == ref_split(prompt), prompt


class DummyQwenTok:
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=False):
        return {"input_ids": [((hash(c) % 90) + 5) for c in str(text)][:24]}


def test_longcat_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.pipelines.longcat_image import LongCatImagePipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = LongCatImageTransformer2DModel(**{**TINY, "in_channels": 4})

    class DummyQwen:
        def __call__(self, params, ids, attention_mask=None, output_hidden_states=False):
            class Out:
                pass

            o = Out()
            rng = np.random.RandomState(int(np.asarray(ids).sum()) % 991)
            hs = jnp.asarray(rng.randn(ids.shape[0], ids.shape[1], 24).astype(np.float32))
            o.hidden_states = [hs * 0.3, hs]
            return o

    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=1, layers_per_block=1, norm_num_groups=1, sample_size=16,
        scaling_factor=1.0,
    )
    pipe = LongCatImagePipeline(
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        text_encoder=(DummyQwen(), {}), tokenizer=DummyQwenTok(),
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
    )
    pipe.tokenizer_max_length = 16
    out = pipe('a sign saying "HI"', height=16, width=16, num_inference_steps=2,
               guidance_scale=3.0, enable_cfg_renorm=True, key=key, output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()
