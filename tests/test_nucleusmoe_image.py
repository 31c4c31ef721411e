"""NucleusMoE image: transformer parity (dense + MoE expert-choice routing)
vs torch reference + pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_nucleusmoe_image.py:726`,
`/root/reference/src/diffusers/pipelines/nucleusmoe_image/pipeline_nucleusmoe_image.py:132`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_nucleusmoe_image import (
    NucleusMoEImageTransformer2DModel,
)

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=2,
    in_channels=16,
    out_channels=4,  # latent channels; hub configs set in_channels = out_channels * p^2
    num_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    num_key_value_heads=2,
    joint_attention_dim=24,
    axes_dims_rope=(2, 2, 4),
    moe_enabled=True,
    dense_moe_strategy="leave_first_block_dense",  # layer0 dense, layer1 MoE
    num_experts=4,
    moe_intermediate_dim=16,
    capacity_factors=2.0,
    route_scale=2.5,
)


@pytest.mark.refparity
@pytest.mark.parametrize("use_sigmoid", [False, True])
def test_nucleusmoe_transformer_parity(use_sigmoid):
    torch = pytest.importorskip("torch")
    from diffusers import NucleusMoEImageTransformer2DModel as TorchModel

    tm = TorchModel(**TINY, use_sigmoid=use_sigmoid)
    tm.eval()
    with torch.no_grad():
        # zero-init heads degenerate; MoE expert weights are torch.empty
        # (uninitialized) — randomize both
        for n, p in tm.named_parameters():
            if (p == 0).all() or not torch.isfinite(p).all() or p.abs().max() > 1e3 \
                    or "gate_up_proj" in n or "down_proj" in n:
                p.data.normal_(0.0, 0.05)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = NucleusMoEImageTransformer2DModel(**TINY, use_sigmoid=use_sigmoid)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, S_txt = 2, 7
    fhw = (1, 4, 4)
    x = rng.randn(B, 16, 16).astype(np.float32)  # [B, 1*4*4, in_channels]
    ehs = rng.randn(B, S_txt, 24).astype(np.float32)
    mask = np.ones((B, S_txt), dtype=bool)
    mask[0, 5:] = False
    t = np.array([0.4, 0.9], dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), img_shapes=[fhw],
            encoder_hidden_states=torch.from_numpy(ehs),
            encoder_hidden_states_mask=torch.from_numpy(mask),
            timestep=torch.from_numpy(t),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), [fhw], jnp.asarray(ehs),
          encoder_hidden_states_mask=jnp.asarray(mask), timestep=jnp.asarray(t)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


class DummyQwen3VLProcessor:
    def apply_chat_template(self, messages, tokenize=False, add_generation_prompt=True):
        return " ".join(str(m["content"]) for m in messages)

    def __call__(self, text, padding=None, pad_to_multiple_of=8, max_length=None,
                 truncation=True, return_attention_mask=True, return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        lens = [min(max_length or 24, 9 + len(t) % 5) for t in text]
        width = -(-max(lens) // pad_to_multiple_of) * pad_to_multiple_of
        ids = np.zeros((len(text), width), dtype=np.int64)
        mask = np.zeros((len(text), width), dtype=np.int64)
        for i, (t, n) in enumerate(zip(text, lens)):
            ids[i, :n] = [(hash(t) + j) % 90 + 3 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def test_nucleusmoe_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_qwenimage import AutoencoderKLQwenImage
    from diffusers_tpu.models.text_encoders.llama import LlamaModel
    from diffusers_tpu.pipelines.nucleusmoe_image import NucleusMoEImagePipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = NucleusMoEImageTransformer2DModel(**TINY)
    vae = AutoencoderKLQwenImage(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[False], latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
    )
    te = LlamaModel(vocab_size=128, hidden_size=24, intermediate_size=48, num_hidden_layers=9,
                    num_attention_heads=2, num_key_value_heads=1, head_dim=12, qk_norm=True)
    pipe = NucleusMoEImagePipeline(
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        processor=DummyQwen3VLProcessor(),
    )
    out = pipe("a blue sphere left of a red cube", height=16, width=16, num_inference_steps=2,
               guidance_scale=2.0, key=key, output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()
