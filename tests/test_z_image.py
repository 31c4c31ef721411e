"""Z-Image: transformer parity vs the torch reference (ragged captions vs our
dense masked packing) + reference-layout from_pretrained -> generate.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_z_image.py:359`,
`/root/reference/src/diffusers/pipelines/z_image/pipeline_z_image.py:141`.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_z_image import (
    ZImageTransformer2DModel,
    _pad32,
)

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    all_patch_size=(2,),
    all_f_patch_size=(1,),
    in_channels=4,
    dim=32,
    n_layers=2,
    n_refiner_layers=1,
    n_heads=2,
    n_kv_heads=2,
    cap_feat_dim=12,
    axes_dims=(8, 4, 4),
    axes_lens=(128, 32, 32),
)


def _pack(embeds_list, cap_seq):
    """Dense caption block from per-item [len_i, D] arrays."""
    b = len(embeds_list)
    d = embeds_list[0].shape[-1]
    out = np.zeros((b, cap_seq, d), dtype=np.float32)
    attn = np.zeros((b, cap_seq), dtype=bool)
    inner = np.zeros((b, cap_seq), dtype=bool)
    for i, e in enumerate(embeds_list):
        n = len(e)
        out[i, :n] = e
        attn[i, : _pad32(n)] = True
        inner[i, n: _pad32(n)] = True
    return out, attn, inner


@pytest.mark.refparity
def test_z_image_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import ZImageTransformer2DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    with torch.no_grad():
        # learnable pad tokens are zero-init; randomize so padding is exercised
        tm.x_pad_token.data.normal_(0.0, 0.5)
        tm.cap_pad_token.data.normal_(0.0, 0.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = ZImageTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x_items = [rng.randn(4, 1, 8, 8).astype(np.float32) for _ in range(2)]
    cap_lens = [5, 40]
    cap_items = [rng.randn(n, 12).astype(np.float32) for n in cap_lens]
    t = np.array([0.3, 0.7], dtype=np.float32)

    with torch.no_grad():
        ref_list = tm(
            [torch.from_numpy(xi) for xi in x_items],
            torch.from_numpy(t),
            [torch.from_numpy(ci) for ci in cap_items],
        ).sample
    ref = np.stack([r.numpy() for r in ref_list])  # [B, C, F, H, W]

    cap_seq = _pad32(max(cap_lens))
    cap, cap_attn, cap_inner = _pack(cap_items, cap_seq)
    out = np.asarray(
        m(params, jnp.asarray(np.stack(x_items)), jnp.asarray(t), jnp.asarray(cap),
          cap_attn_mask=jnp.asarray(cap_attn), cap_inner_pad_mask=jnp.asarray(cap_inner)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


TINY_CN = dict(
    control_layers_places=[0, 1],
    control_refiner_layers_places=[0],
    control_in_dim=4,
    all_patch_size=(2,),
    all_f_patch_size=(1,),
    dim=32,
    n_refiner_layers=1,
    n_heads=2,
    n_kv_heads=2,
)


@pytest.mark.refparity
@pytest.mark.parametrize("refiner_mode", [None, "control_noise_refiner", "control_layers"])
def test_z_image_controlnet_parity(refiner_mode):
    torch = pytest.importorskip("torch")
    from diffusers import ZImageTransformer2DModel as TorchModel
    from diffusers.models.controlnets.controlnet_z_image import (
        ZImageControlNetModel as TorchCN,
    )

    from diffusers_tpu.models.controlnets.controlnet_z_image import ZImageControlNetModel

    torch.manual_seed(0)
    tm = TorchModel(**TINY).eval()
    tcn = TorchCN(**TINY_CN, add_control_noise_refiner=refiner_mode).eval()
    with torch.no_grad():
        tm.x_pad_token.data.normal_(0.0, 0.5)
        tm.cap_pad_token.data.normal_(0.0, 0.5)
        # zero-init taps would hide wiring bugs; randomize them
        for mod in tcn.modules():
            for name in ("before_proj", "after_proj"):
                lin = getattr(mod, name, None)
                if lin is not None:
                    lin.weight.data.normal_(0.0, 0.2)
                    lin.bias.data.normal_(0.0, 0.2)
    cn_sd = {k: v.detach().numpy() for k, v in tcn.state_dict().items()}
    tcn = TorchCN.from_transformer(tcn, tm)

    m = ZImageTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, {k: v.detach().numpy() for k, v in tm.state_dict().items()})
    cn = ZImageControlNetModel(**TINY_CN, add_control_noise_refiner=refiner_mode)
    cn_params = convert_torch_state_dict(cn, cn_sd)
    ZImageControlNetModel.from_transformer(cn, m)

    rng = np.random.RandomState(0)
    x_items = [rng.randn(4, 1, 8, 8).astype(np.float32) for _ in range(2)]
    ctrl_items = [rng.randn(4, 1, 8, 8).astype(np.float32) for _ in range(2)]
    cap_lens = [5, 40]
    cap_items = [rng.randn(n, 12).astype(np.float32) for n in cap_lens]
    t = np.array([0.3, 0.7], dtype=np.float32)

    with torch.no_grad():
        ref_samples = tcn(
            [torch.from_numpy(xi) for xi in x_items],
            torch.from_numpy(t),
            [torch.from_numpy(ci) for ci in cap_items],
            [torch.from_numpy(ci) for ci in ctrl_items],
            conditioning_scale=0.7,
        )
        ref_list = tm(
            [torch.from_numpy(xi) for xi in x_items],
            torch.from_numpy(t),
            [torch.from_numpy(ci) for ci in cap_items],
            controlnet_block_samples=ref_samples,
        ).sample
    ref = np.stack([r.numpy() for r in ref_list])

    cap_seq = _pad32(max(cap_lens))
    cap, cap_attn, cap_inner = _pack(cap_items, cap_seq)
    samples = cn(
        cn_params, params, jnp.asarray(np.stack(x_items)), jnp.asarray(t),
        jnp.asarray(cap), jnp.asarray(np.stack(ctrl_items)),
        cap_attn_mask=jnp.asarray(cap_attn), cap_inner_pad_mask=jnp.asarray(cap_inner),
        conditioning_scale=0.7,
    ).controlnet_block_samples
    assert sorted(samples) == list(TINY_CN["control_layers_places"])
    out = np.asarray(
        m(params, jnp.asarray(np.stack(x_items)), jnp.asarray(t), jnp.asarray(cap),
          cap_attn_mask=jnp.asarray(cap_attn), cap_inner_pad_mask=jnp.asarray(cap_inner),
          controlnet_block_samples=samples).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


def _tiny_qwen3(torch):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(vocab_size=160, hidden_size=12, intermediate_size=24,
                      num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
                      head_dim=8, rope_theta=1000000.0, max_position_embeddings=128)
    return Qwen3ForCausalLM(cfg)


class DummyQwen3Tokenizer:
    model_max_length = 512

    def apply_chat_template(self, messages, tokenize=False, add_generation_prompt=True,
                            enable_thinking=True):
        return "<|im_start|>user\n" + messages[0]["content"] + "<|im_end|>\n<|im_start|>assistant\n"

    def __call__(self, prompts, padding=None, max_length=64, truncation=True,
                 return_tensors="np", **kwargs):
        if isinstance(prompts, str):
            prompts = [prompts]
        ids = np.zeros((len(prompts), max_length), dtype=np.int64)
        mask = np.zeros((len(prompts), max_length), dtype=np.int64)
        for i, p in enumerate(prompts):
            n = min(max_length, max(4, len(p) % 9 + 4))
            ids[i, :n] = [(hash(p) + j) % 150 + 1 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


@pytest.mark.refparity
def test_z_image_from_pretrained_generate(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers import (
        AutoencoderKL as TorchVAE,
        FlowMatchEulerDiscreteScheduler as TorchSched,
        ZImageTransformer2DModel as TorchTf,
    )

    from diffusers_tpu.pipelines.z_image import ZImagePipeline

    torch.manual_seed(0)
    TorchTf(**TINY).save_pretrained(tmp_path / "transformer")
    TorchVAE(
        in_channels=3, out_channels=3, block_out_channels=(8, 8, 8, 8),
        down_block_types=("DownEncoderBlock2D",) * 4, up_block_types=("UpDecoderBlock2D",) * 4,
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=32,
        scaling_factor=0.4, shift_factor=0.1,
    ).save_pretrained(tmp_path / "vae")
    _tiny_qwen3(torch).save_pretrained(tmp_path / "text_encoder")
    TorchSched(use_dynamic_shifting=True, base_shift=0.5, max_shift=1.15).save_pretrained(
        tmp_path / "scheduler")

    index = {
        "_class_name": "ZImagePipeline", "_diffusers_version": "0.40.0.dev0",
        "transformer": ["diffusers", "ZImageTransformer2DModel"],
        "vae": ["diffusers", "AutoencoderKL"],
        "text_encoder": ["transformers", "Qwen3ForCausalLM"],
        "tokenizer": [None, None],
        "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
    }
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(index, f)

    pipe = ZImagePipeline.from_pretrained(str(tmp_path), tokenizer=DummyQwen3Tokenizer())
    out = pipe("an ink-wash mountain village", negative_prompt="blurry",
               height=32, width=32, num_inference_steps=2, guidance_scale=3.0,
               cfg_normalization=True, key=jax.random.PRNGKey(0),
               max_sequence_length=24, output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()


def _save_z_image_repo(tmp_path, torch, with_controlnet=False):
    from diffusers import (
        AutoencoderKL as TorchVAE,
        FlowMatchEulerDiscreteScheduler as TorchSched,
        ZImageTransformer2DModel as TorchTf,
    )

    torch.manual_seed(0)
    TorchTf(**TINY).save_pretrained(tmp_path / "transformer")
    TorchVAE(
        in_channels=3, out_channels=3, block_out_channels=(8, 8, 8, 8),
        down_block_types=("DownEncoderBlock2D",) * 4, up_block_types=("UpDecoderBlock2D",) * 4,
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=32,
        scaling_factor=0.4, shift_factor=0.1,
    ).save_pretrained(tmp_path / "vae")
    _tiny_qwen3(torch).save_pretrained(tmp_path / "text_encoder")
    from diffusers import FlowMatchEulerDiscreteScheduler as TorchSched  # noqa: F811

    TorchSched(use_dynamic_shifting=True, base_shift=0.5, max_shift=1.15).save_pretrained(
        tmp_path / "scheduler")
    index = {
        "_class_name": "ZImagePipeline", "_diffusers_version": "0.40.0.dev0",
        "transformer": ["diffusers", "ZImageTransformer2DModel"],
        "vae": ["diffusers", "AutoencoderKL"],
        "text_encoder": ["transformers", "Qwen3ForCausalLM"],
        "tokenizer": [None, None],
        "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
    }
    if with_controlnet:
        from diffusers.models.controlnets.controlnet_z_image import (
            ZImageControlNetModel as TorchCN,
        )

        tcn = TorchCN(**TINY_CN)
        with torch.no_grad():
            for mod in tcn.modules():
                for name in ("before_proj", "after_proj"):
                    lin = getattr(mod, name, None)
                    if lin is not None:
                        lin.weight.data.normal_(0.0, 0.2)
                        lin.bias.data.normal_(0.0, 0.2)
        tcn.save_pretrained(tmp_path / "controlnet")
        index["controlnet"] = ["diffusers", "ZImageControlNetModel"]
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(index, f)


@pytest.mark.refparity
def test_z_image_img2img_and_inpaint(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers_tpu.pipelines.z_image import ZImageImg2ImgPipeline, ZImageInpaintPipeline

    _save_z_image_repo(tmp_path, torch)
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1)

    pipe = ZImageImg2ImgPipeline.from_pretrained(str(tmp_path), tokenizer=DummyQwen3Tokenizer())
    out = pipe("a lantern", image=src, strength=0.6, num_inference_steps=4,
               guidance_scale=3.0, key=jax.random.PRNGKey(0),
               max_sequence_length=24, output_type="np")
    img = np.asarray(out.images)
    assert img.shape == (1, 32, 32, 3) and np.isfinite(img).all()

    inpaint = ZImageInpaintPipeline.from_pretrained(str(tmp_path), tokenizer=DummyQwen3Tokenizer())

    # VAE round-trip of the source via the zero-mask inpaint (denoise ignored)
    zero = np.zeros((32, 32), np.float32)
    roundtrip = inpaint("a lantern", image=src, mask_image=zero, strength=1.0,
                        num_inference_steps=3, guidance_scale=3.0, key=jax.random.PRNGKey(0),
                        max_sequence_length=24, output_type="np").images
    # lower strength stays closer to the round-trip than higher strength
    near = pipe("a lantern", image=src, strength=0.25, num_inference_steps=4,
                guidance_scale=3.0, key=jax.random.PRNGKey(0),
                max_sequence_length=24, output_type="np").images
    assert np.abs(near - roundtrip).mean() <= np.abs(img - roundtrip).mean() + 1e-6
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = inpaint("a lantern", image=src, mask_image=mask, strength=1.0,
                  num_inference_steps=3, guidance_scale=3.0, key=jax.random.PRNGKey(0),
                  max_sequence_length=24, output_type="np").images
    assert np.isfinite(out).all()

    # all-zero mask ignores the denoise entirely: different prompts/keys agree
    a = inpaint("a lantern", image=src, mask_image=zero, strength=1.0,
                num_inference_steps=3, guidance_scale=3.0, key=jax.random.PRNGKey(0),
                max_sequence_length=24, output_type="np").images
    b = inpaint("a red panda", image=src, mask_image=zero, strength=1.0,
                num_inference_steps=3, guidance_scale=3.0, key=jax.random.PRNGKey(7),
                max_sequence_length=24, output_type="np").images
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.refparity
def test_z_image_controlnet_inpaint_pipeline(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers_tpu.pipelines.z_image import ZImageControlNetInpaintPipeline

    _save_z_image_repo(tmp_path, torch, with_controlnet=True)
    # index class name is for the txt2img controlnet pipeline; load explicitly
    pipe = ZImageControlNetInpaintPipeline.from_pretrained(
        str(tmp_path), tokenizer=DummyQwen3Tokenizer())
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1)
    ctrl = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32))
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    outs = []
    for scale in (0.0, 0.75):
        out = pipe("a pagoda", image=src, mask_image=mask, control_image=ctrl,
                   strength=1.0, num_inference_steps=3, guidance_scale=3.0,
                   controlnet_conditioning_scale=scale, key=jax.random.PRNGKey(0),
                   max_sequence_length=24, output_type="np").images
        assert np.isfinite(out).all()
        outs.append(np.asarray(out))
    assert float(np.max(np.abs(outs[0] - outs[1]))) > 1e-6


@pytest.mark.refparity
def test_z_image_controlnet_pipeline_generate(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers import (
        AutoencoderKL as TorchVAE,
        FlowMatchEulerDiscreteScheduler as TorchSched,
        ZImageTransformer2DModel as TorchTf,
    )
    from diffusers.models.controlnets.controlnet_z_image import (
        ZImageControlNetModel as TorchCN,
    )

    from diffusers_tpu.pipelines.z_image import ZImageControlNetPipeline

    torch.manual_seed(0)
    TorchTf(**TINY).save_pretrained(tmp_path / "transformer")
    # control_in_dim=6 > latent_channels=4 exercises the v2.0 zero-pad path
    tcn = TorchCN(**{**TINY_CN, "control_in_dim": 6})
    with torch.no_grad():
        # fresh controlnets have zero-init taps (no-op by design); randomize so
        # conditioning_scale visibly changes the output
        for mod in tcn.modules():
            for name in ("before_proj", "after_proj"):
                lin = getattr(mod, name, None)
                if lin is not None:
                    lin.weight.data.normal_(0.0, 0.2)
                    lin.bias.data.normal_(0.0, 0.2)
    tcn.save_pretrained(tmp_path / "controlnet")
    TorchVAE(
        in_channels=3, out_channels=3, block_out_channels=(8, 8, 8, 8),
        down_block_types=("DownEncoderBlock2D",) * 4, up_block_types=("UpDecoderBlock2D",) * 4,
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=32,
        scaling_factor=0.4, shift_factor=0.1,
    ).save_pretrained(tmp_path / "vae")
    _tiny_qwen3(torch).save_pretrained(tmp_path / "text_encoder")
    TorchSched(use_dynamic_shifting=True, base_shift=0.5, max_shift=1.15).save_pretrained(
        tmp_path / "scheduler")

    index = {
        "_class_name": "ZImageControlNetPipeline", "_diffusers_version": "0.40.0.dev0",
        "transformer": ["diffusers", "ZImageTransformer2DModel"],
        "controlnet": ["diffusers", "ZImageControlNetModel"],
        "vae": ["diffusers", "AutoencoderKL"],
        "text_encoder": ["transformers", "Qwen3ForCausalLM"],
        "tokenizer": [None, None],
        "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
    }
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(index, f)

    pipe = ZImageControlNetPipeline.from_pretrained(str(tmp_path), tokenizer=DummyQwen3Tokenizer())
    ctrl = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    outs = []
    for scale in (0.0, 0.75):
        out = pipe("a pagoda at dusk", control_image=jnp.asarray(ctrl),
                   height=32, width=32, num_inference_steps=2, guidance_scale=3.0,
                   controlnet_conditioning_scale=scale, key=jax.random.PRNGKey(0),
                   max_sequence_length=24, output_type="np")
        img = np.asarray(out.images)
        assert img.shape[0] == 1 and np.isfinite(img).all()
        outs.append(img)
    assert float(np.max(np.abs(outs[0] - outs[1]))) > 1e-6
