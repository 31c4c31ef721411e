"""IP-Adapter: checkpoint conversion, grafted attention, image projection,
and CLIP vision encoder — parity vs the reference torch implementation."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

torch = pytest.importorskip("torch")


def _tiny_torch_unet():
    from diffusers import UNet2DConditionModel as TorchUNet

    torch.manual_seed(0)
    return TorchUNet(
        sample_size=16, in_channels=4, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=1, attention_head_dim=4,
        cross_attention_dim=32, norm_num_groups=32,
    )


def _synthetic_ip_state_dict(unet, clip_dim=48, seed=0):
    """Checkpoint-format IP-Adapter dict sized to a given reference UNet."""
    g = torch.Generator().manual_seed(seed)
    cross_dim = unet.config.cross_attention_dim
    image_proj = {
        "proj.weight": torch.randn(4 * cross_dim, clip_dim, generator=g) * 0.05,
        "proj.bias": torch.randn(4 * cross_dim, generator=g) * 0.01,
        "norm.weight": 1 + 0.1 * torch.randn(cross_dim, generator=g),
        "norm.bias": 0.1 * torch.randn(cross_dim, generator=g),
    }
    ip_adapter = {}
    key_id = 1
    for name in unet.attn_processors:
        if not name.endswith("attn1.processor"):
            attn = unet.get_submodule(name.rsplit(".processor", 1)[0])
            inner = attn.to_k.weight.shape[0]
            ip_adapter[f"{key_id}.to_k_ip.weight"] = torch.randn(inner, cross_dim, generator=g) * 0.05
            ip_adapter[f"{key_id}.to_v_ip.weight"] = torch.randn(inner, cross_dim, generator=g) * 0.05
            key_id += 2
    return {"image_proj": image_proj, "ip_adapter": ip_adapter}


def test_ip_adapter_unet_parity():
    """Full UNet forward with a loaded IP-Adapter matches the reference."""
    from diffusers_tpu.loaders.ip_adapter import load_ip_adapter, set_ip_adapter_scale
    from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

    ref_unet = _tiny_torch_unet()
    sd_ip = _synthetic_ip_state_dict(ref_unet)
    base_state = {k: v.numpy() for k, v in ref_unet.state_dict().items()}

    ref_unet._load_ip_adapter_weights([{k: {kk: vv.clone() for kk, vv in v.items()} for k, v in sd_ip.items()}])

    ours = UNet2DConditionModel(**{k: v for k, v in ref_unet.config.items() if not k.startswith("_")})
    params = convert_torch_state_dict(ours, base_state)
    params = load_ip_adapter(
        ours, params,
        {"image_proj": {k: v.numpy() for k, v in sd_ip["image_proj"].items()},
         "ip_adapter": {k: v.numpy() for k, v in sd_ip["ip_adapter"].items()}},
    )

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(2, 8, 32).astype(np.float32)
    img = rng.randn(2, 1, 48).astype(np.float32)  # [B, num_images, clip_dim]

    with torch.no_grad():
        ref_out = ref_unet(
            torch.from_numpy(x), 5, torch.from_numpy(ehs),
            added_cond_kwargs={"image_embeds": [torch.from_numpy(img)]},
        ).sample.numpy()
    out = np.asarray(
        ours(params, jnp.asarray(x), 5, jnp.asarray(ehs),
             added_cond_kwargs={"image_embeds": [jnp.asarray(img)]}).sample
    )
    assert np.max(np.abs(out - ref_out)) < 5e-4, np.max(np.abs(out - ref_out))

    # scale=0 must reproduce the base (no-adapter) output
    set_ip_adapter_scale(ours, 0.0)
    base_params = convert_torch_state_dict(ours, base_state)
    base_unet = UNet2DConditionModel(**{k: v for k, v in ref_unet.config.items() if not k.startswith("_")})
    base_out = np.asarray(base_unet(base_params, jnp.asarray(x), 5, jnp.asarray(ehs)).sample)
    scaled_out = np.asarray(
        ours(params, jnp.asarray(x), 5, jnp.asarray(ehs),
             added_cond_kwargs={"image_embeds": [jnp.asarray(img)]}).sample
    )
    assert np.max(np.abs(scaled_out - base_out)) < 1e-5
    set_ip_adapter_scale(ours, 1.0)


def test_ip_adapter_plus_projection_parity():
    """Perceiver-resampler checkpoint conversion matches the reference's."""
    from diffusers.loaders.unet import UNet2DConditionLoadersMixin

    from diffusers_tpu.loaders.ip_adapter import _convert_image_proj

    g = torch.Generator().manual_seed(1)
    hidden, embed, out_dim, n_queries, depth = 64, 48, 32, 4, 4

    def rand(*shape, scale=0.08):
        return torch.randn(*shape, generator=g) * scale

    state = {"latents": rand(1, n_queries, hidden), "proj_in.weight": rand(hidden, embed),
             "proj_in.bias": rand(hidden), "proj_out.weight": rand(out_dim, hidden),
             "proj_out.bias": rand(out_dim), "norm_out.weight": 1 + rand(out_dim, scale=0.02),
             "norm_out.bias": rand(out_dim, scale=0.02)}
    for n in range(depth):
        state.update({
            f"layers.{n}.0.norm1.weight": 1 + rand(hidden, scale=0.02),
            f"layers.{n}.0.norm1.bias": rand(hidden, scale=0.02),
            f"layers.{n}.0.norm2.weight": 1 + rand(hidden, scale=0.02),
            f"layers.{n}.0.norm2.bias": rand(hidden, scale=0.02),
            f"layers.{n}.0.to_q.weight": rand(hidden, hidden),
            f"layers.{n}.0.to_kv.weight": rand(2 * hidden, hidden),
            f"layers.{n}.0.to_out.weight": rand(hidden, hidden),
            f"layers.{n}.1.0.weight": 1 + rand(hidden, scale=0.02),
            f"layers.{n}.1.0.bias": rand(hidden, scale=0.02),
            f"layers.{n}.1.1.weight": rand(4 * hidden, hidden),
            f"layers.{n}.1.3.weight": rand(hidden, 4 * hidden),
        })

    class _Host(UNet2DConditionLoadersMixin):
        device = torch.device("cpu")
        dtype = torch.float32

    ref_proj = _Host()._convert_ip_adapter_image_proj_to_diffusers(
        {k: v.clone() for k, v in state.items()}, low_cpu_mem_usage=False
    )
    module, params, num_tokens = _convert_image_proj({k: v.numpy() for k, v in state.items()})
    assert num_tokens == n_queries

    x = np.random.RandomState(3).randn(2, 7, embed).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_proj(torch.from_numpy(x)).numpy()
    out = np.asarray(module(params, jnp.asarray(x)))
    assert np.max(np.abs(out - ref_out)) < 5e-5, np.max(np.abs(out - ref_out))


def test_clip_vision_model_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection as HFVision

    from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
    from diffusers_tpu.models.text_encoders.clip import CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        image_size=32, patch_size=8, projection_dim=24,
    )
    torch.manual_seed(0)
    ref = HFVision(cfg).eval()

    ours = CLIPVisionModelWithProjection(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        image_size=32, patch_size=8, projection_dim=24,
    )
    state = {k: v.numpy() for k, v in ref.state_dict().items() if not k.endswith("position_ids")}
    params = convert_torch_state_dict(ours, state)

    px = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(px), output_hidden_states=True)
    out = ours(params, jnp.asarray(px), output_hidden_states=True)

    assert np.max(np.abs(np.asarray(out.image_embeds) - ref_out.image_embeds.numpy())) < 5e-5
    assert np.max(np.abs(np.asarray(out.last_hidden_state) - ref_out.last_hidden_state.numpy())) < 5e-5
    # penultimate hidden states: what IP-Adapter Plus consumes
    assert np.max(np.abs(np.asarray(out.hidden_states[-2]) - ref_out.hidden_states[-2].numpy())) < 5e-5


def test_ip_adapter_unload_restores_base():
    from diffusers_tpu.loaders.ip_adapter import load_ip_adapter, unload_ip_adapter
    from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

    ref_unet = _tiny_torch_unet()
    sd_ip = _synthetic_ip_state_dict(ref_unet)
    base_state = {k: v.numpy() for k, v in ref_unet.state_dict().items()}

    ours = UNet2DConditionModel(**{k: v for k, v in ref_unet.config.items() if not k.startswith("_")})
    params = convert_torch_state_dict(ours, base_state)
    params_ip = load_ip_adapter(
        ours, params,
        {"image_proj": {k: v.numpy() for k, v in sd_ip["image_proj"].items()},
         "ip_adapter": {k: v.numpy() for k, v in sd_ip["ip_adapter"].items()}},
    )
    params_clean = unload_ip_adapter(ours, params_ip)
    assert ours.encoder_hid_proj is None

    rng = np.random.RandomState(7)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(1, 8, 32).astype(np.float32)
    a = np.asarray(ours(params_clean, jnp.asarray(x), 3, jnp.asarray(ehs)).sample)
    b = np.asarray(ours(params, jnp.asarray(x), 3, jnp.asarray(ehs)).sample)
    assert np.max(np.abs(a - b)) < 1e-6


def test_sd_pipeline_with_ip_adapter():
    """End-to-end: load an adapter into a tiny SD pipeline, generate with
    image embeds, and verify scale=0 reproduces the no-adapter image."""
    import jax

    from diffusers_tpu.loaders.ip_adapter import _iter_cross_attention_paths
    from test_pipeline_stable_diffusion import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    kwargs = dict(num_inference_steps=2, guidance_scale=6.0, key=jax.random.PRNGKey(0), output_type="np")
    base = pipe("a photo of a cat", **kwargs).images

    unet = pipe.unet[0]
    cross_dim = unet.config.cross_attention_dim
    clip_dim = 8
    rng = np.random.RandomState(0)
    ip_sd = {
        "image_proj": {
            "proj.weight": rng.randn(4 * cross_dim, clip_dim).astype(np.float32) * 0.05,
            "proj.bias": np.zeros(4 * cross_dim, np.float32),
            "norm.weight": np.ones(cross_dim, np.float32),
            "norm.bias": np.zeros(cross_dim, np.float32),
        },
        "ip_adapter": {},
    }
    for n, (_, attn) in enumerate(_iter_cross_attention_paths(unet)):
        ip_sd["ip_adapter"][f"{2 * n + 1}.to_k_ip.weight"] = rng.randn(attn.inner_kv_dim, cross_dim).astype(np.float32) * 0.05
        ip_sd["ip_adapter"][f"{2 * n + 1}.to_v_ip.weight"] = rng.randn(attn.inner_kv_dim, cross_dim).astype(np.float32) * 0.05

    pipe.load_ip_adapter(ip_sd)
    embeds = [jnp.asarray(rng.randn(2, 1, clip_dim).astype(np.float32))]  # [2B (cfg), 1 image, D]
    with_ip = pipe("a photo of a cat", ip_adapter_image_embeds=embeds, **kwargs).images
    assert with_ip.shape == base.shape and np.isfinite(with_ip).all()
    assert np.abs(with_ip - base).max() > 1e-5  # the adapter changed the image

    pipe.set_ip_adapter_scale(0.0)
    zero_scale = pipe("a photo of a cat", ip_adapter_image_embeds=embeds, **kwargs).images
    assert np.abs(zero_scale - base).max() < 1e-4

    pipe.unload_ip_adapter()
    unloaded = pipe("a photo of a cat", **kwargs).images
    assert np.abs(unloaded - base).max() < 1e-6


def test_sdxl_pipeline_with_ip_adapter():
    import jax

    from diffusers_tpu.loaders.ip_adapter import _iter_cross_attention_paths
    from test_pipeline_sdxl import get_dummy_pipeline as get_sdxl_pipeline

    pipe = get_sdxl_pipeline()
    kwargs = dict(num_inference_steps=2, guidance_scale=5.0, key=jax.random.PRNGKey(0), output_type="np")
    base = pipe("a cat", **kwargs).images

    unet = pipe.unet[0]
    cross_dim = unet.config.cross_attention_dim
    clip_dim = 8
    rng = np.random.RandomState(0)
    ip_sd = {
        "image_proj": {
            "proj.weight": rng.randn(4 * cross_dim, clip_dim).astype(np.float32) * 0.05,
            "proj.bias": np.zeros(4 * cross_dim, np.float32),
            "norm.weight": np.ones(cross_dim, np.float32),
            "norm.bias": np.zeros(cross_dim, np.float32),
        },
        "ip_adapter": {},
    }
    for n, (_, attn) in enumerate(_iter_cross_attention_paths(unet)):
        ip_sd["ip_adapter"][f"{2 * n + 1}.to_k_ip.weight"] = rng.randn(attn.inner_kv_dim, cross_dim).astype(np.float32) * 0.05
        ip_sd["ip_adapter"][f"{2 * n + 1}.to_v_ip.weight"] = rng.randn(attn.inner_kv_dim, cross_dim).astype(np.float32) * 0.05

    pipe.load_ip_adapter(ip_sd)
    embeds = [jnp.asarray(rng.randn(2, 1, clip_dim).astype(np.float32))]
    out = pipe("a cat", ip_adapter_image_embeds=embeds, **kwargs).images
    assert out.shape == base.shape and np.isfinite(out).all()
    assert np.abs(out - base).max() > 1e-5


def test_ip_adapter_faceid_projection_parity():
    """FaceID checkpoint conversion matches the reference's (loaders/unet.py:498)."""
    from diffusers.loaders.unet import UNet2DConditionLoadersMixin

    from diffusers_tpu.loaders.ip_adapter import _convert_image_proj

    g = torch.Generator().manual_seed(2)
    id_dim, cross_dim, mult, num_tokens = 24, 32, 2, 4

    def rand(*shape, scale=0.08):
        return torch.randn(*shape, generator=g) * scale

    state = {
        "proj.0.weight": rand(id_dim * mult, id_dim),
        "proj.0.bias": rand(id_dim * mult),
        "proj.2.weight": rand(cross_dim * num_tokens, id_dim * mult),
        "proj.2.bias": rand(cross_dim * num_tokens),
        "norm.weight": 1 + rand(cross_dim, scale=0.02),
        "norm.bias": rand(cross_dim, scale=0.02),
    }

    class _Host(UNet2DConditionLoadersMixin):
        device = torch.device("cpu")
        dtype = torch.float32

    ref_proj = _Host()._convert_ip_adapter_image_proj_to_diffusers(
        {k: v.clone() for k, v in state.items()}, low_cpu_mem_usage=False
    )
    module, params, n_tokens = _convert_image_proj({k: v.numpy() for k, v in state.items()})
    assert n_tokens == num_tokens

    x = np.random.RandomState(4).randn(2, id_dim).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_proj(torch.from_numpy(x)).numpy()
    out = np.asarray(module(params, jnp.asarray(x)))
    assert out.shape == ref_out.shape == (2, num_tokens, cross_dim)
    assert np.max(np.abs(out - ref_out)) < 5e-5, np.max(np.abs(out - ref_out))
