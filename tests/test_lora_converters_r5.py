"""Round-5 LoRA format converters vs the reference's conversion utils,
plus hotswap semantics.

Reference: loaders/lora_conversion_utils.py:1599 (HunyuanVideo original
layout with fused qkv / linear1 projections), :2098 (musubi-tuner Wan);
loaders/peft.py load_lora_adapter(..., hotswap=True). Synthetic state dicts
are built in each trainer's native naming, converted by BOTH implementations,
and compared key-for-key, value-for-value.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

from diffusers_tpu.loaders.lora import (
    convert_hunyuan_video_lora,
    convert_musubi_wan_lora,
    group_lora_weights,
)

HIDDEN = 3072  # the reference splitter hardcodes single-block hidden=3072


def _hunyuan_sd(rank=4, torch_mode=False):
    rng = np.random.RandomState(0)
    sd = {}
    # double block: fused img qkv + txt qkv + per-stream projections + mlp
    base = "double_blocks.0"
    for fused, odim in [("img_attn_qkv", 3 * HIDDEN), ("txt_attn_qkv", 3 * HIDDEN)]:
        sd[f"{base}.{fused}.lora_A.weight"] = rng.randn(rank, HIDDEN).astype(np.float32)
        sd[f"{base}.{fused}.lora_B.weight"] = rng.randn(odim, rank).astype(np.float32)
    for mod, odim in [("img_attn_proj", HIDDEN), ("txt_attn_proj", HIDDEN),
                      ("img_mlp.fc1", 4 * HIDDEN), ("img_mlp.fc2", HIDDEN),
                      ("txt_mlp.fc1", 4 * HIDDEN), ("txt_mlp.fc2", HIDDEN),
                      ("img_mod.linear", 6 * HIDDEN), ("txt_mod.linear", 6 * HIDDEN)]:
        indim = HIDDEN if not mod.endswith(("fc2",)) else 4 * HIDDEN
        sd[f"{base}.{mod}.lora_A.weight"] = rng.randn(rank, indim).astype(np.float32)
        sd[f"{base}.{mod}.lora_B.weight"] = rng.randn(odim, rank).astype(np.float32)
    # single block: fused linear1 (qkv + mlp), linear2, modulation
    base = "single_blocks.0"
    sd[f"{base}.linear1.lora_A.weight"] = rng.randn(rank, HIDDEN).astype(np.float32)
    sd[f"{base}.linear1.lora_B.weight"] = rng.randn(3 * HIDDEN + 4 * HIDDEN, rank).astype(np.float32)
    sd[f"{base}.linear2.lora_A.weight"] = rng.randn(rank, HIDDEN + 4 * HIDDEN).astype(np.float32)
    sd[f"{base}.linear2.lora_B.weight"] = rng.randn(HIDDEN, rank).astype(np.float32)
    sd[f"{base}.modulation.linear.lora_A.weight"] = rng.randn(rank, HIDDEN).astype(np.float32)
    sd[f"{base}.modulation.linear.lora_B.weight"] = rng.randn(3 * HIDDEN, rank).astype(np.float32)
    if torch_mode:
        import torch

        sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    return sd


def test_hunyuan_video_lora_converter_matches_reference():
    pytest.importorskip("torch")
    from diffusers.loaders.lora_conversion_utils import _convert_hunyuan_video_lora_to_diffusers

    ref = _convert_hunyuan_video_lora_to_diffusers(_hunyuan_sd(torch_mode=True))
    ours = convert_hunyuan_video_lora(_hunyuan_sd())
    assert set(ours) == set(ref), sorted(set(ours) ^ set(ref))[:8]
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k].numpy(), atol=1e-6, err_msg=k)


def test_hunyuan_video_lora_autodetected_and_groups():
    grouped = group_lora_weights(_hunyuan_sd(), component="transformer")
    assert "transformer_blocks.0.attn.to_q" in grouped
    assert "single_transformer_blocks.0.proj_mlp" in grouped
    A, B, alpha, _bias = grouped["single_transformer_blocks.0.attn.to_k"]
    assert A.shape == (4, HIDDEN) and B.shape == (HIDDEN, 4)


def _musubi_sd(rank=4, dim=8, i2v=True, torch_mode=False):
    rng = np.random.RandomState(1)
    sd = {}
    for i in range(2):
        mods = [f"self_attn_{o}" for o in "qkvo"] + [f"cross_attn_{o}" for o in "qkvo"]
        mods += ["ffn_0", "ffn_2"]
        if i2v:
            mods += ["cross_attn_k_img", "cross_attn_v_img"]
        for mod in mods:
            base = f"lora_unet_blocks_{i}_{mod}"
            sd[f"{base}.lora_down.weight"] = rng.randn(rank, dim).astype(np.float32)
            sd[f"{base}.lora_up.weight"] = rng.randn(dim, rank).astype(np.float32)
            sd[f"{base}.alpha"] = np.asarray(float(rank) * 2, np.float32)
    if torch_mode:
        import torch

        sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    return sd


def test_musubi_wan_lora_converter_matches_reference():
    pytest.importorskip("torch")
    from diffusers.loaders.lora_conversion_utils import _convert_musubi_wan_lora_to_diffusers

    ref = _convert_musubi_wan_lora_to_diffusers(_musubi_sd(torch_mode=True))
    ours = convert_musubi_wan_lora(_musubi_sd())
    assert set(ours) == set(ref), sorted(set(ours) ^ set(ref))[:8]
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k].numpy(), atol=1e-6, err_msg=k)


def test_musubi_wan_lora_autodetected():
    grouped = group_lora_weights(_musubi_sd(), component="transformer")
    assert "blocks.1.attn2.add_k_proj" in grouped
    assert "blocks.0.ffn.net.0.proj" in grouped


# ---------------------------------------------------------------------------
# hotswap
# ---------------------------------------------------------------------------

def _tiny_sd_lora(seed, scale=0.1):
    rng = np.random.RandomState(seed)
    pref = "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q"
    return {
        pref + ".lora_A.weight": rng.randn(2, 16).astype(np.float32) * scale,
        pref + ".lora_B.weight": rng.randn(16, 2).astype(np.float32) * scale,
    }


def test_hotswap_replaces_weights_without_jit_invalidation():
    """hotswap_lora_weights swaps a loaded adapter's weights in place:
    output changes, compiled-graph cache entries survive (same shapes), and
    an unknown adapter or mismatched module set is rejected."""
    import jax

    from tests.test_pipeline_stable_diffusion import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    kwargs = dict(prompt="hotswap", height=16, width=16, num_inference_steps=1,
                  output_type="latent", key=jax.random.PRNGKey(0))

    with pytest.raises(ValueError):
        pipe.hotswap_lora_weights(_tiny_sd_lora(0))  # nothing loaded yet

    pipe.load_lora_weights(_tiny_sd_lora(0), adapter_name="style")
    out_a = np.asarray(pipe(**kwargs).images)
    jit_cache_before = dict(getattr(pipe, "_jit_cache", {}))

    pipe.hotswap_lora_weights(_tiny_sd_lora(1), adapter_name="style")
    out_b = np.asarray(pipe(**kwargs).images)
    assert not np.allclose(out_a, out_b)

    # jit cache entries were not cleared by the swap
    jit_cache_after = getattr(pipe, "_jit_cache", {})
    for k in jit_cache_before:
        assert k in jit_cache_after

    # fused kernel matches a fresh fuse of the new adapter
    k = np.asarray(pipe.unet[1]["mid_block"]["attentions"][0]["transformer_blocks"][0]["attn1"]["to_q"]["kernel"])
    base = np.asarray(pipe._lora_base["unet"]["mid_block"]["attentions"][0]["transformer_blocks"][0]["attn1"]["to_q"]["kernel"])
    lb = _tiny_sd_lora(1)
    pref = "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q"
    expected = base + (lb[pref + ".lora_B.weight"] @ lb[pref + ".lora_A.weight"]).T
    np.testing.assert_allclose(k, expected, atol=1e-5)

    # module-set mismatch is rejected
    other = {k.replace("to_q", "to_k"): v for k, v in _tiny_sd_lora(2).items()}
    extra = dict(_tiny_sd_lora(2), **other)
    with pytest.raises(ValueError):
        pipe.hotswap_lora_weights(extra, adapter_name="style")
