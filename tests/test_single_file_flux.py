"""Flux single-file (BFL layout) + xlabs LoRA format loaders (VERDICT r2 #7).

Both tests construct the community formats synthetically from a tiny
reference-layout model, so the converters are exercised against the torch
reference's own converters as oracle."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=1, in_channels=4, num_layers=2, num_single_layers=2,
    attention_head_dim=8, num_attention_heads=4, joint_attention_dim=16,
    pooled_projection_dim=8, axes_dims_rope=(4, 2, 2), guidance_embeds=True,
)


def _diffusers_to_bfl(sd):
    """Inverse of the reference's convert_flux_transformer_checkpoint_to_diffusers
    — produces a synthetic BFL single-file state dict from diffusers keys."""
    out = {}
    inner = sd["x_embedder.weight"].shape[0]

    def swap(w):
        scale, shift = np.split(w, 2, axis=0)
        return np.concatenate([shift, scale], axis=0)

    simple = {
        "time_in.in_layer": "time_text_embed.timestep_embedder.linear_1",
        "time_in.out_layer": "time_text_embed.timestep_embedder.linear_2",
        "vector_in.in_layer": "time_text_embed.text_embedder.linear_1",
        "vector_in.out_layer": "time_text_embed.text_embedder.linear_2",
        "guidance_in.in_layer": "time_text_embed.guidance_embedder.linear_1",
        "guidance_in.out_layer": "time_text_embed.guidance_embedder.linear_2",
        "txt_in": "context_embedder",
        "img_in": "x_embedder",
        "final_layer.linear": "proj_out",
    }
    for dst, src in simple.items():
        out[f"{dst}.weight"] = sd[f"{src}.weight"]
        out[f"{dst}.bias"] = sd[f"{src}.bias"]
    out["final_layer.adaLN_modulation.1.weight"] = swap(sd["norm_out.linear.weight"])
    out["final_layer.adaLN_modulation.1.bias"] = swap(sd["norm_out.linear.bias"])

    i = 0
    while f"transformer_blocks.{i}.norm1.linear.weight" in sd:
        p, s = f"transformer_blocks.{i}.", f"double_blocks.{i}."
        out[f"{s}img_mod.lin.weight"] = sd[f"{p}norm1.linear.weight"]
        out[f"{s}img_mod.lin.bias"] = sd[f"{p}norm1.linear.bias"]
        out[f"{s}txt_mod.lin.weight"] = sd[f"{p}norm1_context.linear.weight"]
        out[f"{s}txt_mod.lin.bias"] = sd[f"{p}norm1_context.linear.bias"]
        out[f"{s}img_attn.qkv.weight"] = np.concatenate(
            [sd[f"{p}attn.to_q.weight"], sd[f"{p}attn.to_k.weight"], sd[f"{p}attn.to_v.weight"]], axis=0)
        out[f"{s}img_attn.qkv.bias"] = np.concatenate(
            [sd[f"{p}attn.to_q.bias"], sd[f"{p}attn.to_k.bias"], sd[f"{p}attn.to_v.bias"]], axis=0)
        out[f"{s}txt_attn.qkv.weight"] = np.concatenate(
            [sd[f"{p}attn.add_q_proj.weight"], sd[f"{p}attn.add_k_proj.weight"], sd[f"{p}attn.add_v_proj.weight"]], axis=0)
        out[f"{s}txt_attn.qkv.bias"] = np.concatenate(
            [sd[f"{p}attn.add_q_proj.bias"], sd[f"{p}attn.add_k_proj.bias"], sd[f"{p}attn.add_v_proj.bias"]], axis=0)
        out[f"{s}img_attn.norm.query_norm.scale"] = sd[f"{p}attn.norm_q.weight"]
        out[f"{s}img_attn.norm.key_norm.scale"] = sd[f"{p}attn.norm_k.weight"]
        out[f"{s}txt_attn.norm.query_norm.scale"] = sd[f"{p}attn.norm_added_q.weight"]
        out[f"{s}txt_attn.norm.key_norm.scale"] = sd[f"{p}attn.norm_added_k.weight"]
        for a, b in (("img_mlp.0", "ff.net.0.proj"), ("img_mlp.2", "ff.net.2"),
                     ("txt_mlp.0", "ff_context.net.0.proj"), ("txt_mlp.2", "ff_context.net.2"),
                     ("img_attn.proj", "attn.to_out.0"), ("txt_attn.proj", "attn.to_add_out")):
            out[f"{s}{a}.weight"] = sd[f"{p}{b}.weight"]
            out[f"{s}{a}.bias"] = sd[f"{p}{b}.bias"]
        i += 1

    i = 0
    while f"single_transformer_blocks.{i}.norm.linear.weight" in sd:
        p, s = f"single_transformer_blocks.{i}.", f"single_blocks.{i}."
        out[f"{s}modulation.lin.weight"] = sd[f"{p}norm.linear.weight"]
        out[f"{s}modulation.lin.bias"] = sd[f"{p}norm.linear.bias"]
        out[f"{s}linear1.weight"] = np.concatenate(
            [sd[f"{p}attn.to_q.weight"], sd[f"{p}attn.to_k.weight"], sd[f"{p}attn.to_v.weight"],
             sd[f"{p}proj_mlp.weight"]], axis=0)
        out[f"{s}linear1.bias"] = np.concatenate(
            [sd[f"{p}attn.to_q.bias"], sd[f"{p}attn.to_k.bias"], sd[f"{p}attn.to_v.bias"],
             sd[f"{p}proj_mlp.bias"]], axis=0)
        out[f"{s}norm.query_norm.scale"] = sd[f"{p}attn.norm_q.weight"]
        out[f"{s}norm.key_norm.scale"] = sd[f"{p}attn.norm_k.weight"]
        out[f"{s}linear2.weight"] = sd[f"{p}proj_out.weight"]
        out[f"{s}linear2.bias"] = sd[f"{p}proj_out.bias"]
        i += 1
    return out


def test_flux_single_file_roundtrip():
    torch = pytest.importorskip("torch")
    from diffusers import FluxTransformer2DModel as TorchFlux

    from diffusers_tpu.loaders.single_file import load_flux_transformer_single_file

    torch.manual_seed(0)
    tm = TorchFlux(**TINY)
    tm.eval()
    diff_sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    bfl_sd = _diffusers_to_bfl(diff_sd)

    model, params = load_flux_transformer_single_file(bfl_sd, config_overrides={"axes_dims_rope": (4, 2, 2)})
    assert model.config.num_layers == 2 and model.config.num_single_layers == 2
    assert model.config.guidance_embeds

    # output parity vs the torch reference model
    rng = np.random.RandomState(0)
    b, img_seq, txt_seq = 1, 16, 8
    hidden = rng.randn(b, img_seq, 4).astype(np.float32)
    ehs = rng.randn(b, txt_seq, 16).astype(np.float32)
    pooled = rng.randn(b, 8).astype(np.float32)
    img_ids = np.stack([np.zeros(img_seq), np.repeat(np.arange(4), 4), np.tile(np.arange(4), 4)], -1).astype(np.float32)
    txt_ids = np.zeros((txt_seq, 3), dtype=np.float32)
    t = np.asarray([0.5], np.float32)
    g = np.asarray([3.0], np.float32)
    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(hidden), encoder_hidden_states=torch.from_numpy(ehs),
            pooled_projections=torch.from_numpy(pooled), timestep=torch.from_numpy(t),
            img_ids=torch.from_numpy(img_ids), txt_ids=torch.from_numpy(txt_ids),
            guidance=torch.from_numpy(g),
        ).sample.numpy()
    cos, sin = model.pos_embed({}, np.concatenate([txt_ids, img_ids], axis=0))
    out = model(
        params, jnp.asarray(hidden), encoder_hidden_states=jnp.asarray(ehs),
        pooled_projections=jnp.asarray(pooled), timestep=jnp.asarray(t),
        guidance=jnp.asarray(g), image_rotary_emb=(jnp.asarray(cos), jnp.asarray(sin)),
    ).sample
    assert np.max(np.abs(np.asarray(out) - ref)) < 5e-4


def test_xlabs_lora_matches_reference_converter():
    torch = pytest.importorskip("torch")
    from diffusers.loaders.lora_conversion_utils import _convert_xlabs_flux_lora_to_diffusers

    from diffusers_tpu.loaders.lora import convert_xlabs_flux_lora, group_lora_weights

    rng = np.random.RandomState(0)
    rank, dim = 4, 32
    xlabs = {}
    for i in range(2):
        for name, outdim in (("qkv_lora1", 3 * dim), ("qkv_lora2", 3 * dim)):
            xlabs[f"double_blocks.{i}.processor.{name}.down.weight"] = rng.randn(rank, dim).astype(np.float32)
            xlabs[f"double_blocks.{i}.processor.{name}.up.weight"] = rng.randn(outdim, rank).astype(np.float32)
        for name in ("proj_lora1", "proj_lora2"):
            xlabs[f"double_blocks.{i}.processor.{name}.down.weight"] = rng.randn(rank, dim).astype(np.float32)
            xlabs[f"double_blocks.{i}.processor.{name}.up.weight"] = rng.randn(dim, rank).astype(np.float32)

    ref = _convert_xlabs_flux_lora_to_diffusers({k: torch.from_numpy(v) for k, v in dict(xlabs).items()})
    ours = convert_xlabs_flux_lora(xlabs)
    assert set(ours) == set(ref), (set(ours) ^ set(ref))
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k].numpy(), atol=0)

    grouped = group_lora_weights(dict(xlabs), component="transformer")
    assert "transformer_blocks.0.attn.to_q" in grouped
    assert "transformer_blocks.1.attn.to_add_out" in grouped
