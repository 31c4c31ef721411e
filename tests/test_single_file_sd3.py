"""SD3 single-file (SAI MMDiT layout) conversion + load parity.

Reference: loaders/single_file_utils.py:1979
convert_sd3_transformer_checkpoint_to_diffusers.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

from diffusers_tpu.loaders.single_file import (
    convert_sd3_transformer_state_dict,
    infer_single_file_checkpoint_type,
    is_sd3_single_file,
    load_sd3_transformer_single_file,
)

DIM, HEADS, HEAD_DIM, LAYERS, PATCH, IN_C, CAP, POOL, POS = 32, 4, 8, 2, 2, 4, 32, 16, 9


def _sai_sd():
    rng = np.random.RandomState(0)
    r = lambda *s: rng.randn(*s).astype(np.float32)
    # real SD3 checkpoints store the sincos table (not random); our PatchEmbed
    # recomputes it from the formula, so the fixture must use the true table
    from diffusers_tpu.models.embeddings import get_2d_sincos_pos_embed

    pos_table = get_2d_sincos_pos_embed(DIM, (POS, POS), base_size=8 // PATCH)[None].astype(np.float32)
    sd = {
        "pos_embed": pos_table,
        "x_embedder.proj.weight": r(DIM, IN_C, PATCH, PATCH),
        "x_embedder.proj.bias": r(DIM),
        "t_embedder.mlp.0.weight": r(DIM, 256), "t_embedder.mlp.0.bias": r(DIM),
        "t_embedder.mlp.2.weight": r(DIM, DIM), "t_embedder.mlp.2.bias": r(DIM),
        "y_embedder.mlp.0.weight": r(DIM, POOL), "y_embedder.mlp.0.bias": r(DIM),
        "y_embedder.mlp.2.weight": r(DIM, DIM), "y_embedder.mlp.2.bias": r(DIM),
        "context_embedder.weight": r(CAP, 32), "context_embedder.bias": r(CAP),
        "final_layer.linear.weight": r(PATCH * PATCH * IN_C, DIM),
        "final_layer.linear.bias": r(PATCH * PATCH * IN_C),
        "final_layer.adaLN_modulation.1.weight": r(2 * DIM, DIM),
        "final_layer.adaLN_modulation.1.bias": r(2 * DIM),
    }
    for i in range(LAYERS):
        last = i == LAYERS - 1
        for blk in ["x_block", "context_block"]:
            sd[f"joint_blocks.{i}.{blk}.attn.qkv.weight"] = r(3 * DIM, DIM)
            sd[f"joint_blocks.{i}.{blk}.attn.qkv.bias"] = r(3 * DIM)
            sd[f"joint_blocks.{i}.{blk}.attn.ln_q.weight"] = r(HEAD_DIM)
            sd[f"joint_blocks.{i}.{blk}.attn.ln_k.weight"] = r(HEAD_DIM)
        sd[f"joint_blocks.{i}.x_block.attn.proj.weight"] = r(DIM, DIM)
        sd[f"joint_blocks.{i}.x_block.attn.proj.bias"] = r(DIM)
        if not last:
            sd[f"joint_blocks.{i}.context_block.attn.proj.weight"] = r(DIM, DIM)
            sd[f"joint_blocks.{i}.context_block.attn.proj.bias"] = r(DIM)
        # dual attention on layer 0 (SD3.5-medium style)
        if i == 0:
            sd[f"joint_blocks.{i}.x_block.attn2.qkv.weight"] = r(3 * DIM, DIM)
            sd[f"joint_blocks.{i}.x_block.attn2.qkv.bias"] = r(3 * DIM)
            sd[f"joint_blocks.{i}.x_block.attn2.ln_q.weight"] = r(HEAD_DIM)
            sd[f"joint_blocks.{i}.x_block.attn2.ln_k.weight"] = r(HEAD_DIM)
            sd[f"joint_blocks.{i}.x_block.attn2.proj.weight"] = r(DIM, DIM)
            sd[f"joint_blocks.{i}.x_block.attn2.proj.bias"] = r(DIM)
        n_mod = 9 if i == 0 else 6  # dual-attn block uses 9-way modulation
        sd[f"joint_blocks.{i}.x_block.adaLN_modulation.1.weight"] = r(n_mod * DIM, DIM)
        sd[f"joint_blocks.{i}.x_block.adaLN_modulation.1.bias"] = r(n_mod * DIM)
        ctx_mod = 2 if last else 6
        sd[f"joint_blocks.{i}.context_block.adaLN_modulation.1.weight"] = r(ctx_mod * DIM, DIM)
        sd[f"joint_blocks.{i}.context_block.adaLN_modulation.1.bias"] = r(ctx_mod * DIM)
        for blk, pre in [("x_block", ""), ("context_block", "_context")]:
            if blk == "context_block" and last:
                continue
            sd[f"joint_blocks.{i}.{blk}.mlp.fc1.weight"] = r(4 * DIM, DIM)
            sd[f"joint_blocks.{i}.{blk}.mlp.fc1.bias"] = r(4 * DIM)
            sd[f"joint_blocks.{i}.{blk}.mlp.fc2.weight"] = r(DIM, 4 * DIM)
            sd[f"joint_blocks.{i}.{blk}.mlp.fc2.bias"] = r(DIM)
    return sd


def test_sniffing():
    sd = _sai_sd()
    assert is_sd3_single_file(sd)
    assert infer_single_file_checkpoint_type(sd) == "sd3"
    assert infer_single_file_checkpoint_type(
        {"model.diffusion_model.joint_blocks.0.x": np.zeros(1)}
    ) == "sd3"


def test_sd3_conversion_matches_reference():
    torch = pytest.importorskip("torch")
    from diffusers.loaders.single_file_utils import convert_sd3_transformer_checkpoint_to_diffusers

    ref = convert_sd3_transformer_checkpoint_to_diffusers(
        {k: torch.from_numpy(v) for k, v in _sai_sd().items()}
    )
    ours = convert_sd3_transformer_state_dict(_sai_sd())
    assert set(ours) == set(ref), sorted(set(ours) ^ set(ref))[:8]
    for k in ref:
        np.testing.assert_allclose(ours[k], ref[k].numpy(), atol=0, err_msg=k)


def test_sd3_single_file_load_forward_parity():
    torch = pytest.importorskip("torch")
    from diffusers import SD3Transformer2DModel as TorchSD3

    model, params = load_sd3_transformer_single_file(
        _sai_sd(),
        config_overrides=dict(attention_head_dim=HEAD_DIM, num_attention_heads=HEADS, sample_size=8),
    )
    assert model.config.num_layers == LAYERS
    assert model.config.dual_attention_layers == (0,)
    assert model.config.qk_norm == "rms_norm"

    tm = TorchSD3(
        sample_size=8, patch_size=PATCH, in_channels=IN_C, num_layers=LAYERS,
        attention_head_dim=HEAD_DIM, num_attention_heads=HEADS, joint_attention_dim=32,
        caption_projection_dim=CAP, pooled_projection_dim=POOL, out_channels=IN_C,
        pos_embed_max_size=POS, qk_norm="rms_norm", dual_attention_layers=(0,),
    )
    from diffusers.loaders.single_file_utils import convert_sd3_transformer_checkpoint_to_diffusers

    ref_sd = convert_sd3_transformer_checkpoint_to_diffusers(
        {k: torch.from_numpy(v) for k, v in _sai_sd().items()}
    )
    tm.load_state_dict(ref_sd)
    tm.eval()

    rng = np.random.RandomState(1)
    hidden = rng.randn(1, IN_C, 8, 8).astype(np.float32)
    ctx = rng.randn(1, 6, 32).astype(np.float32)
    pooled = rng.randn(1, POOL).astype(np.float32)
    t = np.array([500.0], np.float32)

    with torch.no_grad():
        ref_out = tm(
            hidden_states=torch.from_numpy(hidden),
            encoder_hidden_states=torch.from_numpy(ctx),
            pooled_projections=torch.from_numpy(pooled),
            timestep=torch.from_numpy(t),
        ).sample.numpy()
    ours_out = np.asarray(
        model(params, jnp.asarray(hidden), jnp.asarray(ctx), jnp.asarray(pooled), jnp.asarray(t)).sample
    )
    # random-normal weights amplify activations to ~1e3; scale-aware check
    # (atol at 1e-5 of the output magnitude covers near-zero elements)
    scale = float(np.abs(ref_out).max())
    np.testing.assert_allclose(ours_out, ref_out, rtol=1e-4, atol=1e-5 * scale)
