"""Shap-E: renderer parity (params-proj + NeRF render with deterministic ray
jitter), marching-cubes mesh parity, and from_pretrained -> generate.

Reference: `/root/reference/src/diffusers/pipelines/shap_e/renderer.py:783`,
`pipeline_shap_e.py:87`.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.pipelines.shap_e.renderer import ShapERenderer

sys.path.insert(0, "/root/reference/src")

RENDERER_TINY = dict(
    param_names=("nerstf.mlp.0.weight", "nerstf.mlp.1.weight",
                 "nerstf.mlp.2.weight", "nerstf.mlp.3.weight"),
    param_shapes=((16, 93), (16, 16), (16, 16), (16, 16)),
    d_latent=32,
    d_hidden=16,
    n_output=12,
    n_hidden_layers=6,
    act_fn="swish",
    insert_direction_at=4,
    background=(255.0, 255.0, 255.0),
)
NUM_VECTORS = 64  # sum of param_shapes[:,0]


def _patched_rand(monkeypatch, torch):
    """The reference hard-seeds torch.manual_seed(0) before its ray jitter —
    replace all jitter with 0.5 midpoints on both sides for exact parity."""
    monkeypatch.setattr(torch, "rand_like", lambda x: torch.full_like(x, 0.5))
    real_rand = torch.rand

    def rand(*size, **kwargs):
        if size and isinstance(size[0], (tuple, torch.Size)):
            size = tuple(size[0])
        if size and all(isinstance(s, (int, np.integer)) for s in size):
            kwargs.pop("device", None)
            kwargs.pop("generator", None)
            return torch.full(tuple(int(s) for s in size), 0.5, **kwargs)
        return real_rand(*size, **kwargs)

    monkeypatch.setattr(torch, "rand", rand)


@pytest.mark.refparity
def test_shap_e_renderer_image_parity(monkeypatch):
    torch = pytest.importorskip("torch")
    from diffusers.pipelines.shap_e.renderer import ShapERenderer as TorchRenderer

    tm = TorchRenderer(**RENDERER_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = ShapERenderer(**RENDERER_TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    latent = rng.randn(1, NUM_VECTORS, 32).astype(np.float32) * 0.1

    _patched_rand(monkeypatch, torch)
    with torch.no_grad():
        ref = tm.decode_to_image(
            torch.from_numpy(latent), device="cpu", size=8,
            ray_batch_size=1280, n_coarse_samples=8, n_fine_samples=8,
        ).numpy()
    out = np.asarray(m.decode_to_image(
        params, jnp.asarray(latent), size=8, ray_batch_size=1280,
        n_coarse_samples=8, n_fine_samples=8, key=None))
    assert out.shape == ref.shape
    # importance sampling picks bins by searchsorted(cdf, u): where a cdf
    # entry sits within float-accumulation noise of u the chosen bin flips
    # between frameworks, legitimately changing isolated rays — so parity is
    # asserted on the bulk of the image, not the max
    err = np.abs(out - ref)
    assert np.quantile(err, 0.98) < 2e-3, np.quantile(err, 0.98)
    assert err.mean() < 5e-4, err.mean()


@pytest.mark.refparity
def test_shap_e_mesh_parity():
    torch = pytest.importorskip("torch")
    from diffusers.pipelines.shap_e.renderer import ShapERenderer as TorchRenderer

    tm = TorchRenderer(**RENDERER_TINY)
    tm.eval()
    # the marching-cubes LUT ships in the checkpoint (zero-init in code) —
    # fill a random valid LUT so triangles actually appear
    rng = np.random.RandomState(1)
    cases = rng.randint(0, 12, size=(256, 5, 3))
    masks = rng.rand(256, 5) > 0.6
    masks[0] = False  # empty cubes stay empty
    with torch.no_grad():
        tm.mesh_decoder.cases.copy_(torch.from_numpy(cases))
        tm.mesh_decoder.masks.copy_(torch.from_numpy(masks))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = ShapERenderer(**RENDERER_TINY)
    params = convert_torch_state_dict(m, sd)

    latent = rng.randn(1, NUM_VECTORS, 32).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = tm.decode_to_mesh(torch.from_numpy(latent), device="cpu", grid_size=12)
    out = m.decode_to_mesh(params, jnp.asarray(latent), grid_size=12)
    rv = ref.verts.numpy()
    assert out.verts.shape == rv.shape
    assert np.array_equal(out.faces, ref.faces.numpy())
    # the random test LUT also selects edges that don't straddle the
    # isosurface; there t = s1/(s1-s2) is NaN or ill-conditioned on both
    # sides, so parity is asserted on the NaN pattern and the genuine
    # crossings (verts inside the bbox, where t is well-conditioned)
    assert np.array_equal(np.isfinite(rv).all(1), np.isfinite(out.verts).all(1))
    good = (np.isfinite(rv).all(1) & (np.abs(rv) <= 1.5).all(1)
            & (np.abs(out.verts) <= 1.5).all(1))
    assert good.sum() > 50
    assert np.max(np.abs(out.verts[good] - rv[good])) < 1e-2


class DummyClipTok:
    model_max_length = 77
    pad_token_id = 0

    def __call__(self, prompts, padding=None, max_length=77, truncation=True, return_tensors="np"):
        if isinstance(prompts, str):
            prompts = [prompts]

        class Out:
            pass

        o = Out()
        o.input_ids = np.array([[(hash(p) + i) % 80 + 1 for i in range(max_length)] for p in prompts])
        return o


@pytest.mark.refparity
def test_shap_e_from_pretrained_generate(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers import HeunDiscreteScheduler as TorchSched, PriorTransformer as TorchPrior
    from diffusers.pipelines.shap_e.renderer import ShapERenderer as TorchRenderer
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    from diffusers_tpu.pipelines.shap_e import ShapEPipeline

    torch.manual_seed(0)
    prior_cfg = dict(
        num_attention_heads=2, attention_head_dim=8, num_layers=2,
        embedding_dim=32, num_embeddings=NUM_VECTORS, additional_embeddings=0,
        time_embed_act_fn="gelu", norm_in_type="layer", embedding_proj_norm_type="layer",
        encoder_hid_proj_type=None, added_emb_type=None,
        time_embed_dim=16, embedding_proj_dim=10, clip_embed_dim=64,
    )
    TorchPrior(**prior_cfg).save_pretrained(tmp_path / "prior")
    TorchRenderer(**RENDERER_TINY).save_pretrained(tmp_path / "shap_e_renderer")
    CLIPTextModelWithProjection(CLIPTextConfig(
        vocab_size=99, hidden_size=10, intermediate_size=20, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=77, projection_dim=10,
    )).save_pretrained(tmp_path / "text_encoder")
    TorchSched(beta_schedule="exp", prediction_type="sample", use_karras_sigmas=True,
               clip_sample=True, clip_sample_range=1.0).save_pretrained(tmp_path / "scheduler")

    index = {
        "_class_name": "ShapEPipeline", "_diffusers_version": "0.40.0.dev0",
        "prior": ["diffusers", "PriorTransformer"],
        "shap_e_renderer": ["diffusers", "ShapERenderer"],
        "text_encoder": ["transformers", "CLIPTextModelWithProjection"],
        "tokenizer": [None, None],
        "scheduler": ["diffusers", "HeunDiscreteScheduler"],
    }
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(index, f)

    pipe = ShapEPipeline.from_pretrained(str(tmp_path), tokenizer=DummyClipTok())
    out = pipe("a donut", num_inference_steps=2, guidance_scale=4.0, frame_size=8,
               key=jax.random.PRNGKey(0), output_type="np")
    imgs = np.asarray(out.images)
    assert imgs.shape == (1, 20, 8, 8, 3) and np.isfinite(imgs).all()

    mesh = pipe("a donut", num_inference_steps=2, guidance_scale=4.0, output_type="mesh")
    assert mesh.images[0].verts.shape[-1] == 3
