"""TIME: Text-to-Image Model Editing.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/stable_diffusion_variants/pipeline_stable_diffusion_model_editing.py:50`,
arXiv:2303.08084): `edit_model` rewrites every CLIP-facing cross-attention
key/value projection with the closed-form ridge solution
`W' = (λW + Σ v·kᵀ)(λI + Σ k·kᵀ)⁻¹` (Eq. 5, `:591-612`), where k are the
source-prompt token embeddings and v the ORIGINAL projections of the aligned
destination-prompt tokens. Generation is then plain Stable Diffusion.

TPU-native: parameters are an explicit pytree, so the edit is pure — the
original tree is kept on the pipeline and `restart_params=True` simply swaps
it back before editing (no deepcopy of live modules). Our Linear kernels are
the transpose of torch weights; the update solves `K' = (λI + Σ k·kᵀ)⁻¹(λK +
Σ k·vᵀ)` which is the same equation in kernel layout.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp

from ...stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline

AUGS_CONST = ["A photo of ", "An image of ", "A picture of "]


class StableDiffusionModelEditingPipeline(StableDiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler,
                 safety_checker=None, feature_extractor=None, image_encoder=None,
                 requires_safety_checker: bool = False, with_to_k: bool = True,
                 with_augs: Optional[List[str]] = None):
        super().__init__(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, unet=unet,
            scheduler=scheduler, safety_checker=safety_checker,
            feature_extractor=feature_extractor, image_encoder=image_encoder,
            requires_safety_checker=requires_safety_checker,
        )
        self.with_to_k = with_to_k
        self.with_augs = AUGS_CONST if with_augs is None else list(with_augs)
        self._og_unet_params = self.unet[1]

    # ----------------------------------------------------------- edit logic

    def _projection_paths(self, params, text_dim):
        """Paths of cross-attention to_v (+ to_k) kernels consuming CLIP
        embeddings (reference `ca_clip_layers`, `:131-160`)."""
        paths_v, paths_k = [], []

        def walk(tree, path):
            for name, sub in tree.items():
                if not isinstance(sub, dict):
                    continue
                if name == "attn2" and "to_v" in sub and "kernel" in sub["to_v"]:
                    if sub["to_v"]["kernel"].shape[0] == text_dim:
                        paths_v.append(path + [name, "to_v"])
                        paths_k.append(path + [name, "to_k"])
                    continue
                walk(sub, path + [name])

        for top in ("down_blocks", "mid_block", "up_blocks"):
            if top in params:
                walk({top: params[top]}, [])
        return paths_v + (paths_k if self.with_to_k else [])

    def _align_token_indices(self, old_text: str, new_text: str):
        """Destination index for each source token (reference `:556-577`);
        identity fallback for tokenizers without a bare-call interface."""
        import numpy as np

        try:
            tokens_a = [int(t) for t in np.asarray(self.tokenizer(old_text).input_ids).ravel()]
            tokens_b = [int(t) for t in np.asarray(self.tokenizer(new_text).input_ids).ravel()]
        except Exception:
            return list(range(77))
        idxs, j = [], 0
        try:
            for tok in tokens_a:
                while tokens_b[j] != tok:
                    j += 1
                idxs.append(j)
                j += 1
        except IndexError:
            return list(range(77))
        while j < 77:
            idxs.append(j)
            j += 1
        while len(idxs) < 77:
            idxs.append(76)
        return idxs

    def edit_model(self, source_prompt: str, destination_prompt: str, lamb: float = 0.1,
                   restart_params: bool = True):
        """Apply the TIME closed-form edit; updates `self.unet` in place (the
        functional equivalent of the reference's weight mutation) and returns
        the new parameter tree."""
        unet, params = self.unet
        if restart_params:
            params = self._og_unet_params

        old_texts = [source_prompt]
        new_texts = [destination_prompt]
        base = old_texts[0] if not old_texts[0].startswith("A") else "a" + old_texts[0][1:]
        old_texts += [aug + base for aug in self.with_augs]
        base = new_texts[0] if not new_texts[0].startswith("A") else "a" + new_texts[0][1:]
        new_texts += [aug + base for aug in self.with_augs]

        # k* / v* token embeddings per sentence pair
        pairs = []
        for old_text, new_text in zip(old_texts, new_texts):
            embeds = self.encode_prompt([old_text, new_text], None, False)
            old_emb, new_emb = embeds[0], embeds[1]
            idxs = jnp.asarray(self._align_token_indices(old_text, new_text)[: old_emb.shape[0]])
            pairs.append((old_emb, new_emb[idxs]))

        text_dim = pairs[0][0].shape[-1]
        paths = self._projection_paths(params, text_dim)

        def get(tree, path):
            for p in path:
                tree = tree[p]
            return tree

        new_params = params
        for path in paths:
            kernel = get(params, path)["kernel"].astype(jnp.float32)  # [in, out]
            mat_kv = lamb * kernel  # λK + Σ k vᵀ
            mat_kk = lamb * jnp.eye(kernel.shape[0], dtype=jnp.float32)  # λI + Σ k kᵀ
            for old_emb, new_sel in pairs:
                k = old_emb.astype(jnp.float32)  # [77, in]
                v = (new_sel.astype(jnp.float32) @ kernel)  # ORIGINAL projection of v* tokens
                mat_kv = mat_kv + k.T @ v
                mat_kk = mat_kk + k.T @ k
            new_kernel = jnp.linalg.solve(mat_kk, mat_kv).astype(get(params, path)["kernel"].dtype)

            # functional path update
            def set_path(tree, path, value):
                if len(path) == 0:
                    out = dict(tree)
                    out["kernel"] = value
                    return out
                out = dict(tree)
                out[path[0]] = set_path(tree[path[0]], path[1:], value)
                return out

            new_params = set_path(new_params, path, new_kernel)

        self.register_modules(unet=(unet, new_params))
        self.clear_jit_cache()
        return new_params
