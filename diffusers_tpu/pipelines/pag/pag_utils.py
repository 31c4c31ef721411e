"""Shared PAG machinery for pipeline variants.

The reference gives every PAG pipeline its own ~1k-LoC file
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_sd_img2img.py` etc.)
that triples the batch through processor-swapped attention modules. The
TPU-native shape here: the perturbed conditional is a second traced forward
with the attention modules' ``pag_identity`` flag flipped at trace time
(see `guiders/perturbed_attention_guidance.py`), and both forwards live in
the same jitted `lax.scan` step so XLA schedules them back to back.

``PAGMixin`` lets each variant stay tiny: it captures the PAG knobs from
``__call__``, folds them into the per-instance jit cache key (so changing
``pag_scale`` between calls retraces instead of reusing a stale graph), and
provides the perturbed-forward + guidance-combination helpers the overridden
denoise scans use.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...guiders.perturbed_attention_guidance import pag_perturbed, select_pag_layers


class PAGMixin:
    """Mixin over a base pipeline class. Subclasses override the parent's
    denoise method with a PAG-aware scan; ``__call__`` keyword-extracts the
    PAG knobs and defers everything else to the parent."""

    def _set_pag(self, pag_scale, pag_applied_layers, pag_start, pag_stop):
        model = None
        for attr in ("unet", "transformer"):
            pair = getattr(self, attr, None)
            if pair is not None:
                model = pair[0]
                break
        if model is None:
            raise ValueError("PAG pipeline has neither a unet nor a transformer")
        patterns = (
            tuple(pag_applied_layers)
            if isinstance(pag_applied_layers, (list, tuple))
            else (pag_applied_layers,)
        )
        self._pag_layers = tuple(select_pag_layers(model, list(patterns)))
        self._pag_scale = float(pag_scale)
        self._pag_start = float(pag_start)
        self._pag_stop = float(pag_stop)
        self._pag_key = (self._pag_scale, patterns, self._pag_start, self._pag_stop)

    def _jit(self, name, fn=None, *, static=(), **jit_kwargs):
        # PAG knobs are baked into the traced graph; key the cache on them.
        return super()._jit(
            name, fn, static=tuple(static) + (getattr(self, "_pag_key", None),), **jit_kwargs
        )

    def __call__(
        self,
        *args,
        pag_scale: float = 3.0,
        pag_applied_layers="mid",
        pag_start: float = 0.0,
        pag_stop: float = 1.0,
        **kwargs,
    ):
        self._set_pag(pag_scale, pag_applied_layers, pag_start, pag_stop)
        return super().__call__(*args, **kwargs)

    # ---- helpers used inside the overridden denoise scans ----------------
    def _pag_cond_forward(self, model, params, latent_cond, t_b, cond_embeds, **model_kwargs):
        """Conditional forward with identity self-attention in the selected
        layers (traced once inside the scan body)."""
        with pag_perturbed(self._pag_layers):
            return model(params, latent_cond, t_b, encoder_hidden_states=cond_embeds, **model_kwargs).sample

    def _pag_combine(self, noise_pred, noise_perturb, i, n_steps, guidance_scale, do_cfg):
        """CFG + PAG combination with fractional-step gating
        (reference formula: `guiders/perturbed_attention_guidance.py:36`)."""
        if do_cfg:
            uncond, cond = jnp.split(noise_pred, 2, axis=0)
            pred = uncond + guidance_scale * (cond - uncond)
        else:
            cond, pred = noise_pred, noise_pred
        frac = i / jnp.maximum(n_steps, 1)
        pag_on = (frac >= self._pag_start) & (frac < self._pag_stop)
        return pred + jnp.where(pag_on, self._pag_scale, 0.0) * (cond - noise_perturb)

    @staticmethod
    def _cond_half(x, do_cfg):
        """Conditional half of a CFG-duplicated batch (arrays or dicts)."""
        if x is None or not do_cfg:
            return x
        if isinstance(x, dict):
            return {k: PAGMixin._cond_half(v, do_cfg) for k, v in x.items()}
        return jnp.split(x, 2, axis=0)[1]
