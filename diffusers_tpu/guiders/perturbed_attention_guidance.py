"""Perturbed Attention Guidance (PAG) + Skip Layer Guidance formula.

Functional mirror of the reference
`guiders/perturbed_attention_guidance.py:36` / `guiders/skip_layer_guidance.py:208`:

    pred = pred_uncond + g·(pred_cond − pred_uncond)
                       + g_pag·(pred_cond − pred_perturbed)

where `pred_perturbed` is the conditional forward with identity self-attention
in the selected layers (the Attention module's trace-time ``pag_identity``
flag; see models/attention.py). Independent start/stop gating for the CFG and
the PAG terms, traced as jnp.where so the guider composes into scanned loops.
"""

from __future__ import annotations

import re
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ..configuration_utils import register_to_config
from .guider_utils import BaseGuidance, rescale_noise_cfg


class PerturbedAttentionGuidance(BaseGuidance):
    _input_predictions = ["pred_cond", "pred_uncond", "pred_cond_skip"]

    @register_to_config
    def __init__(
        self,
        guidance_scale: float = 7.5,
        perturbed_guidance_scale: float = 2.8,
        perturbed_guidance_start: float = 0.01,
        perturbed_guidance_stop: float = 0.2,
        perturbed_guidance_layers: Optional[Union[str, List[str]]] = "mid",
        guidance_rescale: float = 0.0,
        use_original_formulation: bool = False,
        start: float = 0.0,
        stop: float = 1.0,
    ):
        pass

    @property
    def num_conditions(self) -> int:
        return 3

    def __call__(
        self,
        pred_cond: jax.Array,
        pred_uncond: Optional[jax.Array] = None,
        pred_cond_skip: Optional[jax.Array] = None,
        step=0,
        num_steps: int = 1,
    ):
        cfg = self.config
        step = jnp.asarray(step, jnp.float32)
        frac = step / jnp.maximum(num_steps, 1)

        if pred_uncond is not None:
            base = pred_cond if cfg.use_original_formulation else pred_uncond
            pred = base + cfg.guidance_scale * (pred_cond - pred_uncond)
        else:
            pred = pred_cond
        if pred_cond_skip is not None:
            pag_on = (frac >= cfg.perturbed_guidance_start) & (frac < cfg.perturbed_guidance_stop)
            pred = pred + jnp.where(pag_on, cfg.perturbed_guidance_scale, 0.0) * (pred_cond - pred_cond_skip)

        if cfg.guidance_rescale > 0.0:
            pred = rescale_noise_cfg(pred, pred_cond, cfg.guidance_rescale)
        enabled = self._enabled(step, num_steps)
        return jnp.where(enabled, pred, pred_cond)


def iter_self_attention_names(model):
    """(dotted_name, self_attention_module) for every perturbable
    self-attention — UNets (down/mid/up transformer blocks' attn1) and DiT
    transformers (transformer_blocks[*].attn / attn1)."""
    if hasattr(model, "down_blocks"):  # UNet family
        blocks = [(f"down_blocks.{i}", b) for i, b in enumerate(model.down_blocks)]
        blocks.append(("mid_block", model.mid_block))
        blocks += [(f"up_blocks.{i}", b) for i, b in enumerate(model.up_blocks)]
        for prefix, block in blocks:
            for j, t2d in enumerate(getattr(block, "attentions", None) or []):
                for k, tb in enumerate(t2d.transformer_blocks):
                    if getattr(tb, "attn1", None) is not None:
                        yield f"{prefix}.attentions.{j}.transformer_blocks.{k}.attn1", tb.attn1
        return
    if hasattr(model, "transformer_blocks"):  # DiT family (SD3, Sana, ...)
        for k, tb in enumerate(model.transformer_blocks):
            attn = getattr(tb, "attn", None) or getattr(tb, "attn1", None)
            if attn is not None and hasattr(type(attn), "pag_identity"):
                yield f"transformer_blocks.{k}.attn", attn
        return
    if hasattr(model, "blocks"):  # HunyuanDiT-style `blocks.{k}.attn1`
        for k, tb in enumerate(model.blocks):
            attn = getattr(tb, "attn1", None)
            if attn is not None and hasattr(type(attn), "pag_identity"):
                yield f"blocks.{k}.attn1", attn
        return
    raise ValueError(f"{type(model).__name__} has no PAG-perturbable attention layers")


def select_pag_layers(unet, patterns: Union[str, List[str]]):
    """Self-attention modules whose dotted name matches any pattern
    (substring/regex, reference pag_utils.set_pag_applied_layers semantics:
    'mid', 'down_blocks.1', 'blocks.1.attentions.0', ...)."""
    if isinstance(patterns, str):
        patterns = [patterns]
    selected = []
    for name, attn in iter_self_attention_names(unet):
        if any(re.search(p, name) for p in patterns):
            selected.append(attn)
    if not selected:
        raise ValueError(f"no self-attention layers matched {patterns}")
    return selected


class pag_perturbed:
    """Context manager: flip `pag_identity` on the selected layers at trace
    time around the perturbed forward."""

    def __init__(self, layers):
        self.layers = layers

    def __enter__(self):
        for m in self.layers:
            m.pag_identity = True

    def __exit__(self, *exc):
        for m in self.layers:
            m.pag_identity = False
        return False
