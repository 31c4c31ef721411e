"""Skip Layer Guidance (SLG, the SD3.5 recipe).

Functional mirror of the reference `guiders/skip_layer_guidance.py:57`:

    pred = pred_uncond + g·(pred_cond − pred_uncond)
                       + g_slg·(pred_cond − pred_cond_skip)

where `pred_cond_skip` is the conditional forward with whole transformer
blocks skipped (the blocks' trace-time ``layer_skip`` flag; see
models/transformers/transformer_sd3.py and models/attention_blocks.py). The
formula is shared with PAG — only the perturbation differs (identity blocks
here, identity attention there).
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ..configuration_utils import register_to_config
from .guider_utils import BaseGuidance, rescale_noise_cfg


class SkipLayerGuidance(BaseGuidance):
    _input_predictions = ["pred_cond", "pred_uncond", "pred_cond_skip"]

    @register_to_config
    def __init__(
        self,
        guidance_scale: float = 7.5,
        skip_layer_guidance_scale: float = 2.8,
        skip_layer_guidance_start: float = 0.01,
        skip_layer_guidance_stop: float = 0.2,
        skip_layer_indices: Optional[Union[int, List[int]]] = None,
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
            slg_on = (frac >= cfg.skip_layer_guidance_start) & (frac < cfg.skip_layer_guidance_stop)
            pred = pred + jnp.where(slg_on, cfg.skip_layer_guidance_scale, 0.0) * (pred_cond - pred_cond_skip)

        if cfg.guidance_rescale > 0.0:
            pred = rescale_noise_cfg(pred, pred_cond, cfg.guidance_rescale)
        enabled = self._enabled(step, num_steps)
        return jnp.where(enabled, pred, pred_cond)


class layers_skipped:
    """Context manager: flip `layer_skip` on the given block modules at trace
    time around the skip-forward."""

    def __init__(self, blocks):
        self.blocks = blocks

    def __enter__(self):
        for m in self.blocks:
            m.layer_skip = True

    def __exit__(self, *exc):
        for m in self.blocks:
            m.layer_skip = False
        return False


def select_skip_blocks(model, indices: Union[int, List[int]]):
    """Transformer blocks by index from a DiT (`transformer_blocks`) or all
    BasicTransformerBlocks of a UNet in enumeration order."""
    if isinstance(indices, int):
        indices = [indices]
    if hasattr(model, "transformer_blocks"):
        blocks = list(model.transformer_blocks)
    else:  # UNet: flatten every cross-attn transformer block
        from .perturbed_attention_guidance import iter_self_attention_names

        blocks = []
        seen = set()
        for name, _ in iter_self_attention_names(model):
            prefix = name.rsplit(".attn1", 1)[0]
            if prefix not in seen:
                seen.add(prefix)
                node = model
                for seg in prefix.split("."):
                    node = node[int(seg)] if seg.isdigit() else getattr(node, seg)
                blocks.append(node)
    return [blocks[i] for i in indices]
