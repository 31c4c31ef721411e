"""Multi-ControlNet-Union wrapper.

Behavioral mirror of the reference
`models/controlnets/multicontrolnet_union.py:18` (MultiControlNetUnionModel):
per-net conditioning images + control-type bitmasks + scales; nets with
scale == 0.0 are skipped (trace-time — scales are static floats); residual
stacks are summed. Save/load layout matches `multicontrolnet.py`.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax

from .controlnet import ControlNetOutput
from .controlnet_union import ControlNetUnionModel
from .multicontrolnet import MultiControlNetModel


class MultiControlNetUnionModel(MultiControlNetModel):
    def __init__(self, controlnets: Union[List[ControlNetUnionModel], Tuple[ControlNetUnionModel, ...]]):
        super().__init__(controlnets)

    def __call__(
        self,
        params: Sequence,
        sample: jax.Array,
        timestep,
        encoder_hidden_states: jax.Array,
        controlnet_cond: Sequence,  # per net: list of cond images (one per active task)
        control_type: Sequence[jax.Array],  # per net: [B, num_control_type] bitmask
        control_type_idx: Sequence[Sequence[int]],  # per net: active task indices
        conditioning_scale: Union[float, Sequence[float]] = 1.0,
        added_cond_kwargs: Optional[dict] = None,
        guess_mode: bool = False,
        return_dict: bool = True,
    ):
        if not isinstance(conditioning_scale, (list, tuple)):
            conditioning_scale = [conditioning_scale] * len(self.nets)
        down_res, mid_res = None, None
        for net, p, image, ctype, ctype_idx, scale in zip(
            self.nets, params, controlnet_cond, control_type, control_type_idx, conditioning_scale
        ):
            if scale == 0.0:
                continue
            out = net(
                p, sample, timestep, encoder_hidden_states, image,
                control_type=ctype, control_type_idx=list(ctype_idx),
                conditioning_scale=scale, added_cond_kwargs=added_cond_kwargs,
                guess_mode=guess_mode,
            )
            if down_res is None:
                down_res, mid_res = list(out.down_block_res_samples), out.mid_block_res_sample
            else:
                down_res = [a + b for a, b in zip(down_res, out.down_block_res_samples)]
                mid_res = mid_res + out.mid_block_res_sample
        if not return_dict:
            return tuple(down_res), mid_res
        return ControlNetOutput(down_block_res_samples=tuple(down_res), mid_block_res_sample=mid_res)

    @classmethod
    def from_pretrained(cls, pretrained_model_path, **kwargs):
        kwargs.setdefault("controlnet_cls", ControlNetUnionModel)
        return super().from_pretrained(pretrained_model_path, **kwargs)
