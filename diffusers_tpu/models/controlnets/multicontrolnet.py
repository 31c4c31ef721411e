"""Multi-ControlNet wrapper (sum of per-net residuals).

Behavioral mirror of the reference
`models/controlnets/multicontrolnet.py:15` (MultiControlNetModel): calls each
ControlNet with its own conditioning image + scale and sums the down/mid
residual stacks. Save/load layout matches the reference (`controlnet`,
`controlnet_1`, ...: `multicontrolnet.py:108-214`).

TPU note: the per-net loop unrolls at trace time (nets differ in config, so a
scan over heterogeneous params is not possible); XLA fuses the residual sums
into the producing convs.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple, Union

import jax

from ...utils import logging
from .controlnet import ControlNetModel, ControlNetOutput

logger = logging.get_logger(__name__)


class MultiControlNetModel:
    """Wrapper over several `ControlNetModel`s with a ControlNet-compatible
    call API. `params` is a sequence (list/tuple) of per-net param trees,
    aligned with `self.nets`."""

    def __init__(self, controlnets: Union[List[ControlNetModel], Tuple[ControlNetModel, ...]]):
        self.nets = list(controlnets)

    def __len__(self):
        return len(self.nets)

    def init_params(self, key: jax.Array, dtype=None):
        keys = jax.random.split(key, max(len(self.nets), 1))
        kwargs = {"dtype": dtype} if dtype is not None else {}
        return [net.init_params(k, **kwargs) for net, k in zip(self.nets, keys)]

    def __call__(
        self,
        params: Sequence,
        sample: jax.Array,
        timestep,
        encoder_hidden_states: jax.Array,
        controlnet_cond: Sequence[jax.Array],
        conditioning_scale: Union[float, Sequence[float]] = 1.0,
        added_cond_kwargs: Optional[dict] = None,
        guess_mode: bool = False,
        return_dict: bool = True,
    ):
        if not isinstance(conditioning_scale, (list, tuple)):
            conditioning_scale = [conditioning_scale] * len(self.nets)
        if len(controlnet_cond) != len(self.nets) or len(conditioning_scale) != len(self.nets):
            raise ValueError(
                f"Expected {len(self.nets)} conditioning images/scales, got "
                f"{len(controlnet_cond)} images and {len(conditioning_scale)} scales."
            )
        down_res, mid_res = None, None
        for net, p, image, scale in zip(self.nets, params, controlnet_cond, conditioning_scale):
            out = net(
                p, sample, timestep, encoder_hidden_states, image,
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

    # --- serialization (reference directory layout) -----------------------
    def save_pretrained(self, save_directory, params: Sequence, **kwargs):
        for i, (net, p) in enumerate(zip(self.nets, params)):
            suffix = "" if i == 0 else f"_{i}"
            net.save_pretrained(str(save_directory) + suffix, params=p, **kwargs)

    @classmethod
    def from_pretrained(cls, pretrained_model_path, *, controlnet_cls=ControlNetModel, **kwargs):
        idx, nets, params = 0, [], []
        path = str(pretrained_model_path)
        while os.path.isdir(path):
            net, p = controlnet_cls.from_pretrained(path, **kwargs)
            nets.append(net)
            params.append(p)
            idx += 1
            path = str(pretrained_model_path) + f"_{idx}"
        if not nets:
            raise ValueError(f"No ControlNets found under {pretrained_model_path}.")
        logger.info("%d controlnets loaded from %s.", len(nets), pretrained_model_path)
        return cls(nets), params
