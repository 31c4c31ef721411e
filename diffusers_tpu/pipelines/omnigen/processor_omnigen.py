"""OmniGen multimodal prompt processor.

Behavioral mirror of the reference
`pipelines/omnigen/processor_omnigen.py`: the chat-style prefix template
(`:124`), `<|image_i|>` placeholder expansion to patch-token spans
(`:85`), left-padding with causal-text/bidirectional-image masks
(`OmniGenCollator.create_mask` `:202`), position ids that restart after
padding (`:190`). Host-side numpy throughout.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import numpy as np


def crop_image_array(image: np.ndarray, max_image_size: int) -> np.ndarray:
    """[H, W, 3] float/uint8 → cropped to multiples of 16, bounded by
    max_image_size (reference crop_image :28, array-based)."""
    h, w = image.shape[:2]
    scale = min(1.0, max_image_size / max(h, w))
    nh, nw = max(16, int(h * scale) // 16 * 16), max(16, int(w * scale) // 16 * 16)
    if (nh, nw) != (h, w):
        ys = (np.arange(nh) * h / nh).astype(np.int64)
        xs = (np.arange(nw) * w / nw).astype(np.int64)
        image = image[ys][:, xs]
    return image


class OmniGenCollator:
    def __init__(self, pad_token_id: int = 2, hidden_size: int = 3072, token_divisor: int = 256):
        self.pad_token_id = pad_token_id
        self.hidden_size = hidden_size
        # (vae_scale_factor * patch_size)^2 — 16*16 for the released model
        self.token_divisor = token_divisor

    def create_position(self, attention_mask: np.ndarray, num_tokens_for_output_images):
        position_ids = []
        text_length = attention_mask.shape[-1]
        img_length = max(num_tokens_for_output_images)
        for mask in attention_mask:
            temp_l = int(mask.sum())
            temp_position = [0] * (text_length - temp_l) + list(range(temp_l + img_length + 1))
            position_ids.append(temp_position)
        return np.asarray(position_ids, dtype=np.int64)

    def create_mask(self, attention_mask: np.ndarray, num_tokens_for_output_images):
        extended_mask = []
        text_length = attention_mask.shape[-1]
        img_length = max(num_tokens_for_output_images)
        seq_len = text_length + img_length + 1
        for inx, mask in enumerate(attention_mask):
            temp_l = int(mask.sum())
            pad_l = text_length - temp_l
            temp_mask = np.tril(np.ones((temp_l + 1, temp_l + 1)))
            temp_mask = np.concatenate([temp_mask, np.zeros((temp_l + 1, img_length))], axis=-1)
            temp_mask = np.concatenate(
                [temp_mask, np.ones((img_length, temp_l + img_length + 1))], axis=0
            )
            if pad_l > 0:
                temp_mask = np.concatenate([np.zeros((temp_l + 1 + img_length, pad_l)), temp_mask], axis=-1)
                temp_mask = np.concatenate([np.ones((pad_l, seq_len)), temp_mask], axis=0)
            true_img_length = num_tokens_for_output_images[inx]
            pad_img_length = img_length - true_img_length
            if pad_img_length > 0:
                temp_mask[:, -pad_img_length:] = 0
            extended_mask.append(temp_mask[None])
        return np.concatenate(extended_mask, axis=0)

    def adjust_attention_for_input_images(self, attention_mask, image_sizes):
        for b in image_sizes.keys():
            for start, end in image_sizes[b]:
                attention_mask[b][start:end, start:end] = 1
        return attention_mask

    def pad_input_ids(self, input_ids, image_sizes):
        max_l = max(len(x) for x in input_ids)
        padded_ids, attention_mask = [], []
        for i, ids in enumerate(input_ids):
            pad_l = max_l - len(ids)
            attention_mask.append([0] * pad_l + [1] * len(ids))
            padded_ids.append([self.pad_token_id] * pad_l + list(ids))
            if i in image_sizes and pad_l:
                image_sizes[i] = [[x + pad_l for x in span] for span in image_sizes[i]]
        return (np.asarray(padded_ids, dtype=np.int64),
                np.asarray(attention_mask, dtype=np.int64), image_sizes)

    def process_mllm_input(self, mllm_inputs, target_img_size):
        num_tokens_for_output_images = [h * w // self.token_divisor for h, w in target_img_size]
        pixel_values, image_sizes = [], {}
        for b, x in enumerate(mllm_inputs):
            if x["pixel_values"] is not None:
                pixel_values.extend(x["pixel_values"])
                for size in x["image_sizes"]:
                    image_sizes.setdefault(b, []).append(size)
        pixel_values = [np.asarray(v)[None] for v in pixel_values]

        input_ids = [x["input_ids"] for x in mllm_inputs]
        padded_ids, attention_mask, image_sizes = self.pad_input_ids(input_ids, image_sizes)
        position_ids = self.create_position(attention_mask, num_tokens_for_output_images)
        attention_mask = self.create_mask(attention_mask, num_tokens_for_output_images)
        attention_mask = self.adjust_attention_for_input_images(attention_mask, image_sizes)
        return padded_ids, position_ids, attention_mask, pixel_values, image_sizes

    def __call__(self, features):
        mllm_inputs = [f[0] for f in features]
        cfg_mllm_inputs = [f[1] for f in features]
        img_cfg_mllm_input = [f[2] for f in features]
        target_img_size = [f[3] for f in features]
        if img_cfg_mllm_input[0] is not None:
            mllm_inputs = mllm_inputs + cfg_mllm_inputs + img_cfg_mllm_input
            target_img_size = target_img_size * 3
        else:
            mllm_inputs = mllm_inputs + cfg_mllm_inputs
            target_img_size = target_img_size * 2
        ids, pos, mask, pixels, sizes = self.process_mllm_input(mllm_inputs, target_img_size)
        return {
            "input_ids": ids,
            "attention_mask": mask,
            "position_ids": pos,
            "input_pixel_values": pixels,
            "input_image_sizes": sizes,
        }


class OmniGenMultiModalProcessor:
    def __init__(self, text_tokenizer, max_image_size: int = 1024, token_divisor: int = 256):
        self.text_tokenizer = text_tokenizer
        self.max_image_size = max_image_size
        self.collator = OmniGenCollator(token_divisor=token_divisor)
        self.token_divisor = token_divisor

    def reset_max_image_size(self, max_image_size):
        self.max_image_size = max_image_size

    def process_image(self, image) -> np.ndarray:
        """PIL image or [H, W, 3] array → normalized CHW float array."""
        if hasattr(image, "convert"):
            image = np.asarray(image.convert("RGB"))
        image = np.asarray(image)
        if image.ndim == 3 and image.shape[0] == 3:  # already CHW
            image = image.transpose(1, 2, 0)
        image = crop_image_array(image, self.max_image_size)
        image = image.astype(np.float32)
        if image.max() > 1.5:
            image = image / 255.0
        image = (image - 0.5) / 0.5
        return image.transpose(2, 0, 1)

    def add_prefix_instruction(self, prompt: str) -> str:
        return (
            "<|user|>\nGenerate an image according to the following instructions\n"
            f"{prompt}<|end|>\n<|assistant|>\n<|diffusion|>"
        )

    def process_multi_modal_prompt(self, text: str, input_images):
        text = self.add_prefix_instruction(text)
        if input_images is None or len(input_images) == 0:
            model_inputs = self.text_tokenizer(text)
            return {"input_ids": model_inputs.input_ids, "pixel_values": None, "image_sizes": None}

        pattern = r"<\|image_\d+\|>"
        prompt_chunks = [self.text_tokenizer(chunk).input_ids for chunk in re.split(pattern, text)]
        for i in range(1, len(prompt_chunks)):
            if prompt_chunks[i] and prompt_chunks[i][0] == 1:
                prompt_chunks[i] = prompt_chunks[i][1:]
        image_tags = re.findall(pattern, text)
        image_ids = [int(s.split("|")[1].split("_")[-1]) for s in image_tags]
        input_images = [input_images[x - 1] for x in image_ids]

        all_input_ids, img_inx = [], []
        for i in range(len(prompt_chunks)):
            all_input_ids.extend(prompt_chunks[i])
            if i != len(prompt_chunks) - 1:
                start = len(all_input_ids)
                size = input_images[i].shape[-2] * input_images[i].shape[-1] // self.token_divisor
                img_inx.append([start, start + size])
                all_input_ids.extend([0] * size)
        return {"input_ids": all_input_ids, "pixel_values": input_images, "image_sizes": img_inx}

    def __call__(self, instructions, input_images=None, height=1024, width=1024,
                 negative_prompt="low quality, jpeg artifacts, ugly, blurry, bad anatomy",
                 use_img_cfg=True, use_input_image_size_as_output=False,
                 num_images_per_prompt=1) -> Dict:
        if isinstance(instructions, str):
            instructions = [instructions]
            input_images = [input_images]
        input_data = []
        for i, instruction in enumerate(instructions):
            cur_images = None if input_images is None else input_images[i]
            if cur_images:
                cur_images = [self.process_image(x) for x in cur_images]
            else:
                cur_images = None
            mllm = self.process_multi_modal_prompt(instruction, cur_images)
            neg = self.process_multi_modal_prompt(negative_prompt, None)
            img_cfg = None
            if use_img_cfg:
                if cur_images:
                    tags = " ".join(f"<img><|image_{j + 1}|></img>" for j in range(len(cur_images)))
                    img_cfg = self.process_multi_modal_prompt(tags, cur_images)
                else:
                    img_cfg = neg
            for _ in range(num_images_per_prompt):
                if use_input_image_size_as_output:
                    size = [mllm["pixel_values"][0].shape[-2], mllm["pixel_values"][0].shape[-1]]
                else:
                    size = [height, width]
                input_data.append((mllm, neg, img_cfg, size))
        return self.collator(input_data)
