"""VisualCloze grid preprocessing.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/visualcloze/visualcloze_utils.py:22`
VisualClozeProcessor): each task sample is a grid of rows (in-context
examples + a final query row whose missing targets become black images),
every image aspect-preserving-resized toward `resolution`² and snapped to
/16, masks mark target positions in the query row. All host-side
numpy/PIL.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np
from PIL import Image

from ...image_processor import VaeImageProcessor


class VisualClozeProcessor(VaeImageProcessor):
    def __init__(self, *args, resolution: int = 384, **kwargs):
        super().__init__(*args, **kwargs)
        self.resolution = resolution

    def preprocess_image(self, input_images, vae_scale_factor: int):
        n_samples, n_task_images = len(input_images), len(input_images[0])
        divisible = 2 * vae_scale_factor
        processed_images: List[List] = [[] for _ in range(n_samples)]
        resize_size: List[Optional[Tuple[int, int]]] = [None for _ in range(n_samples)]
        target_position: List[int] = []

        for i in range(n_samples):
            # size from the first non-None image of the row (reference `:79-88`)
            for j in range(n_task_images):
                if input_images[i][j] is not None:
                    aspect_ratio = input_images[i][j].width / input_images[i][j].height
                    target_area = self.resolution * self.resolution
                    new_h = int((target_area / aspect_ratio) ** 0.5)
                    new_w = int(new_h * aspect_ratio)
                    new_w = max(new_w // divisible, 1) * divisible
                    new_h = max(new_h // divisible, 1) * divisible
                    resize_size[i] = (new_w, new_h)
                    break
            for j in range(n_task_images):
                if input_images[i][j] is not None:
                    target = self._resize_and_crop(input_images[i][j], resize_size[i][0], resize_size[i][1])
                    processed_images[i].append(target)
                    if i == n_samples - 1:
                        target_position.append(0)
                else:
                    blank = Image.new("RGB", resize_size[i] or (self.resolution, self.resolution), (0, 0, 0))
                    processed_images[i].append(blank)
                    if i == n_samples - 1:
                        target_position.append(1)

        # multiple target images: snap all to a consistent width (reference `:104`)
        if len(target_position) > 1 and sum(target_position) > 1:
            new_w = resize_size[n_samples - 1][0] or 384
            for i in range(len(processed_images)):
                for j in range(len(processed_images[i])):
                    if processed_images[i][j] is not None:
                        new_h = int(processed_images[i][j].height * (new_w / processed_images[i][j].width))
                        new_w = int(new_w / 16) * 16
                        new_h = int(new_h / 16) * 16
                        processed_images[i][j] = self._resize_and_crop(processed_images[i][j], new_h, new_w)

        image_sizes = []
        for i in range(len(processed_images)):
            image_sizes.append([[img.height, img.width] for img in processed_images[i]])
            for j, image in enumerate(processed_images[i]):
                arr = np.asarray(image, dtype=np.float32)[None] / 255.0  # [1,H,W,3]
                arr = np.transpose(arr, (0, 3, 1, 2))
                processed_images[i][j] = self.normalize(arr)

        return processed_images, image_sizes, target_position

    def preprocess_mask(self, input_images, target_position):
        mask = []
        for i, row in enumerate(input_images):
            if i == len(input_images) - 1:  # query row
                row_masks = [
                    np.full((1, 1, row[0].shape[2], row[0].shape[3]), float(m), np.float32)
                    for m in target_position
                ]
            else:
                row_masks = [
                    np.zeros((1, 1, row[0].shape[2], row[0].shape[3]), np.float32)
                    for _ in target_position
                ]
            mask.append(row_masks)
        return mask

    def preprocess_image_upsampling(self, input_images, height: int, width: int):
        image = self.resize(input_images[0][0], height, width)
        arr = np.asarray(image, dtype=np.float32)[None] / 255.0
        arr = np.transpose(arr, (0, 3, 1, 2))
        input_images[0][0] = self.normalize(arr)
        return input_images, [[[height, width]]]

    def preprocess_mask_upsampling(self, input_images):
        return [[np.ones((1, 1, input_images[0][0].shape[2], input_images[0][0].shape[3]), np.float32)]]

    def get_layout_prompt(self, size: Tuple[int, int]):
        # the reference returns a 1-tuple here (`:186` trailing comma) and
        # formats it into the prompt verbatim — mirror the exact string
        return (
            f"A grid layout with {size[0]} rows and {size[1]} columns, "
            f"displaying {size[0] * size[1]} images arranged side by side.",
        )

    def preprocess(self, task_prompt, content_prompt, input_images=None, height=None,
                   width=None, upsampling: bool = False, vae_scale_factor: int = 16) -> dict:
        if isinstance(task_prompt, str):
            task_prompt = [task_prompt]
            content_prompt = [content_prompt]
            input_images = [input_images]

        output = {
            "init_image": [], "mask": [],
            "task_prompt": task_prompt if not upsampling else [None] * len(task_prompt),
            "content_prompt": content_prompt,
            "layout_prompt": [], "target_position": [], "image_size": [],
        }
        for i in range(len(task_prompt)):
            layout_prompt = None if upsampling else self.get_layout_prompt(
                (len(input_images[i]), len(input_images[i][0])))
            if upsampling:
                imgs, sizes = self.preprocess_image_upsampling(input_images[i], height=height, width=width)
                masks = self.preprocess_mask_upsampling(imgs)
            else:
                imgs, sizes, tpos = self.preprocess_image(input_images[i], vae_scale_factor=vae_scale_factor)
                masks = self.preprocess_mask(imgs, tpos)
                output["target_position"].append(tpos)
            output["image_size"].append(sizes)
            output["init_image"].append(imgs)
            output["mask"].append(masks)
            output["layout_prompt"].append(layout_prompt)
        return output
