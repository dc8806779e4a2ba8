"""Multicam (mip-NeRF multiscale Blender) dataset.

Semantics of `RegNeRF/internal/datasets.py:Multicam` (:932-1026): a
metadata.json with per-image pix2cam/cam2world/width/height/lossmult/
near/far; images at multiple scales; rays carry per-image lossmult so the
multiscale loss downweights the coarse copies.

Because image sizes differ per view, batches are drawn from a flattened
global ray pool (the reference's `all_images` batching).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from consistentnerf_tpu.core.rays import Rays


class MulticamDataset:
    def __init__(self, data_dir: str, split: str = "train",
                 white_background: bool = True):
        with open(os.path.join(data_dir, "metadata.json")) as fp:
            meta = json.load(fp)[split]
        self.meta = {k: np.array(meta[k]) for k in meta}

        from PIL import Image

        images = []
        for fbase in self.meta["file_path"]:
            with open(os.path.join(data_dir, str(fbase)), "rb") as f:
                image = np.array(Image.open(f), dtype=np.float32) / 255.0
            if white_background and image.shape[-1] == 4:
                image = image[..., :3] * image[..., -1:] + (
                    1.0 - image[..., -1:]
                )
            images.append(image[..., :3])
        self.images = images
        self.n_examples = len(images)
        self._generate_rays()

    def _generate_rays(self):
        pix2cam = self.meta["pix2cam"]
        cam2world = self.meta["cam2world"]
        width = self.meta["width"]
        height = self.meta["height"]

        def res2grid(w, h):
            return np.meshgrid(
                np.arange(w, dtype=np.float32) + 0.5,
                np.arange(h, dtype=np.float32) + 0.5,
                indexing="xy",
            )

        xy = [res2grid(w, h) for w, h in zip(width, height)]
        pixel_dirs = [
            np.stack([x, y, np.ones_like(x)], axis=-1) for x, y in xy
        ]
        camera_dirs = [
            v @ p2c[:3, :3].T for v, p2c in zip(pixel_dirs, pix2cam)
        ]
        directions = [
            v @ c2w[:3, :3].T for v, c2w in zip(camera_dirs, cam2world)
        ]
        origins = [
            np.broadcast_to(c2w[:3, -1], v.shape)
            for v, c2w in zip(directions, cam2world)
        ]
        viewdirs = [
            v / np.linalg.norm(v, axis=-1, keepdims=True) for v in directions
        ]

        def bsa(x):
            return [
                np.broadcast_to(x[i], origins[i][..., :1].shape)
                for i in range(self.n_examples)
            ]

        lossmult = bsa(self.meta["lossmult"])
        near = bsa(self.meta["near"])
        far = bsa(self.meta["far"])

        dx = [
            np.sqrt(np.sum((v[:-1, :, :] - v[1:, :, :]) ** 2, -1))
            for v in directions
        ]
        dx = [np.concatenate([v, v[-2:-1, :]], axis=0) for v in dx]
        radii = [v[..., None] * 2 / np.sqrt(12) for v in dx]

        self.rays = Rays(
            origins=origins,
            directions=directions,
            viewdirs=viewdirs,
            radii=radii,
            lossmult=lossmult,
            near=near,
            far=far,
        )

    def flat_pool(self) -> Dict[str, np.ndarray]:
        """Flattened global ray pool for all_images batching."""

        def flat(xs, dim):
            return np.concatenate(
                [np.asarray(y).reshape(-1, dim) for y in xs], 0
            ).astype(np.float32)

        return {
            "rgb": flat(self.images, 3),
            "rays": Rays(
                origins=flat(self.rays.origins, 3),
                directions=flat(self.rays.directions, 3),
                viewdirs=flat(self.rays.viewdirs, 3),
                radii=flat(self.rays.radii, 1),
                lossmult=flat(self.rays.lossmult, 1),
                near=flat(self.rays.near, 1),
                far=flat(self.rays.far, 1),
            ),
        }


class MulticamBatcher:
    """all_images ray batches over the multiscale pool."""

    def __init__(self, dataset: MulticamDataset, batch_size: int,
                 seed: int = 0):
        self.pool = dataset.flat_pool()
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)
        self.n = self.pool["rgb"].shape[0]

    def next_batch(self):
        import jax

        idx = self.rng.randint(0, self.n, size=self.batch_size)
        rays = jax.tree_util.tree_map(lambda x: x[idx], self.pool["rays"])
        return {
            "rays": rays,
            "rgb": self.pool["rgb"][idx],
            "dpts": np.zeros(self.batch_size, np.float32),
            "masks": np.ones(self.batch_size, np.float32),
            "mono_dpts": np.zeros(self.batch_size, np.float32),
            "bounds": np.array(
                [float(rays.near.min()), float(rays.far.max())], np.float32
            ),
        }

    def __iter__(self):
        return self

    def __next__(self):
        return self.next_batch()
