"""Multicam (multiscale Blender) dataset tests with a generated fixture."""

import json
import os

import numpy as np
import pytest


def _write_multicam_fixture(root, n_views=4):
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    meta = {"train": {
        "file_path": [], "pix2cam": [], "cam2world": [],
        "width": [], "height": [], "lossmult": [], "near": [], "far": [],
    }}
    for i in range(n_views):
        scale = 2 ** (i % 2)  # two scales
        h = w = 32 // scale
        img = (rng.rand(h, w, 4) * 255).astype(np.uint8)
        fname = f"im_{i}.png"
        imageio.imwrite(str(root / fname), img)
        focal = 40.0 / scale
        cam2pix = np.array(
            [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]]
        )
        m = meta["train"]
        m["file_path"].append(fname)
        m["pix2cam"].append(np.linalg.inv(cam2pix).tolist())
        m["cam2world"].append(np.eye(4)[:3].tolist())
        m["width"].append(w)
        m["height"].append(h)
        m["lossmult"].append(float(scale**2))
        m["near"].append(2.0)
        m["far"].append(6.0)
    with open(root / "metadata.json", "w") as f:
        json.dump(meta, f)


def test_multicam_dataset_and_batcher(tmp_path):
    from consistentnerf_tpu.data.multicam import (
        MulticamBatcher,
        MulticamDataset,
    )

    _write_multicam_fixture(tmp_path)
    ds = MulticamDataset(str(tmp_path), "train")
    assert ds.n_examples == 4
    # Different views at different sizes, per-view lossmult on rays.
    assert ds.images[0].shape != ds.images[1].shape
    assert float(np.asarray(ds.rays.lossmult[1])[0, 0, 0]) == 4.0

    b = MulticamBatcher(ds, batch_size=64)
    batch = b.next_batch()
    assert batch["rays"].origins.shape == (64, 3)
    assert batch["rgb"].shape == (64, 3)
    # lossmult values come from the two scales only
    lm = np.unique(np.asarray(batch["rays"].lossmult))
    assert set(lm).issubset({1.0, 4.0})


def test_dtu_pixelnerf_split(tmp_path):
    from consistentnerf_tpu.data.dtu import (
        PIXELNERF_TRAIN_IDX,
        pixelnerf_test_idx,
    )

    test_idx = pixelnerf_test_idx()
    assert len(test_idx) == 49 - 9 - 15
    assert not set(test_idx) & set(PIXELNERF_TRAIN_IDX)
