"""Fixture tests for the legacy DeepVoxels / LINEMOD loaders."""

import json

import numpy as np
import pytest


def _write_deepvoxels_fixture(root, shape="greek", n=4, side=32):
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    base = root / shape
    for split, dirname in [("train", "train"), ("val", "validation"),
                           ("test", "test")]:
        d = base / dirname
        (d / "rgb").mkdir(parents=True)
        (d / "pose").mkdir(parents=True)
        # intrinsics: f cx cy / barycenter / near / scale / h w
        (d / "intrinsics.txt").write_text(
            "50.0 16.0 16.0 0\n0 0 0\n0.5\n1.0\n32 32\n"
        )
        for i in range(n):
            img = (rng.rand(side, side, 3) * 255).astype(np.uint8)
            imageio.imwrite(str(d / "rgb" / f"{i:04d}.png"), img)
            pose = np.eye(4)
            pose[:3, 3] = rng.randn(3) * 0.2 + np.array([0, 0, 2.5])
            (d / "pose" / f"{i:04d}.txt").write_text(
                " ".join(str(x) for x in pose.reshape(-1))
            )
    return root


def test_deepvoxels_loader(tmp_path):
    from consistentnerf_tpu.data.loaders import load_deepvoxels

    _write_deepvoxels_fixture(tmp_path)
    scene = load_deepvoxels(str(tmp_path), "greek", testskip=1)
    assert scene.images.shape[0] == 12  # 3 splits x 4
    assert scene.images.shape[-1] == 3
    assert scene.poses.shape == (12, 3, 4)
    # near/far from hemisphere radius (load via mean pose norm)
    assert scene.far > scene.near > 0
    assert len(scene.i_train) == 4


def _write_linemod_fixture(root, n=3, side=24):
    import imageio.v2 as imageio

    rng = np.random.RandomState(1)
    K = [[60.0, 0, 12.0], [0, 60.0, 12.0], [0, 0, 1.0]]
    for split in ["train", "val", "test"]:
        frames = []
        (root / split).mkdir(exist_ok=True)
        for i in range(n):
            img = (rng.rand(side, side, 3) * 255).astype(np.uint8)
            fname = f"{split}/im_{i}.png"
            imageio.imwrite(str(root / fname), img)
            pose = np.eye(4)
            pose[:3, 3] = rng.randn(3) * 0.1
            frames.append(
                {
                    "file_path": fname,
                    "transform_matrix": pose.tolist(),
                    "intrinsic_matrix": K,
                }
            )
        meta = {"frames": frames, "near": 0.3, "far": 1.5}
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    return root


def test_linemod_loader(tmp_path):
    from consistentnerf_tpu.data.loaders import load_linemod

    _write_linemod_fixture(tmp_path)
    scene = load_linemod(str(tmp_path), testskip=1)
    assert scene.images.shape == (9, 24, 24, 3)
    assert scene.K[0, 0] == pytest.approx(60.0)
    assert scene.near == pytest.approx(0.3)
    assert scene.far == pytest.approx(1.5)


def test_linemod_loader_half_res(tmp_path):
    from consistentnerf_tpu.data.loaders import load_linemod

    _write_linemod_fixture(tmp_path)
    scene = load_linemod(str(tmp_path), half_res=True, testskip=1)
    assert scene.H == 12 and scene.W == 12
    assert scene.K[0, 0] == pytest.approx(30.0)
