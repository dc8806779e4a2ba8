"""Implementation-equality of train/lpips.py vs the reference's torch
LPIPS-VGG network, on shared random weights.

The reference computes LPIPS with the `lpips` PyTorch package
(`run_nerf_view.py:40`, `RegNeRF/eval.py:22,89`): a scaling layer, the
VGG16 conv trunk tapped at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3,
channel-unit-normalization (eps added to the norm), squared diffs,
non-negative 1x1 linear heads, spatial averaging, summed over taps.
That package isn't installed here, so this test transcribes its forward
in torch (same formulas, same layer layout) and checks our JAX function
computes identical distances given identical weights — proving a future
calibrated-weight export is drop-in (VERDICT r2 item 6).
"""

import jax
import numpy as np
import torch
import torch.nn.functional as F

from consistentnerf_tpu.train import lpips as lpips_mod


def _torch_lpips(params, img0, img1):
    """The lpips.LPIPS(net='vgg') forward, transcribed.

    params: the JAX pytree from lpips_mod.init_params / load_weights.
    img0/img1: [N, H, W, 3] numpy in [-1, 1].
    """
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def features(img):
        # NHWC -> NCHW, scaling layer, VGG16 trunk with taps per block.
        x = torch.from_numpy(np.asarray(img, np.float32)).permute(0, 3, 1, 2)
        x = (x - shift) / scale
        feats = []
        n_blocks = len(params["convs"])
        for bi, block in enumerate(params["convs"]):
            for conv in block:
                w = torch.from_numpy(
                    np.asarray(conv["w"], np.float32)
                ).permute(3, 2, 0, 1)  # HWIO -> OIHW
                b = torch.from_numpy(np.asarray(conv["b"], np.float32))
                x = F.relu(F.conv2d(x, w, b, stride=1, padding=1))
            feats.append(x)
            if bi < n_blocks - 1:
                x = F.max_pool2d(x, kernel_size=2, stride=2)
        return feats

    f0s, f1s = features(img0), features(img1)
    val = 0.0
    for f0, f1, lin in zip(f0s, f1s, params["lins"]):
        eps = 1e-10
        n0 = f0 / (torch.sqrt(torch.sum(f0**2, 1, keepdim=True)) + eps)
        n1 = f1 / (torch.sqrt(torch.sum(f1**2, 1, keepdim=True)) + eps)
        diff2 = (n0 - n1) ** 2
        lin_w = torch.from_numpy(np.asarray(lin, np.float32)).view(
            1, -1, 1, 1
        )
        # 1x1 conv head + spatial average (lpips.spatial_average).
        val = val + torch.sum(diff2 * lin_w, 1).mean(dim=(1, 2))
    return val.numpy()


def test_lpips_matches_torch_reference_network():
    params = lpips_mod.init_params(jax.random.PRNGKey(7))
    rng = np.random.RandomState(0)
    img0 = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    img1 = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1

    got = np.asarray(lpips_mod.lpips(params, img0, img1))
    want = _torch_lpips(params, img0, img1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_lpips_zero_for_identical_images():
    params = lpips_mod.init_params(jax.random.PRNGKey(7))
    img = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
    d = np.asarray(lpips_mod.lpips(params, img, img))
    np.testing.assert_allclose(d, 0.0, atol=1e-7)


def test_lpips_roundtrips_through_export_format(tmp_path):
    """load_weights(save(params)) computes the same distance — the .npz
    interchange with cli/export_lpips_weights.py is lossless."""
    params = lpips_mod.init_params(jax.random.PRNGKey(7))
    arrs = {}
    for bi, block in enumerate(params["convs"]):
        for ci, conv in enumerate(block):
            arrs[f"conv{bi}_{ci}_w"] = np.asarray(conv["w"])
            arrs[f"conv{bi}_{ci}_b"] = np.asarray(conv["b"])
    for bi, lin in enumerate(params["lins"]):
        arrs[f"lin{bi}"] = np.asarray(lin)
    path = tmp_path / "lpips.npz"
    np.savez(path, **arrs)

    loaded = lpips_mod.load_weights(str(path))
    rng = np.random.RandomState(2)
    img0 = rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    img1 = rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    np.testing.assert_array_equal(
        np.asarray(lpips_mod.lpips(params, img0, img1)),
        np.asarray(lpips_mod.lpips(loaded, img0, img1)),
    )
