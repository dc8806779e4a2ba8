"""Export lpips-vgg weights to the .npz format train.lpips loads.

Run on any machine with the `lpips` pip package + internet (this build
environment has neither):

    python -m consistentnerf_tpu.cli.export_lpips_weights out.npz

then point `Config.lpips_weights_path` at the .npz.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out", help="output .npz path")
    args = p.parse_args(argv)

    import lpips as lpips_pkg  # requires the pip package + downloads
    import torch

    net = lpips_pkg.LPIPS(net="vgg")
    slices = net.net  # vgg16 wrapper with slice1..slice5
    lins = net.lins

    out = {}
    block_convs = [[], [], [], [], []]
    bi = 0
    for name in ["slice1", "slice2", "slice3", "slice4", "slice5"]:
        sl = getattr(slices, name)
        for layer in sl:
            if isinstance(layer, torch.nn.Conv2d):
                block_convs[bi].append(layer)
        bi += 1
    for bi, convs in enumerate(block_convs):
        for ci, conv in enumerate(convs):
            # torch OIHW -> HWIO
            out[f"conv{bi}_{ci}_w"] = (
                conv.weight.detach().numpy().transpose(2, 3, 1, 0)
            )
            out[f"conv{bi}_{ci}_b"] = conv.bias.detach().numpy()
        out[f"lin{bi}"] = (
            lins[bi].model[-1].weight.detach().numpy().reshape(-1)
        )
    np.savez(args.out, **out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
