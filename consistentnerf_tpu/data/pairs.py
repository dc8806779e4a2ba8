"""The sparse-view split registry ('pairs').

The reference distributes `pairs.th` (a torch pickle mapping
'{scene}_{train,val,test}' to view-index arrays) replicated across five
config dirs, loaded at `run_nerf_view.py:862-864,935-938` and
`load_blender.py:167-169`, plus a `pairs.npy` for RegNeRF. Here the same
splits ship as a plain .npz asset (converted from the reference registry);
external pairs.th/pairs.npy files load too.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "pairs.npz")
_cache: Optional[Dict[str, np.ndarray]] = None


def load_pairs(path: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Load the split registry (bundled asset by default)."""
    global _cache
    if path is None:
        if _cache is None:
            _cache = {k: v for k, v in np.load(_ASSET).items()}
        return _cache
    if path.endswith(".th"):
        import torch

        d = torch.load(path, weights_only=False)
        return {
            k: np.asarray(
                v.numpy() if hasattr(v, "numpy") else [int(x) for x in v],
                dtype=np.int64,
            )
            for k, v in d.items()
        }
    if path.endswith(".npy") or path.endswith(".npz"):
        d = np.load(path, allow_pickle=True)
        if hasattr(d, "item") and d.dtype == object:
            d = d.item()
        return {k: np.asarray(v, np.int64) for k, v in dict(d).items()}
    raise ValueError(f"Unknown pairs registry format: {path}")


def get_split(scene: str, split: str, n_views: Optional[int] = None,
              path: Optional[str] = None) -> np.ndarray:
    """View indices for `{scene}_{split}`, truncated to n_views for train."""
    pairs = load_pairs(path)
    key = f"{scene}_{split}"
    if key not in pairs:
        raise KeyError(
            f"No split {key!r} in pairs registry (have e.g. "
            f"{sorted(pairs)[:6]}...)"
        )
    idx = pairs[key]
    if n_views is not None and split == "train":
        idx = idx[:n_views]
    return np.asarray(idx, np.int64)
