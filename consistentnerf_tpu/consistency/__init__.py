"""Consistency priors: multi-view hard masks and single-view depth losses."""

from consistentnerf_tpu.consistency import masks, monodepth, reproject

__all__ = ["masks", "monodepth", "reproject"]
