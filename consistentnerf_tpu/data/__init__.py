"""Data layer: loaders, view-split registry, synthetic scenes, pipeline."""
