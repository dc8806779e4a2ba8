"""Command-line entry points (train/eval/render/make-masks/metrics/video)."""
