"""Pure-function rendering core: rays, spacing, encodings, sampling, compositing."""

from consistentnerf_tpu.core import encoding, mathx, mip, rays, rendering, sampling, spacing

__all__ = ["encoding", "mathx", "mip", "rays", "rendering", "sampling", "spacing"]
