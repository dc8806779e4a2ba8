"""ConsistentNeRF-TPU: a TPU-native (JAX/XLA/Pallas) sparse-view NeRF framework.

A from-scratch rebuild of the capabilities of skhu101/ConsistentNeRF
(arXiv 2305.11031) designed for TPU hardware:

* one fused, jittable rendering core shared by the vanilla-NeRF and
  mip-NeRF backbones (the reference keeps two separate trees,
  ``nerf-pytorch-master/`` and ``RegNeRF/``),
* multi-view/single-view consistency priors (hard-mask reprojection,
  monocular-depth patch loss) computed on-device,
* SPMD data parallelism over a ``jax.sharding.Mesh`` instead of Python
  chunk loops and pmap,
* Pallas kernels for the hot MLP-evaluation path.
"""

__version__ = "0.1.0"
