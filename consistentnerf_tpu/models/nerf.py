"""The vanilla (ConsistentNeRF PyTorch-backbone) model as one jittable module.

Replaces the reference's `render -> batchify_rays -> render_rays ->
run_network -> batchify` Python-chunk pipeline (`run_nerf_view.py:140-551`)
with a single fused forward: PE + coarse MLP + compositing + hierarchical
resample + fine MLP + compositing, all static-shaped under jit. Chunking
happens only at the render-image boundary (`train/render.py`), not inside
the hot loop.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from consistentnerf_tpu.core import encoding, rendering, sampling
from consistentnerf_tpu.models.mlp import NeRFMLP


class VanillaNeRF(nn.Module):
    """Coarse/fine PE-MLP NeRF (semantics of run_nerf_view.py:441-551)."""

    num_samples: int = 64  # N_samples
    num_importance: int = 128  # N_importance
    multires: int = 10
    multires_views: int = 4
    use_viewdirs: bool = True
    white_bkgd: bool = False
    raw_noise_std: float = 0.0
    lindisp: bool = False
    perturb: bool = True  # stratified jitter when rng provided
    net_depth: int = 8
    net_width: int = 256
    remat: bool = False  # rematerialize MLP activations (for big batches)
    dtype: Any = jnp.float32

    def setup(self):
        # Optionally remat the MLPs: backward recomputes the 256-wide
        # activations instead of storing them per (ray, sample) point.
        # Costs ~10% step time; required for ray batches >= ~16k on a
        # 16 GB chip.
        mlp_cls = (
            nn.remat(NeRFMLP, prevent_cse=False) if self.remat else NeRFMLP
        )
        self.coarse = mlp_cls(
            net_depth=self.net_depth,
            net_width=self.net_width,
            use_viewdirs=self.use_viewdirs,
            output_ch=5 if self.num_importance > 0 else 4,
            dtype=self.dtype,
        )
        if self.num_importance > 0:
            self.fine = mlp_cls(
                net_depth=self.net_depth,
                net_width=self.net_width,
                use_viewdirs=self.use_viewdirs,
                output_ch=5,
                dtype=self.dtype,
            )

    def _eval_mlp(self, mlp, pts, viewdirs):
        """PE-encode and evaluate one MLP on [N, S, 3] points.

        Points are flattened to [N*S, C] first: on TPU, keeping the
        samples axis gives XLA 3-D batched matmuls whose small inner dims
        (3, 60) get lane-padded to 128 in temp layouts — flat 2-D matmuls
        tile cleanly onto the MXU. The eval is rematerialized
        (jax.checkpoint) so the backward pass recomputes activations
        instead of holding 8x256-wide tensors for every sample.
        """
        n, s = pts.shape[:2]
        pts_flat = pts.reshape(n * s, 3)
        views_flat = None
        if self.use_viewdirs:
            views_flat = jnp.broadcast_to(
                viewdirs[:, None, :], (n, s, 3)
            ).reshape(n * s, 3)

        # PE is computed in fp32 (phase accuracy at 2^9 scales needs the
        # mantissa) but stored/consumed at the compute dtype: the encoded
        # buffer is the largest activation and bf16 halves its HBM traffic.
        pts_embed = encoding.posenc_nerf(pts_flat, self.multires).astype(
            self.dtype
        )
        views_embed = None
        if views_flat is not None:
            views_embed = encoding.posenc_nerf(
                views_flat, self.multires_views
            ).astype(self.dtype)
        raw = mlp(pts_embed, views_embed)
        return raw.reshape(n, s, raw.shape[-1])

    def __call__(
        self,
        rng: Optional[jax.Array],
        rays,
        compute_extras: bool = False,
    ):
        """Render a batch of rays.

        rays: a `core.rays.Rays` (or any object with origins/directions/
        viewdirs/near/far leaves of shape [N, 3]/[N, 1]).
        rng None => deterministic (test-time) rendering.

        Returns a dict with fine outputs under 'rgb'/'disp'/'acc'/'depth' and
        coarse outputs under 'rgb0'/'disp0'/'acc0'/'depth0' (+ 'z_std').
        """
        origins = rays.origins
        directions = rays.directions
        viewdirs = rays.viewdirs if self.use_viewdirs else None
        near, far = rays.near, rays.far

        keys = {}
        if rng is not None:
            rng_names = ["coarse_strat", "coarse_noise", "pdf", "fine_noise"]
            splits = jax.random.split(rng, len(rng_names))
            keys = dict(zip(rng_names, splits))

        # --- coarse level ---------------------------------------------------
        t_rand = None
        if rng is not None and self.perturb:
            t_rand = jax.random.uniform(
                keys["coarse_strat"],
                list(origins.shape[:-1]) + [self.num_samples],
            )
        z_vals = sampling.vanilla_z_vals(
            near, far, self.num_samples, self.lindisp, t_rand
        )
        pts = (
            origins[..., None, :]
            + directions[..., None, :] * z_vals[..., :, None]
        )
        raw = self._eval_mlp(self.coarse, pts, viewdirs)

        noise = None
        if rng is not None and self.raw_noise_std > 0.0:
            noise = (
                jax.random.normal(keys["coarse_noise"], raw[..., 3].shape)
                * self.raw_noise_std
            )
        rgb_map, disp_map, acc_map, weights, depth_map = rendering.raw2outputs(
            raw, z_vals, directions, noise, self.white_bkgd
        )

        ret = {}
        if self.num_importance > 0:
            ret.update(
                rgb0=rgb_map, disp0=disp_map, acc0=acc_map, depth0=depth_map
            )

            # --- hierarchical fine level -----------------------------------
            z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = sampling.sample_pdf(
                z_vals_mid,
                weights[..., 1:-1],
                self.num_importance,
                rng=keys.get("pdf"),
                det=(rng is None or not self.perturb),
            )
            z_samples = jax.lax.stop_gradient(z_samples)

            z_vals_all = jnp.sort(
                jnp.concatenate([z_vals, z_samples], -1), -1
            )
            pts = (
                origins[..., None, :]
                + directions[..., None, :] * z_vals_all[..., :, None]
            )
            raw = self._eval_mlp(self.fine, pts, viewdirs)
            noise = None
            if rng is not None and self.raw_noise_std > 0.0:
                noise = (
                    jax.random.normal(keys["fine_noise"], raw[..., 3].shape)
                    * self.raw_noise_std
                )
            rgb_map, disp_map, acc_map, weights, depth_map = (
                rendering.raw2outputs(
                    raw, z_vals_all, directions, noise, self.white_bkgd
                )
            )
            ret["z_std"] = jnp.std(z_samples, axis=-1)

        ret.update(rgb=rgb_map, disp=disp_map, acc=acc_map, depth=depth_map)
        if compute_extras:
            ret["weights"] = weights
            ret["raw"] = raw
        return ret
