"""Aligned (v2) fused kernels vs the XLA oracle (interpret mode)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from consistentnerf_tpu.models.mlp import NeRFMLP
from consistentnerf_tpu.ops import fused_mlp as fm
from consistentnerf_tpu.ops import fused_mlp_v2 as v2


def _setup(net_depth=4, width=32, skips=(2,), multires=4, mv=2, n=96,
           seed=0):
    mlp = NeRFMLP(net_depth=net_depth, net_width=width, skips=skips)
    pe_dim = 3 * (1 + 2 * multires)
    ve_dim = 3 * (1 + 2 * mv)
    params = mlp.init(
        jax.random.PRNGKey(seed), jnp.zeros((2, pe_dim)),
        jnp.zeros((2, ve_dim))
    )
    weights = [jnp.asarray(w) for w in
               fm.flatten_params(params, True, net_depth)]
    weights = tuple(w[None, :] if w.ndim == 1 else w for w in weights)
    pts = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3))
    views = jax.random.normal(jax.random.PRNGKey(seed + 2), (n, 3))
    return weights, pts, views, dict(
        net_depth=net_depth, skips=skips, multires=multires,
        multires_views=mv,
    )


def _oracle(weights, pts, views, cfg):
    flat = [w[0] if (w.ndim == 2 and w.shape[0] == 1) else w
            for w in weights]
    return fm._mlp_body(
        pts, views, flat, net_depth=cfg["net_depth"],
        skips=tuple(cfg["skips"]), multires=cfg["multires"],
        multires_views=cfg["multires_views"], use_viewdirs=True,
    )


def test_v2_forward_matches_oracle():
    weights, pts, views, cfg = _setup()
    expected = _oracle(weights, pts, views, cfg)
    got = v2.fused_mlp_v2_train(
        weights, pts, views, cfg["net_depth"], tuple(cfg["skips"]),
        cfg["multires"], cfg["multires_views"], 32, True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-4, rtol=2e-4)


def test_v2_forward_depth8_prod_arch():
    weights, pts, views, cfg = _setup(net_depth=8, skips=(4,), multires=10,
                                      mv=4, n=64)
    expected = _oracle(weights, pts, views, cfg)
    got = v2.fused_mlp_v2_train(
        weights, pts, views, cfg["net_depth"], tuple(cfg["skips"]),
        cfg["multires"], cfg["multires_views"], 32, True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=5e-4, rtol=5e-4)


def test_v2_gradients_match_jax_grad():
    weights, pts, views, cfg = _setup()

    def loss_v2(ws):
        out = v2.fused_mlp_v2_train(
            ws, pts, views, cfg["net_depth"], tuple(cfg["skips"]),
            cfg["multires"], cfg["multires_views"], 32, True,
        )
        return jnp.sum(jnp.sin(out))

    def loss_oracle(ws):
        return jnp.sum(jnp.sin(_oracle(ws, pts, views, cfg)))

    g_v2 = jax.grad(loss_v2)(weights)
    g_or = jax.grad(loss_oracle)(weights)
    assert len(g_v2) == len(g_or)
    for i, (a, b) in enumerate(zip(g_v2, g_or)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3,
            err_msg=f"weight {i}",
        )


def test_v2_gradients_depth8():
    weights, pts, views, cfg = _setup(net_depth=8, skips=(4,), multires=10,
                                      mv=4, n=64)

    def loss_v2(ws):
        out = v2.fused_mlp_v2_train(
            ws, pts, views, cfg["net_depth"], tuple(cfg["skips"]),
            cfg["multires"], cfg["multires_views"], 32, True,
        )
        return jnp.mean(out**2)

    def loss_oracle(ws):
        return jnp.mean(_oracle(ws, pts, views, cfg) ** 2)

    g_v2 = jax.grad(loss_v2)(weights)
    g_or = jax.grad(loss_oracle)(weights)
    for i, (a, b) in enumerate(zip(g_v2, g_or)):
        denom = np.abs(np.asarray(b)).max() + 1e-8
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / denom
        assert err < 5e-3, f"weight {i}: rel err {err}"


def test_v2_bf16_close_to_fp32():
    weights, pts, views, cfg = _setup(net_depth=8, skips=(4,))

    def run(cd):
        return v2.fused_mlp_v2_train(
            weights, pts, views, cfg["net_depth"], tuple(cfg["skips"]),
            cfg["multires"], cfg["multires_views"], 32, True, cd,
        )

    o32 = np.asarray(run(jnp.float32))
    o16 = np.asarray(run(jnp.bfloat16))
    scale = np.abs(o32).mean() + 1e-3
    assert np.abs(o16 - o32).max() / scale < 0.15


def test_v2h_hybrid_forward_and_grads():
    """hybrid_mlp_v2_train: XLA forward == oracle exactly; aligned Pallas
    backward == jax.grad of the oracle."""
    weights, pts, views, cfg = _setup()

    out = v2.hybrid_mlp_v2_train(
        weights, pts, views, cfg["net_depth"], tuple(cfg["skips"]),
        cfg["multires"], cfg["multires_views"], 32, True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_oracle(weights, pts, views, cfg)),
        atol=1e-6, rtol=1e-6,
    )

    def loss_h(ws):
        o = v2.hybrid_mlp_v2_train(
            ws, pts, views, cfg["net_depth"], tuple(cfg["skips"]),
            cfg["multires"], cfg["multires_views"], 32, True,
        )
        return jnp.sum(jnp.sin(o))

    def loss_oracle(ws):
        return jnp.sum(jnp.sin(_oracle(ws, pts, views, cfg)))

    g_h = jax.grad(loss_h)(weights)
    g_or = jax.grad(loss_oracle)(weights)
    for i, (a, b) in enumerate(zip(g_h, g_or)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3,
            err_msg=f"weight {i}",
        )


def test_v2_forward_only_entry():
    """fused_mlp_v2 (param-tree entry) == oracle."""
    mlp = NeRFMLP(net_depth=4, net_width=32, skips=(2,))
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((2, 27)),
                      jnp.zeros((2, 15)))
    pts = jax.random.normal(jax.random.PRNGKey(1), (70, 3))
    views = jax.random.normal(jax.random.PRNGKey(2), (70, 3))
    expected = fm.reference_mlp_apply(
        params, pts, views, net_depth=4, skips=(2,), multires=4,
        multires_views=2,
    )
    got = v2.fused_mlp_v2(
        params, pts, views, net_depth=4, skips=(2,), multires=4,
        multires_views=2, tile=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-4, rtol=2e-4)


def test_v2_transposed_forward_and_grads():
    """fused_mlp_v2_train_T ([3,N]/[4,N] streams) == oracle + jax.grad."""
    weights, pts, views, cfg = _setup()

    got = v2.fused_mlp_v2_train_T(
        weights, pts.T, views.T, cfg["net_depth"], tuple(cfg["skips"]),
        cfg["multires"], cfg["multires_views"], 32, True,
    )
    expected = _oracle(weights, pts, views, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected).T,
                               atol=2e-4, rtol=2e-4)

    def loss_t(ws):
        out = v2.fused_mlp_v2_train_T(
            ws, pts.T, views.T, cfg["net_depth"], tuple(cfg["skips"]),
            cfg["multires"], cfg["multires_views"], 32, True,
        )
        return jnp.sum(jnp.sin(out))

    def loss_oracle(ws):
        return jnp.sum(jnp.sin(_oracle(ws, pts, views, cfg)))

    g_t = jax.grad(loss_t)(weights)
    g_or = jax.grad(loss_oracle)(weights)
    for i, (a, b) in enumerate(zip(g_t, g_or)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3,
            err_msg=f"weight {i}",
        )
