"""Sample spacing curves and stratified sampling.

`genspace` generalizes linspace/geomspace/lindisp like
`RegNeRF/internal/spacing.py:21-53`, but with explicit (fn, inv_fn) pairs
instead of `oryx.core.inverse` (oryx is not a dependency here and function
inversion is overkill for three fixed curves).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax.numpy as jnp

# Named curves: name -> (fn, inv_fn).
_CURVES: dict = {
    "linear": (lambda x: x, lambda x: x),
    "log": (jnp.log, jnp.exp),
    "reciprocal": (jnp.reciprocal, jnp.reciprocal),
    "sqrt": (jnp.sqrt, jnp.square),
}

CurveSpec = Union[None, str, Tuple[Callable, Callable]]


def resolve_curve(fn: CurveSpec) -> Tuple[Callable, Callable]:
    """Resolve a curve spec into an explicit (fn, inv_fn) pair."""
    if fn is None:
        return _CURVES["linear"]
    if isinstance(fn, str):
        if fn not in _CURVES:
            raise ValueError(f"Unknown spacing curve {fn!r}; have {list(_CURVES)}")
        return _CURVES[fn]
    if callable(fn):
        # Accept the raw jnp function handles for drop-in compat.
        for f, inv in _CURVES.values():
            if fn is f:
                return f, inv
        raise ValueError(
            "Callable curves must be passed as an explicit (fn, inv_fn) tuple."
        )
    fwd, inv = fn
    return fwd, inv


def genspace(start, stop, num: int, fn: CurveSpec = None) -> jnp.ndarray:
    """linspace/geomspace/lindisp generalization (spacing.py:21).

    fn='linear' == linspace, fn='log' == geomspace, fn='reciprocal' == NeRF's
    lindisp. Broadcasts over leading dims of start/stop; samples live on the
    last axis.
    """
    fwd, inv = resolve_curve(fn)
    t = jnp.linspace(0.0, 1.0, num)
    s = fwd(start) * (1.0 - t) + fwd(stop) * t
    return jnp.clip(inv(s), jnp.minimum(start, stop), jnp.maximum(start, stop))


def stratify(t_vals: jnp.ndarray, t_rand: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Jitter samples within their mid-point intervals.

    Matches the stratified-sampling construction shared by
    `run_nerf_view.py:498-512` and `mip.py:335-342`: lower/upper fenceposts are
    the midpoints (clamped at the ends), and t_rand in [0,1) picks a point in
    each interval. If t_rand is None, return t_vals unchanged.
    """
    if t_rand is None:
        return t_vals
    mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
    upper = jnp.concatenate([mids, t_vals[..., -1:]], -1)
    lower = jnp.concatenate([t_vals[..., :1], mids], -1)
    return lower + (upper - lower) * t_rand
