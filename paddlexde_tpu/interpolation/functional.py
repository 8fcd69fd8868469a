"""Stateless 2-point interpolation formulas.

Parity with ``paddlexde/interpolation/functional/interp_fn.py:4-20``
(DrownFish19/PaddleXDE): the forms solvers use for per-step dense output.
``t`` is a scalar (or size-1) time; states are pytrees, returned with the same
structure/shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["linear_interp", "cubic_hermite_interp", "fill_forward"]


def _scalar(t):
    return jnp.reshape(jnp.asarray(t), ())


def linear_interp(t0, t1, y0, y1, t):
    """Linear between (t0, y0) and (t1, y1), evaluated at scalar t."""
    t0, t1, t = _scalar(t0), _scalar(t1), _scalar(t)
    denom = jnp.where(t1 == t0, jnp.ones_like(t0), t1 - t0)
    w = jnp.where(t1 == t0, jnp.zeros_like(t0), (t - t0) / denom)
    return jax.tree.map(lambda a, b: a + w.astype(a.dtype) * (b - a), y0, y1)


def cubic_hermite_interp(t0, y0, dy0, t1, y1, dy1, t):
    """Cubic Hermite between endpoints with derivatives, at scalar t."""
    t0, t1, t = _scalar(t0), _scalar(t1), _scalar(t)
    h = jnp.where(t1 == t0, jnp.ones_like(t0), t1 - t0)
    x = jnp.where(t1 == t0, jnp.zeros_like(t0), (t - t0) / h)
    h00 = (1 + 2 * x) * (1 - x) ** 2
    h10 = x * (1 - x) ** 2
    h01 = x**2 * (3 - 2 * x)
    h11 = x**2 * (x - 1)

    def leaf(a, da, b, db):
        a = jnp.asarray(a)
        c = lambda v: v.astype(a.dtype)
        return c(h00) * a + c(h10 * h) * da + c(h01) * b + c(h11 * h) * db

    return jax.tree.map(leaf, y0, dy0, y1, dy1)


def fill_forward(series, mask=None):
    """Missing-data preprocessing for CDE control paths (torchcde-style).

    Replaces NaN observations (or entries where ``mask`` is False) with the
    last observed value along the time axis (axis -2); leading missing values
    take the first observation. Append an observation-mask channel to let the
    CDE see observation times:

        filled = fill_forward(x)
        control = jnp.concatenate([filled, (~jnp.isnan(x[..., :1])).astype(filled.dtype)], -1)
    """
    series = jnp.asarray(series)
    observed = ~jnp.isnan(series) if mask is None else jnp.broadcast_to(mask, series.shape)
    t_axis = series.ndim - 2

    def scan_fn(carry, xo):
        x, obs = xo
        filled = jnp.where(obs, x, carry)
        return filled, filled

    x_t = jnp.moveaxis(series, t_axis, 0)
    o_t = jnp.moveaxis(observed, t_axis, 0)
    # backfill the leading gap with the first observation per channel
    first_obs_idx = jnp.argmax(o_t, axis=0)
    first_val = jnp.take_along_axis(x_t, first_obs_idx[None], axis=0)[0]
    init = jnp.where(o_t[0], x_t[0], first_val)
    _, filled = jax.lax.scan(scan_fn, init, (x_t, o_t))
    return jnp.moveaxis(filled, 0, t_axis)
