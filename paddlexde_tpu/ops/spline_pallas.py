"""Pallas TPU kernel: fused spline gather + Hermite evaluation.

The differentiable history lookup (``HistoryIndex`` — the mechanism that lets
D3STN reduce a 2016-step history to 12 learnable lag positions, SURVEY §5) is
a gather of 4 control rows per query followed by a cubic polynomial. The XLA
path materializes 4 gathered intermediates in HBM; this kernel keeps the
series block resident in VMEM and evaluates ALL queries per load — one HBM
pass over the history instead of four gathers.

Layout: the series is transposed to ``[T, C]`` (C = flattened batch*feature)
so the lane dimension is the large fused batch axis (D3STN's feature dim is 3
— putting it on lanes would waste 125/128 of every tile), and the query loop
is a static unroll over L (= 12 lags).

Gradients: a ``jax.custom_vjp`` routes the lag cotangent through the analytic
Hermite derivative (itself the same kernel with derivative basis), matching
the reference's hand-written backward (``xde/base_dde.py:120-127``).
A jnp reference implementation is used on non-TPU backends and validated for
equality in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hermite_gather_eval", "pallas_available"]


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _prep(series, t, queries):
    """Common index/offset prep: idx [L], frac [L], h [L] (interval widths)."""
    t = jnp.asarray(t, series.dtype)
    queries = jnp.asarray(queries, series.dtype)
    max_idx = series.shape[-2] - 2
    idx = jnp.clip(jnp.searchsorted(t, queries, side="right") - 1, 0, max_idx)
    t0 = t[idx]
    t1 = t[jnp.clip(idx + 1, 0, t.shape[0] - 1)]
    h = jnp.where(t1 == t0, jnp.ones_like(t0), t1 - t0)
    frac = (queries - t0) / h
    return idx.astype(jnp.int32), frac, h


def _slopes(series, t):
    dt = t[1:] - t[:-1]
    dp = series[..., 1:, :] - series[..., :-1, :]
    m = dp / dt.astype(series.dtype)[:, None]
    return jnp.concatenate([m, m[..., -1:, :]], axis=-2)


def _basis(frac, h, derivative: bool):
    x = frac
    x2 = x * x
    if derivative:
        c_p0 = (6 * x2 - 6 * x) / h
        c_m0 = 3 * x2 - 4 * x + 1
        c_p1 = (-6 * x2 + 6 * x) / h
        c_m1 = 3 * x2 - 2 * x
    else:
        x3 = x2 * x
        c_p0 = 2 * x3 - 3 * x2 + 1
        c_m0 = (x3 - 2 * x2 + x) * h
        c_p1 = -2 * x3 + 3 * x2
        c_m1 = (x3 - x2) * h
    return c_p0, c_m0, c_p1, c_m1


def _eval_jnp(x_tc, m_tc, idx, c_p0, c_m0, c_p1, c_m1):
    """Reference path: [T, C] series/slopes, [L] coefficients -> [L, C]."""
    p0 = x_tc[idx]
    p1 = x_tc[idx + 1]
    mm0 = m_tc[idx]
    mm1 = m_tc[idx + 1]
    e = lambda v: v[:, None].astype(x_tc.dtype)
    return e(c_p0) * p0 + e(c_m0) * mm0 + e(c_p1) * p1 + e(c_m1) * mm1


def _eval_pallas(x_tc, m_tc, idx, c_p0, c_m0, c_p1, c_m1, *, c_tile: int = 256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_len, c_len = x_tc.shape
    n_q = idx.shape[0]
    dtype = x_tc.dtype

    pad_c = (-c_len) % c_tile
    if pad_c:
        x_tc = jnp.pad(x_tc, ((0, 0), (0, pad_c)))
        m_tc = jnp.pad(m_tc, ((0, 0), (0, pad_c)))
    c_padded = c_len + pad_c

    coeffs = jnp.stack([c_p0, c_m0, c_p1, c_m1], axis=0).astype(dtype)  # [4, L]

    def kernel(idx_ref, coef_ref, x_ref, m_ref, out_ref):
        for l in range(n_q):  # static unroll: L is small (12 lags)
            i = idx_ref[l]
            p0 = x_ref[pl.ds(i, 1), :]
            p1 = x_ref[pl.ds(i + 1, 1), :]
            mm0 = m_ref[pl.ds(i, 1), :]
            mm1 = m_ref[pl.ds(i + 1, 1), :]
            out_ref[pl.ds(l, 1), :] = (
                coef_ref[0, l] * p0
                + coef_ref[1, l] * mm0
                + coef_ref[2, l] * p1
                + coef_ref[3, l] * mm1
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # idx, coeffs
        grid=(c_padded // c_tile,),
        in_specs=[
            pl.BlockSpec((t_len, c_tile), lambda c, idx_r, coef_r: (0, c)),
            pl.BlockSpec((t_len, c_tile), lambda c, idx_r, coef_r: (0, c)),
        ],
        out_specs=pl.BlockSpec((n_q, c_tile), lambda c, idx_r, coef_r: (0, c)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_q, c_padded), dtype),
    )(idx, coeffs, x_tc, m_tc)
    return out[:, :c_len]


def _gather_eval_impl(series, t, queries, *, use_pallas: bool, derivative: bool):
    """series [..., T, D] -> [..., L, D] Hermite values (or derivatives)."""
    batch_shape = series.shape[:-2]
    t_len, d = series.shape[-2], series.shape[-1]
    idx, frac, h = _prep(series, t, queries)
    slopes = _slopes(series, jnp.asarray(t, series.dtype))
    c_p0, c_m0, c_p1, c_m1 = _basis(frac, h, derivative)

    # [..., T, D] -> [T, C]
    x_tc = jnp.moveaxis(series.reshape((-1, t_len, d)), 1, 0).reshape(t_len, -1)
    m_tc = jnp.moveaxis(slopes.reshape((-1, t_len, d)), 1, 0).reshape(t_len, -1)

    if use_pallas:
        out = _eval_pallas(x_tc, m_tc, idx, c_p0, c_m0, c_p1, c_m1)
    else:
        out = _eval_jnp(x_tc, m_tc, idx, c_p0, c_m0, c_p1, c_m1)

    n_q = idx.shape[0]
    # [L, C] -> [..., L, D]
    out = out.reshape(n_q, -1, d)
    out = jnp.moveaxis(out, 0, 1).reshape(batch_shape + (n_q, d))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def hermite_gather_eval(series, t, queries, use_pallas: bool = False):
    """Fused cubic-Hermite evaluation of ``series [..., T, D]`` at fractional
    ``queries [L]``; returns ``[..., L, D]``. Numerically identical to
    ``CubicHermiteSpline(series, t).evaluate(queries)``.

    Gradients flow to ``queries`` only (the HistoryIndex contract); use the
    spline class for history gradients.
    """
    return _gather_eval_impl(series, t, queries, use_pallas=use_pallas, derivative=False)


def _fwd(series, t, queries, use_pallas):
    out = hermite_gather_eval(series, t, queries, use_pallas)
    return out, (series, t, queries)


def _bwd(use_pallas, res, g):
    series, t, queries = res
    deriv = _gather_eval_impl(
        series, t, queries, use_pallas=use_pallas, derivative=True
    )
    # grad_queries[l] = sum over batch/features of g * dH/dquery
    reduce_axes = tuple(range(deriv.ndim - 2)) + (deriv.ndim - 1,)
    g_q = jnp.sum(g * deriv, axis=reduce_axes).astype(jnp.asarray(queries).dtype)
    return (jnp.zeros_like(series), jnp.zeros_like(jnp.asarray(t)), g_q)


hermite_gather_eval.defvjp(_fwd, _bwd)
