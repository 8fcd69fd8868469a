"""Step-size control and dense-output polynomial machinery.

TPU-native rebuild of ``paddlexde/utils/ode_utils.py:22-109`` (DrownFish19/PaddleXDE).
Everything here is a pure function of arrays/pytrees, safe inside ``jit`` /
``lax.while_loop`` — the reference's Python ``if error_ratio == 0`` branches become
``jnp.where`` selects, and its ``PaddleAssign`` in-place PyLayer disappears entirely
(functional ``.at[].set()`` buffers are differentiable by construction).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .norms import rms_norm

__all__ = [
    "sort_tvals",
    "interp_fit",
    "interp_evaluate",
    "compute_error_ratio",
    "optimal_step_size",
    "select_initial_step",
]


def sort_tvals(tvals, t0):
    """Keep tvals >= t0 (others pushed to +inf) and sort ascending.

    Mirrors reference ``sort_tvals`` (``ode_utils.py:22-25``) but stays
    static-shaped for jit: filtered-out entries become +inf instead of being
    dropped, so downstream "next grid point" searches skip them naturally.
    """
    tvals = jnp.asarray(tvals)
    tvals = jnp.where(tvals >= t0, tvals, jnp.inf)
    return jnp.sort(tvals)


def interp_fit(y0, y1, y_mid, f0, f1, dt):
    """Fit a 4th-order polynomial over one solver step (pytree version).

    Same quartic-fit coefficients as reference ``interp_fit``
    (``ode_utils.py:28-50``): returns ``[e, d, c, b, a]`` for
    ``p(x) = a x^4 + b x^3 + c x^2 + d x + e`` with ``x in [0, 1]`` across the step.
    Each coefficient is a pytree matching the state structure.
    """

    # One tree.map per coefficient: the state pytree may itself contain tuples
    # (e.g. the adjoint's augmented state), so a tuple-transpose trick would
    # misidentify leaves.
    def _d(x):
        return jnp.asarray(dt, dtype=x.dtype)

    e = y0
    d = jax.tree.map(lambda f0: _d(f0) * f0, f0)
    c = jax.tree.map(
        lambda y0, y1, ym, f0, f1: _d(y0) * (f1 - 4 * f0) - 11 * y0 - 5 * y1 + 16 * ym,
        y0, y1, y_mid, f0, f1,
    )
    b = jax.tree.map(
        lambda y0, y1, ym, f0, f1: _d(y0) * (5 * f0 - 3 * f1) + 18 * y0 + 14 * y1 - 32 * ym,
        y0, y1, y_mid, f0, f1,
    )
    a = jax.tree.map(
        lambda y0, y1, ym, f0, f1: 2 * _d(y0) * (f1 - f0) - 8 * (y1 + y0) + 16 * ym,
        y0, y1, y_mid, f0, f1,
    )
    return [e, d, c, b, a]


def interp_evaluate(coefficients, t0, t1, t):
    """Horner evaluation of `interp_fit` coefficients at time ``t`` (pytree).

    Mirrors reference ``interp_evaluate`` (``ode_utils.py:52-77``) minus the Python
    assert (jit-incompatible); callers clamp ``t`` into ``[t0, t1]`` instead.
    """
    x = (t - t0) / (t1 - t0)
    # Guard the zero-length-interval case (t0 == t1) that arises before the first
    # accepted step: define the polynomial value as coefficients[0] (== y at t0).
    x = jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))
    e, d, c, b, a = coefficients

    def horner(e, d, c, b, a):
        xx = x.astype(e.dtype)
        return e + xx * (d + xx * (c + xx * (b + xx * a)))

    return jax.tree.map(horner, e, d, c, b, a)


def compute_error_ratio(error_estimate, rtol, atol, y0, y1, norm: Callable = rms_norm):
    """norm(err / (atol + rtol * max(|y0|, |y1|))) over the state pytree.

    Mirrors reference ``compute_error_ratio`` (``ode_utils.py:80-82``).
    """
    ratio = jax.tree.map(
        lambda e, a, b: e / (atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))),
        error_estimate,
        y0,
        y1,
    )
    return jnp.abs(norm(ratio))


def optimal_step_size(last_step, error_ratio, safety, ifactor, dfactor, order):
    """PI-free step controller, branchless for ``lax.while_loop``.

    Same policy as reference ``optimal_step_size`` (``ode_utils.py:85-97``):
    grow by ``ifactor`` on a zero-error step, never shrink an accepted step
    (dfactor -> 1 when error_ratio < 1), otherwise scale by
    ``clip(safety / error_ratio**(1/order), dfactor, ifactor)``.
    """
    last_step = jnp.asarray(last_step)
    dtype = last_step.dtype
    error_ratio = jnp.asarray(error_ratio, dtype=dtype)
    safety = jnp.asarray(safety, dtype=dtype)
    ifactor = jnp.asarray(ifactor, dtype=dtype)
    dfactor = jnp.where(error_ratio < 1.0, jnp.ones((), dtype), jnp.asarray(dfactor, dtype))
    exponent = jnp.reciprocal(jnp.asarray(order, dtype))
    # avoid 0**-x = inf -> nan propagation; the zero branch is selected away below
    safe_ratio = jnp.maximum(error_ratio, jnp.finfo(dtype).tiny)
    factor = jnp.minimum(ifactor, jnp.maximum(safety / safe_ratio**exponent, dfactor))
    return jnp.where(error_ratio == 0, last_step * ifactor, last_step * factor)


def select_initial_step(move, t0, y0, order, rtol, atol, norm: Callable = rms_norm, f0=None):
    """Hairer-Nørsett-Wanner II.4 initial-step heuristic, branchless.

    Mirrors reference ``AdaptiveSolver.select_initial_step``
    (``solver/base_adaptive_solver.py:33-72``), rewritten with ``jnp.where`` so it
    traces under jit. ``move(t, dt, y) -> dy`` is the XDE derivative hook.
    """
    t_dtype = jnp.asarray(t0).dtype
    if f0 is None:
        f0 = move(t0, jnp.zeros((), t_dtype), y0)

    scale = jax.tree.map(lambda y: atol + jnp.abs(y) * rtol, y0)
    d0 = jnp.abs(norm(jax.tree.map(jnp.divide, y0, scale)))
    d1 = jnp.abs(norm(jax.tree.map(jnp.divide, f0, scale)))

    dtype = jnp.result_type(*[leaf.dtype for leaf in jax.tree.leaves(y0)])
    small = jnp.asarray(1e-6, dtype)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), small, 0.01 * d0 / jnp.maximum(d1, jnp.finfo(dtype).tiny))
    h0 = jnp.abs(h0)

    y1 = jax.tree.map(lambda y, f: y + h0.astype(y.dtype) * f, y0, f0)
    f1 = move(t0 + h0.astype(t_dtype), jnp.zeros((), t_dtype), y1)
    d2 = jnp.abs(norm(jax.tree.map(lambda a, b, s: (a - b) / s, f1, f0, scale)) / h0)

    d_max = jnp.maximum(d1, d2)
    h1 = jnp.where(
        (d1 <= 1e-15) & (d2 <= 1e-15),
        jnp.maximum(small, h0 * 1e-3),
        (0.01 / jnp.maximum(d_max, jnp.finfo(dtype).tiny)) ** (1.0 / float(order + 1)),
    )
    h1 = jnp.abs(h1)
    return jnp.minimum(100.0 * h0, h1).astype(t_dtype)
