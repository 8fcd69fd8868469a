"""The XDE problem abstraction: the move/fuse two-hook contract, functional.

The reference (DrownFish19/PaddleXDE) routes every problem family through two OO
hooks bound into the solver: ``xde.move(t0, dt, y0)`` computes a "derivative-like"
quantity and ``xde.fuse(dy, dt, y0)`` applies it (``paddlexde/solver/
base_fixed_solver.py:62-64``, ``paddlexde/xde/base_xde.py:8-107``). That inversion —
solvers never touch the user function — is how one solver zoo serves ODE/SDE/DDE/CDE,
and we keep it. But here a problem is an :class:`XDETerm` of *pure functions* closed
over the user's vector field, so the whole integrate loop can live inside
``lax.scan`` / ``lax.while_loop`` and states are arbitrary pytrees (the reference's
tuple-flattening layer, ``utils/misc.py:1-13``, has no equivalent — pytrees are native).

Semantics per family (with reference citations and deliberate fixes):

- ODE  (``xde/base_ode.py:47-58``):  move = f(t, y);  fuse = y + dy * dt.
- SDE  (``xde/base_sde.py:44-61``):  move returns the pair (f(t,y), g(t,y) * dW)
  and fuse = y + f * dt + g_dW — *correct* Euler–Maruyama, fixing the reference's
  half-implemented ``y0 + dy*dt + dy`` (SURVEY §2.11-2).
- DDE  (``xde/base_dde.py:47-58``):  move = func(y_lags, y) (the D3STN seq2seq
  contract — the stale 4-arg demo signature is also accepted, see
  :func:`dde_term`);  fuse = y + (dy - damping * y) * dt  (damped Euler, default
  damping 1e-3 as the reference hardcodes).
- CDE  (torchcde semantics; the reference's ``xde/base_cde.py`` is vaporware —
  SURVEY §2.11-3):  move = f(t, y) @ dX/dt(t);  fuse = y + dy * dt.
"""

from __future__ import annotations

import dataclasses
import inspect
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["XDETerm", "ode_term", "sde_term", "dde_term", "cde_term"]


@dataclasses.dataclass(frozen=True)
class XDETerm:
    """A differential-equation problem as two pure hooks.

    Attributes:
        move: ``(t, dt, y) -> dy`` — evaluate the derivative-like quantity over
            the step starting at ``t`` with width ``dt``. ``dy`` is a pytree;
            for ODE/DDE/CDE it matches ``y``'s structure, for SDE it is a
            ``(drift_val, diffusion_increment)`` pair.
        fuse: ``(dy, dt, y) -> y_new`` — apply one explicit update. Must be
            affine in ``dy`` (solvers combine multiple fused states linearly,
            as the reference's ``rk4_alt_step_func`` does).
        additive: True when ``dy`` matches ``y``'s pytree structure and
            ``fuse(dy, dt, y) == y + dt * dy`` up to problem-specific damping —
            the property the adaptive RK engine needs (the reference's adaptive
            engine likewise bypasses ``fuse``, ``base_adaptive_solver_rk.py:167``).
        kind: "ode" | "sde" | "dde" | "cde", for diagnostics.
    """

    move: Callable[[Any, Any, Any], Any]
    fuse: Callable[[Any, Any, Any], Any]
    additive: bool = True
    kind: str = "ode"


def ode_term(func: Callable) -> XDETerm:
    """dy/dt = func(t, y). Reference: ``xde/base_ode.py:47-58``."""

    def move(t, dt, y):
        del dt
        return func(t, y)

    def fuse(dy, dt, y):
        return jax.tree.map(lambda yl, dyl: yl + jnp.asarray(dt, yl.dtype) * dyl, y, dy)

    return XDETerm(move=move, fuse=fuse, additive=True, kind="ode")


def sde_term(drift: Callable, diffusion: Callable, bm: Callable) -> XDETerm:
    """dy = f dt + g dW, Euler–Maruyama semantics.

    ``bm(ta, tb)`` returns the Brownian increment W(tb) - W(ta) (see
    ``paddlexde_tpu.brownian``). ``move`` returns the pair ``(f(t,y), g(t,y)*dW)``
    so ``fuse`` can scale them separately — the dt-scaling applies only to drift.
    Reference: ``xde/base_sde.py:44-61`` (with the fuse defect corrected,
    SURVEY §2.11-2).
    """

    def move(t, dt, y):
        d_w = bm(t, t + dt)
        f_val = drift(t, y)
        g_val = diffusion(t, y)
        g_dw = jax.tree.map(lambda g, w: g * w, g_val, d_w)
        return (f_val, g_dw)

    def fuse(dy, dt, y):
        f_val, g_dw = dy
        return jax.tree.map(
            lambda yl, fl, gl: yl + jnp.asarray(dt, yl.dtype) * fl + gl, y, f_val, g_dw
        )

    return XDETerm(move=move, fuse=fuse, additive=False, kind="sde")


def _dde_call(func: Callable):
    """Resolve the DDE vector-field signature.

    The reference has two conflicting contracts (SURVEY §2.11-5): the live one
    (D3STN) is the 2-arg seq2seq ``func(y_lags, y)`` (``xde/base_dde.py:47-53``,
    ``example/D3STN/d3stn.py:122-125``); the stale demo uses 4-arg
    ``func(t, y0, lags, y_lags)`` (``example/dde_demo.py:45``). We accept both,
    resolved once at trace time by arity, plus the canonical keyword form
    ``func(t, y, *, lags, y_lags)``.
    """
    try:
        params = inspect.signature(func).parameters
        names = list(params)
        has_kw = any(p.kind == inspect.Parameter.KEYWORD_ONLY for p in params.values())
    except (TypeError, ValueError):  # builtins / wrapped callables
        names, has_kw = ["y_lags", "y"], False

    if has_kw and {"lags", "y_lags"} <= set(names):
        return lambda t, y, lags, y_lags: func(t, y, lags=lags, y_lags=y_lags)
    n_pos = len([p for p in params.values() if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]) if names else 2
    if n_pos >= 4:
        return lambda t, y, lags, y_lags: func(t, y, lags, y_lags)
    return lambda t, y, lags, y_lags: func(y_lags, y)


def dde_term(func: Callable, lags, y_lags, damping: float = 1e-3) -> XDETerm:
    """Delay DE with precomputed differentiable history lookup ``y_lags``.

    ``y_lags`` is produced by the interpolation subsystem's
    :func:`~paddlexde_tpu.xde.history.history_index` (the reference's
    ``HistoryIndex`` PyLayer, ``xde/base_dde.py:82-128``) before integration
    starts, exactly as ``BaseDDE.__init__`` does (``xde/base_dde.py:33-36``).

    The damping is folded into the VECTOR FIELD (``f_eff = f - damping*y``)
    rather than the fuse: identical to the reference under Euler (its only
    exercised DDE solver), and — unlike the reference, whose adaptive engine
    bypasses fuse and silently drops the damping — higher-order and adaptive
    solvers here integrate the damped dynamics correctly.
    """
    call = _dde_call(func)

    def move(t, dt, y):
        del dt
        dy = call(t, y, lags, y_lags)
        if not damping:
            return dy
        return jax.tree.map(lambda d, yl: d - damping * yl, dy, y)

    def fuse(dy, dt, y):
        return jax.tree.map(
            lambda yl, dyl: yl + jnp.asarray(dt, yl.dtype) * dyl, y, dy
        )

    return XDETerm(move=move, fuse=fuse, additive=True, kind="dde")


def cde_term(func: Callable, control_deriv: Callable) -> XDETerm:
    """Neural controlled DE: dy = f(t, y) @ dX/dt dt.

    ``func(t, y) -> [..., D_y, D_x]`` (a matrix field), ``control_deriv(t) ->
    [..., D_x]`` (the derivative of the interpolated control path X, e.g.
    ``CubicHermiteSpline(...).derivative``). This implements the capability the
    reference sketched but left broken (``xde/base_cde.py:20-35``, SURVEY §2.11-3),
    with torchcde semantics. The contraction is a batched matvec — MXU-friendly.
    """

    def move(t, dt, y):
        del dt
        mat = func(t, y)
        d_x = control_deriv(t)
        return jax.tree.map(
            lambda m, dx: jnp.einsum("...ij,...j->...i", m, dx), mat, d_x
        )

    def fuse(dy, dt, y):
        return jax.tree.map(lambda yl, dyl: yl + jnp.asarray(dt, yl.dtype) * dyl, y, dy)

    return XDETerm(move=move, fuse=fuse, additive=True, kind="cde")
