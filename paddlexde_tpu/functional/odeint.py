"""odeint: solve dy/dt = func(t, y), y(t0) = y0.

Signature parity with the reference (``paddlexde/functional/odeint.py:9-35`` in
DrownFish19/PaddleXDE): ``odeint(func, y0, t_span, solver, *, rtol, atol,
options)``. Differences, all deliberate:

- ``y0`` may be ANY pytree (the reference's tuple-state support was a
  commented-out sketch, ``xde/base_xde.py:35-48``);
- the solution layout is canonical: time on axis -2 of every leaf (matching the
  reference's fixed solvers; its adaptive solvers disagreed — SURVEY §2.11-8) —
  pass ``time_axis=0`` for time-first;
- ``xde.format`` exists and works (the reference raises AttributeError,
  SURVEY §2.11-1).
"""

from __future__ import annotations

from typing import Optional

import jax

from ..xde.term import ode_term
from .solve import integrate_term

__all__ = ["odeint", "odeint_dense", "odeint_per_element"]


def odeint(
    func,
    y0,
    t_span,
    solver="dopri5",
    *,
    rtol=1e-7,
    atol=1e-9,
    options: Optional[dict] = None,
    time_axis: int = -2,
):
    """Integrate an ODE system.

    Args:
        func: vector field ``func(t, y) -> dy/dt`` (pytree-valued).
        y0: initial state pytree.
        t_span: 1-D array of output times (monotonic; decreasing spans are
            integrated in reversed time).
        solver: a solver marker (``Euler``/``RK4``/``Dopri5``/...) or string name.
        rtol, atol: adaptive error tolerances.
        options: solver options dict (``norm``, ``step_size``, ``interp``,
            ``first_step``, ``safety``, ``ifactor``, ``dfactor``, ``step_t``,
            ``jump_t``, ``min_step``, ``max_step``, ``max_num_steps``,
            ``return_stats``).
        time_axis: where to place the time axis in each output leaf.

    Returns:
        Solution pytree with a length-``len(t_span)`` time axis per leaf
        (plus :class:`~paddlexde_tpu.solver.adaptive.AdaptiveStats` when
        ``options={"return_stats": True}``).
    """
    term = ode_term(func)
    return integrate_term(
        term,
        y0,
        t_span,
        solver,
        rtol=rtol,
        atol=atol,
        options=options,
        time_axis=time_axis,
    )


def odeint_dense(
    func,
    y0,
    t_span,
    solver="dopri5",
    *,
    rtol=1e-7,
    atol=1e-9,
    options: Optional[dict] = None,
):
    """Integrate ONCE, get a continuous solution — a callable
    :class:`~paddlexde_tpu.solver.adaptive_dense.DenseSolution`.

    One buffered-dense adaptive pass over ``[t_span[0], t_span[-1]]``
    records every accepted step's quartic dense-output coefficients;
    the returned object evaluates the interpolant at ARBITRARY times
    (``sol(t)``, scalar or array — no grid chosen up front) and its exact
    time derivative (``sol.derivative(t)``). It is a registered pytree
    (jit/vmap-compatible) and differentiates through evaluation
    (``jax.grad(lambda t: sol(t))``); for parameter gradients at fixed
    output times use :func:`odeint_adjoint`. Times outside the span clamp.
    No reference counterpart (the reference interpolates privately inside
    the solve loop, ``base_adaptive_solver.py:24-31``); the surface matches
    diffrax's ``SaveAt(dense=True)``.

    Args:
        func, y0, rtol, atol: as :func:`odeint`.
        t_span: only the endpoints matter (the buffer covers the whole
            interval). DECREASING spans solve the reversed system over
            s = −t and the returned object maps queries (and d/dt)
            through the substitution — ask it for times inside the given
            reversed span.
        solver: an ADAPTIVE solver name/marker (dopri5/tsit5/bosh3/...).
        options: ``max_steps`` (accepted-step buffer, default 512 —
            exceeded sets ``stats.status`` to MAX_STEPS_EXCEEDED and the
            tail clamps) plus the usual adaptive knobs (first_step /
            safety / ifactor / dfactor / min_step / max_step / norm /
            return_stats).

    Returns:
        ``DenseSolution`` (or ``(DenseSolution, AdaptiveStats)`` with
        ``options={"return_stats": True}``).
    """
    import jax.numpy as jnp

    from ..solver.adaptive_dense import solve_adaptive_dense
    from ..solver.registry import resolve_solver

    spec = resolve_solver(solver)
    if spec.kind != "adaptive":
        raise ValueError(
            f"odeint_dense needs an adaptive solver (got {spec.name!r}); "
            "fixed-step solutions are already dense on their own grid"
        )
    t_span = jnp.asarray(t_span)
    # the direction handling must be CONCRETE: a traced decreasing span
    # would sail past the direction check (tracers read as "not
    # decreasing") and the while_loop would exit immediately — a zero-step
    # DenseSolution silently returning the zero-coefficient init (the
    # review-caught silent-wrong-result class). The t→−s substitution and
    # the static max_steps buffer both want concrete endpoints anyway.
    import numpy as _np

    try:
        t_host = _np.asarray(t_span, dtype=_np.float64)
    except (TypeError, jax.errors.TracerArrayConversionError) as exc:
        raise ValueError(
            "odeint_dense needs a concrete t_span (the span direction and "
            "the step buffer are static properties); pass the endpoints "
            "outside jit"
        ) from exc
    sign = 1.0
    if t_host[-1] <= t_host[0]:
        if t_host[-1] == t_host[0]:
            raise ValueError("odeint_dense needs a non-degenerate span")
        # reversed time: the same t→−s canonicalization every engine uses —
        # solve ỹ(s) = y(−s) (dỹ/ds = −f(−s, ỹ)) on the increasing −t_span
        # and mark the DenseSolution to map queries (and d/dt) through s=−t
        sign = -1.0
        inner = func
        func = lambda s, y: jax.tree.map(
            jnp.negative, inner(-s, y)
        )
        t_span = -t_span
    opts = dict(options or {})
    allowed = {"max_steps", "first_step", "safety", "ifactor", "dfactor",
               "min_step", "max_step", "norm", "return_stats", "time_dtype"}
    unknown = set(opts) - allowed
    if unknown:
        raise ValueError(
            f"odeint_dense got unknown option(s) {sorted(unknown)}; "
            f"known: {sorted(allowed)}"
        )
    term = ode_term(func)
    out = solve_adaptive_dense(
        term, y0, t_span, method=spec.name, rtol=rtol, atol=atol,
        return_dense=True, **opts,
    )
    if sign == 1.0:
        return out
    from ..solver.adaptive_dense import DenseSolution

    dense, stats = out if isinstance(out, tuple) else (out, None)
    dense = DenseSolution(dense.t_lo, dense.t_end, dense.buf_t0,
                          dense.buf_t1, dense.buf_coeff, dense.n_steps,
                          dense.y0, sign=sign)
    return (dense, stats) if stats is not None else dense


def odeint_per_element(func, y0, t_span, solver="dopri5", *, rtol=1e-7,
                       atol=1e-9, options: Optional[dict] = None,
                       time_axis: int = -2):
    """odeint with INDEPENDENT adaptive step control per batch element.

    ``odeint`` on a batched state shares one error norm (and therefore one dt
    sequence) across the whole batch: the stiffest element drags every other
    element down to its step size. This wrapper ``jax.vmap``s the entire solve
    over the leading axis of every leaf instead (torchode's contribution,
    arXiv:2210.12375 — on TPU it falls out of vmap-of-while_loop for free), so
    each element steps at its own pace.

    Measured (TPU v5e, 256 elements, stiffness spread 1..160, dopri5 rtol
    1e-5): shared-norm 6.7 ms at 445 NFE for ALL elements; per-element 6.0 ms
    at 31..487 NFE each — same wall-clock, strictly better error control
    (vmapped while_loops mask converged lanes rather than serializing).

    With ``options={"return_stats": True}`` the returned stats are per-element
    (leading axis = batch): inspect ``stats.nfe`` to see the spread.
    """

    def solve_one(y):
        return odeint(func, y, t_span, solver, rtol=rtol, atol=atol,
                      options=options, time_axis=time_axis)

    return jax.vmap(solve_one)(y0)
