"""Shared dispatch from the functional API into the solver engines.

Centralizes the three things the reference scatters across ``functional/*.py``
and solver constructors (DrownFish19/PaddleXDE):

- solver resolution + ``options`` plumbing (reference passes ``**options`` into
  solver ctors, ``functional/odeint.py:30-31``),
- reverse-time canonicalization (the reference leaves decreasing ``t_span``
  half-handled, SURVEY §2.11-10): decreasing spans are integrated in the
  substituted time ``s = -t`` with a negated vector field — exact for the
  additive terms the adaptive engine accepts,
- the canonical output layout (SURVEY §2.11-8): engines produce time-first
  ``[T, ...]``; the API edge moves time to axis -2 of every leaf (the reference
  fixed-solver ``[B, T, D]`` convention, ``base_fixed_solver.py:143``), with
  ``time_axis=0`` opting into raw time-first.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..solver.adaptive import solve_adaptive
from ..solver.fixed import solve_fixed
from ..solver.registry import SolverSpec, resolve_solver
from ..utils.norms import rms_norm
from ..xde.term import XDETerm

__all__ = ["integrate_term", "format_solution"]

_FIXED_KEYS = {"interp", "step_size", "grid_constructor", "grid", "time_dtype", "checkpoint"}
_ADAPTIVE_KEYS = {
    "max_steps",
    "norm",
    "first_step",
    "safety",
    "ifactor",
    "dfactor",
    "min_step",
    "max_step",
    "max_num_steps",
    "step_t",
    "jump_t",
    "return_stats",
    "time_dtype",
    "newton_iters",  # implicit (ESDIRK) tableaus: Newton iterations per stage
    "direct_grad",  # False: raw while_loop engine (no reverse-mode, jvp ok)
    "grid_buffer",  # accepted-step recording capacity for direct gradients
    "overflow_warn",  # False: silence the grid_buffer-overflow RuntimeWarning
}
_ADAMS_KEYS = {"implicit", "max_iters", "max_order", "step_size", "grid_constructor", "grid", "time_dtype", "norm"}


def _span_direction(t_span):
    """+1 / -1 for a concrete span; None when traced (statically unknown)."""
    try:
        ct = np.asarray(t_span)
    except Exception:
        return None
    return -1 if ct.size >= 2 and float(ct[-1]) < float(ct[0]) else 1


def _is_decreasing(t_span) -> bool:
    """Statically-known-decreasing (traced spans report False — callers that
    must act on traced directions use :func:`_canonicalize_direction`)."""
    return _span_direction(t_span) == -1


def _negate_tree(tree):
    return jax.tree.map(jnp.negative, tree)


def _reversed_term(term: XDETerm) -> XDETerm:
    """Time substitution t = -s: dy/ds = -move(-s, ·, y)."""

    def move(s, ds, y):
        return _negate_tree(term.move(-s, -ds, y))

    return XDETerm(move=move, fuse=term.fuse, additive=term.additive, kind=term.kind)


def _signed_term(term: XDETerm, sign) -> XDETerm:
    """Branchless reverse canonicalization for TRACED spans: the direction is
    a runtime scalar ``sign`` ∈ {+1, -1} baked into the term as
    ``move(s) = sign * term.move(sign*s, sign*ds, y)`` — identity for +1,
    the t = -s substitution for -1. Round-3 bug fix: traced decreasing spans
    used to be 'assumed increasing', so under jit the ADAPTIVE engine (whose
    while_loop exits immediately when t0 >= t_end) silently returned y0 —
    values wrong and every gradient zero (found live: a jitted CNF training
    step trained to nothing while the eager loss trained fine)."""

    def move(s, ds, y):
        return jax.tree.map(
            lambda v: sign.astype(v.dtype) * v,
            term.move(sign * s, sign * ds, y),
        )

    return XDETerm(move=move, fuse=term.fuse, additive=term.additive, kind=term.kind)


def _scale_time_options(options: dict, sign) -> dict:
    """Traced-sign counterpart of :func:`_negate_time_options`. Negated
    step_t/jump_t come out reverse-ordered, but the adaptive engine
    unconditionally re-sorts both (sort_tvals) — same invariant the static
    path relies on, so no sort here."""
    options = dict(options)
    if options.get("grid") is not None:
        options["grid"] = sign * jnp.asarray(options["grid"])
    for k in ("step_t", "jump_t"):
        if options.get(k) is not None:
            options[k] = sign * jnp.asarray(options[k])
    gc = options.get("grid_constructor")
    if gc is not None:
        options["grid_constructor"] = lambda ts: sign * jnp.asarray(gc(sign * ts))
    return options


def _canonicalize_direction(term, t_span, options):
    """Make the span the engines see increasing, whatever the input
    direction: statically for concrete spans, branchlessly for traced ones."""
    direction = _span_direction(t_span)
    if direction == -1:
        return _reversed_term(term), -jnp.asarray(t_span), _negate_time_options(options)
    if direction is None:
        t_span = jnp.asarray(t_span)
        sign = jnp.where(t_span[-1] >= t_span[0], 1, -1).astype(t_span.dtype)
        return _signed_term(term, sign), sign * t_span, _scale_time_options(options, sign)
    return term, t_span, options


def _negate_time_options(options: dict) -> dict:
    """Map TIME-VALUED solver options through the t = -s substitution.

    Reverse-time canonicalization negates t_span and reverses the term;
    options that name points in ORIGINAL time must follow or they address
    the wrong places (round-3 bug fix: an explicit decreasing
    ``options={'grid': ...}`` silently produced wrong interpolants because
    the grid stayed un-negated against the negated span). Durations
    (step_size, first_step, min/max_step) are direction-free and untouched.
    """
    options = dict(options)
    for k in ("grid", "step_t", "jump_t"):
        if options.get(k) is not None:
            options[k] = -jnp.asarray(options[k])
    gc = options.get("grid_constructor")
    if gc is not None:
        options["grid_constructor"] = lambda ts: -jnp.asarray(gc(-ts))
    return options


def format_solution(solution, time_axis: int = -2):
    """Move the leading time axis of every leaf to ``time_axis`` (default -2)."""
    if time_axis == 0:
        return solution

    def leaf(arr):
        if arr.ndim <= 1:
            return arr
        return jnp.moveaxis(arr, 0, time_axis if time_axis >= 0 else arr.ndim + time_axis)

    return jax.tree.map(leaf, solution)


def integrate_term(
    term: XDETerm,
    y0,
    t_span,
    solver,
    *,
    rtol=1e-7,
    atol=1e-9,
    options: Optional[dict] = None,
    time_axis: int = -2,
    interp: Optional[str] = None,
):
    """Dispatch one integration; returns the formatted solution pytree.

    ``options`` accepts the reference's solver-kwargs vocabulary (norm,
    step_size, grid_constructor, first_step, safety/ifactor/dfactor,
    step_t/jump_t, min_step/max_step, max_num_steps, interp, return_stats).
    """
    if callable(solver) and not isinstance(solver, SolverSpec):
        # power-user path: a custom fixed-step function
        # ``step(term, t0, t1, y0) -> (y1, dy0)`` — e.g. a preconditioned
        # Newton-Krylov stepper from ``make_implicit_euler_krylov_step`` —
        # is first-class at the odeint level, not just via solve_fixed
        options = dict(options or {})
        unknown = set(options) - _FIXED_KEYS - {"norm"}
        if unknown:
            raise ValueError(
                f"custom step functions take fixed-solver options only; "
                f"unknown: {sorted(unknown)}"
            )
        term, t_span, options = _canonicalize_direction(term, t_span, options)
        kw = {k: v for k, v in options.items() if k in _FIXED_KEYS}
        sol = solve_fixed(term, y0, t_span, method=solver, **kw)
        return format_solution(sol, time_axis)

    spec: SolverSpec = resolve_solver(solver)
    options = dict(options or {})
    if interp is not None:
        options.setdefault("interp", interp)
    options.setdefault("norm", rms_norm)

    known = _FIXED_KEYS | _ADAPTIVE_KEYS | _ADAMS_KEYS | {"scipy_method", "norm"}
    unknown = set(options) - known
    if unknown:
        raise ValueError(
            f"unknown solver option(s) {sorted(unknown)}; known options: {sorted(known)}"
        )

    term, t_span, options = _canonicalize_direction(term, t_span, options)

    if spec.kind == "fixed":
        kw = {k: v for k, v in options.items() if k in _FIXED_KEYS}
        sol = solve_fixed(term, y0, t_span, method=spec.name, **kw)
        return format_solution(sol, time_axis)
    if spec.kind == "adaptive":
        if "max_steps" in options:
            # buffered-dense engine: one integration pass + vectorized output
            from ..solver.adaptive_dense import solve_adaptive_dense

            kw = {
                k: v for k, v in options.items()
                if k in _ADAPTIVE_KEYS - {"step_t", "jump_t", "max_num_steps"}
                or k == "max_steps"
            }
            out = solve_adaptive_dense(
                term, y0, t_span, method=spec.name, rtol=rtol, atol=atol, **kw
            )
            if options.get("return_stats"):
                sol, stats = out
                return format_solution(sol, time_axis), stats
            return format_solution(out, time_axis)
        kw = {
            k: v for k, v in options.items()
            if k in _ADAPTIVE_KEYS - {"direct_grad", "grid_buffer",
                                      "overflow_warn"}
        }
        if options.get("direct_grad", True):
            # recorded-grid custom_jvp wrapper: jax.grad AND jvp/jacfwd/
            # hessian through the adaptive solve just work (discrete-exact
            # replay gradients; forward and stats bit-equal to the raw
            # engine) — solver/adaptive_autodiff.py
            from ..solver.adaptive_autodiff import solve_adaptive_autodiff

            out = solve_adaptive_autodiff(
                term, y0, t_span, method=spec.name, rtol=rtol, atol=atol,
                grid_buffer=int(options.get("grid_buffer", 512)),
                overflow_warn=bool(options.get("overflow_warn", True)), **kw
            )
        else:
            out = solve_adaptive(
                term, y0, t_span, method=spec.name, rtol=rtol, atol=atol, **kw
            )
        if options.get("return_stats"):
            sol, stats = out
            return format_solution(sol, time_axis), stats
        return format_solution(out, time_axis)
    if spec.kind == "adams":
        from ..solver.adams import solve_adams

        kw = {k: v for k, v in options.items() if k in _ADAMS_KEYS}
        implicit = spec.name == "implicit_adams" or kw.pop("implicit", False)
        sol = solve_adams(term, y0, t_span, rtol=rtol, atol=atol, implicit=implicit, **kw)
        return format_solution(sol, time_axis)
    if spec.kind == "scipy":
        from ..solver.scipy_wrapper import solve_scipy

        sol = solve_scipy(term, y0, t_span, rtol=rtol, atol=atol, **{
            k: v for k, v in options.items() if k in {"scipy_method"}
        })
        return format_solution(sol, time_axis)
    raise ValueError(f"unknown solver kind {spec.kind!r}")
