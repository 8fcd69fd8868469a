"""ddeint: delay differential equations with learnable fractional lags.

Signature parity with the reference (``paddlexde/functional/ddeint.py:9-47`` in
DrownFish19/PaddleXDE): ``ddeint(func, y0, t_span, lags, his, his_span, solver,
his_processed=False, rtol, atol, options, fixed_solver_interp="linear")``,
returning the TUPLE ``(solution, y_lags)`` so callers can put a loss on the
interpolated history (as D3STN does with its KL alignment loss,
``example/D3STN/train_dde.py:436-452``).

The differentiable history lookup (``HistoryIndex``) happens once before
integration (reference ``xde/base_dde.py:33-36``); gradients reach ``lags``
through the spline polynomial and NOT the history — the learned-delay-selection
mechanism (SURVEY §5).

Accepted ``func`` signatures (resolving the reference's contract split,
SURVEY §2.11-5): the live D3STN 2-arg ``func(y_lags, y)``; the stale demo 4-arg
``func(t, y, lags, y_lags)``; the canonical ``func(t, y, *, lags, y_lags)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..xde.history import history_index
from ..xde.term import dde_term
from .solve import integrate_term

__all__ = ["ddeint"]


def ddeint(
    func,
    y0,
    t_span,
    lags,
    his,
    his_span,
    solver="euler",
    his_processed: bool = False,
    rtol=1e-7,
    atol=1e-9,
    options: Optional[dict] = None,
    fixed_solver_interp: str = "linear",
    *,
    interpolation: str = "cubic",
    damping: float = 1e-3,
    time_axis: int = -2,
):
    """Integrate a delay DE.

    Args:
        func: vector field over (history-at-lags, current-state); see module
            docstring for accepted signatures.
        y0: initial state.
        t_span: output times.
        lags: fractional (learnable) lag positions into ``his_span``.
        his: history series ``[..., T, D]``.
        his_span: knots of the history series ``[T]``.
        his_processed: when True, ``lags`` is already the evaluated history
            (reference semantics: skip the spline lookup,
            ``xde/base_dde.py:33-36``).
        fixed_solver_interp: dense-output mode for fixed solvers
            ("linear" | "cubic" | "" — reference ``ddeint.py:22``).
        interpolation: spline family for the history lookup
          ("linear" | "cubic" | "bezier").
        damping: the damped-Euler fuse coefficient (reference hardcodes 1e-3,
            ``xde/base_dde.py:55-58``).

    Returns:
        ``(solution, y_lags)``.
    """
    if his_processed:
        y_lags = jnp.asarray(lags)
    else:
        y_lags = history_index(lags, his, his_span, interpolation=interpolation)

    term = dde_term(func, lags, y_lags, damping=damping)
    solution = integrate_term(
        term,
        y0,
        t_span,
        solver,
        rtol=rtol,
        atol=atol,
        options=options,
        time_axis=time_axis,
        interp=fixed_solver_interp,
    )
    return solution, y_lags
