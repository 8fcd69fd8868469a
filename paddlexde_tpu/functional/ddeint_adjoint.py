"""ddeint_adjoint: O(1)-memory gradients for the delay-DE path.

The reference left this a ``NotImplementedError`` stub
(``paddlexde/functional/ddeint_adjoint.py:1-2`` in DrownFish19/PaddleXDE); this
is a working implementation, so it EXCEEDS reference parity (flagged per
SURVEY §7 build-plan guidance).

Construction: with the history lookup precomputed (as ``BaseDDE.__init__``
does), the DDE is an ODE in ``y`` whose vector field closes over ``y_lags`` —
so the spline evaluation sits OUTSIDE the custom_vjp and its lag-gradients flow
by ordinary autodiff, while the heavy trajectory gradients go through the
augmented backward ODE of :func:`odeint_adjoint`. The reference's damped fuse
``(dy - damping*y)*dt`` is folded into the vector field
(``f_eff = f - damping*y``), which coincides exactly with the fixed-Euler
forward path and is the correct continuous-time reading of the damping term.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..xde.history import history_index
from ..xde.term import _dde_call
from .odeint_adjoint import odeint_adjoint

__all__ = ["ddeint_adjoint"]


def ddeint_adjoint(
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
    adjoint_solver=None,
    adjoint_rtol=None,
    adjoint_atol=None,
    adjoint_options: Optional[dict] = None,
):
    """Like :func:`ddeint` but with adjoint gradients; returns
    ``(solution, y_lags)``."""
    if his_processed:
        y_lags = jnp.asarray(lags)
    else:
        y_lags = history_index(lags, his, his_span, interpolation=interpolation)

    call = _dde_call(func)

    def f_eff(t, y):
        dy = call(t, y, lags, y_lags)
        if not damping:
            return dy
        # leafwise, matching dde_term: pytree DDE states damp per leaf (a
        # bare jnp.asarray(dy) - damping*y crashed on pytree states)
        return jax.tree.map(
            lambda d, yl: jnp.asarray(d) - damping * yl, dy, y
        )

    solution = odeint_adjoint(
        f_eff,
        y0,
        t_span,
        solver,
        rtol=rtol,
        atol=atol,
        options={**(options or {}), "interp": fixed_solver_interp}
        if fixed_solver_interp
        else options,
        adjoint_solver=adjoint_solver,
        adjoint_rtol=adjoint_rtol,
        adjoint_atol=adjoint_atol,
        adjoint_options=adjoint_options,
        time_axis=time_axis,
    )
    return solution, y_lags
