"""cdeint: neural controlled differential equations.

The reference sketched a CDE class but left it broken
(``paddlexde/xde/base_cde.py:20-35`` in DrownFish19/PaddleXDE, SURVEY §2.11-3);
this implements the capability properly with torchcde semantics:

    dy/dt = f(t, y) @ dX/dt,   X = spline-interpolated control path,

so irregular time series enter through the interpolation subsystem's
``derivative()`` and the solve itself is a plain ODE — every solver (fixed,
adaptive, adjoint) applies. The contraction ``[..., D_y, D_x] @ [..., D_x]``
is a batched matvec: MXU work, not gather work.
"""

from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp

from ..interpolation.interpolate import CubicHermiteSpline, InterpolationBase
from ..xde.term import cde_term
from .odeint_adjoint import odeint_adjoint
from .solve import integrate_term

__all__ = ["cdeint"]


def _control_derivative(control: Union[InterpolationBase, tuple]):
    if isinstance(control, InterpolationBase):
        interp = control
    else:
        series, t = control
        interp = CubicHermiteSpline(series, t)

    def d_x(t_eval):
        # [..., 1, D_x] -> [..., D_x] for a scalar query
        return interp.derivative(jnp.reshape(jnp.asarray(t_eval), ()))

    return d_x


def cdeint(
    func,
    y0,
    t_span,
    control,
    solver="dopri5",
    *,
    rtol=1e-7,
    atol=1e-9,
    options: Optional[dict] = None,
    adjoint: bool = False,
    time_axis: int = -2,
    **adjoint_kwargs,
):
    """Integrate a neural CDE.

    Args:
        func: matrix-valued vector field ``func(t, y) -> [..., D_y, D_x]``.
        y0: initial latent state ``[..., D_y]``.
        t_span: output times.
        control: an :class:`InterpolationBase` over the control path X, or a
            ``(series, t)`` pair (interpolated with a cubic Hermite spline).
        adjoint: use O(1)-memory adjoint gradients.
    """
    d_x = _control_derivative(control)

    if adjoint:
        def f_eff(t, y):
            mat = func(t, y)
            return jnp.einsum("...ij,...j->...i", mat, d_x(t))

        return odeint_adjoint(
            f_eff,
            y0,
            t_span,
            solver,
            rtol=rtol,
            atol=atol,
            options=options,
            time_axis=time_axis,
            **adjoint_kwargs,
        )

    term = cde_term(func, d_x)
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
