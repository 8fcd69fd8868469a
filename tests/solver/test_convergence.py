"""Empirical convergence-order sweeps (SURVEY §4 rebuild test plan).

Halving dt must shrink the error by ~2^order. This is the test that catches
transcription slips in tableaus and step functions (it found the reference's
rk4_alt stage-coefficient swap, see ``solver/fixed.py`` docstring).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import odeint


def _order_estimate(method, n_values, options=None):
    """Fit the empirical order on y' = cos(t) y over [0, 2]."""
    f = lambda t, y: jnp.cos(t) * y
    exact = float(np.exp(np.sin(2.0)))
    errs = []
    for n in n_values:
        ts = jnp.linspace(0.0, 2.0, n)
        y = odeint(f, jnp.ones(()), ts, method, time_axis=0, options=options)
        errs.append(abs(float(y[-1]) - exact))
    orders = [
        np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)
    ]
    return float(np.mean(orders)), errs


@pytest.mark.parametrize(
    "method,expected",
    [("euler", 1), ("midpoint", 2), ("rk4", 4)],
)
def test_fixed_solver_orders(method, expected):
    order, errs = _order_estimate(method, [17, 33, 65, 129])
    assert abs(order - expected) < 0.35, (method, order, errs)


def test_explicit_adams_order4():
    # finer grids: the RK4 bootstrap steps must be asymptotically negligible
    order, errs = _order_estimate("explicit_adams", [65, 129, 257])
    assert order > 3.3, (order, errs)


def test_implicit_adams_high_order():
    order, errs = _order_estimate("implicit_adams", [33, 65, 129])
    assert order > 3.5, (order, errs)
