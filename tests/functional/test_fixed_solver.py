"""Fixed-solver accuracy vs closed-form solutions.

Accuracy bar from the reference suite: allclose rtol 1e-2 against the exact
constant-ODE solution (``tests/functional/test_fixed_solver.py:22-44`` in
DrownFish19/PaddleXDE), extended with pytree states, reverse time, step_size
grids, and dense-output modes the reference never tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import Euler, Midpoint, RK4, odeint

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from testing_utils import construct_problem  # noqa: E402

SOLVERS = {"euler": Euler, "midpoint": Midpoint, "rk4": RK4}


@pytest.mark.parametrize("name", ["euler", "midpoint", "rk4"])
def test_constant_problem(name):
    f, y0, t_points, sol = construct_problem(ode="constant")
    y = odeint(f, y0, t_points, SOLVERS[name])
    assert y.shape == sol.shape  # time on axis -2
    np.testing.assert_allclose(y, sol, rtol=1e-2)


@pytest.mark.parametrize("name", ["midpoint", "rk4"])
def test_sine_problem_dense_grid(name):
    f, y0, t_points, sol = construct_problem(npts=200, ode="sine")
    y = odeint(f, y0, t_points, SOLVERS[name])
    np.testing.assert_allclose(y, sol, rtol=1e-2, atol=1e-2)


def test_string_solver_names():
    f, y0, t_points, sol = construct_problem(ode="constant")
    y = odeint(f, y0, t_points, "rk4")
    np.testing.assert_allclose(y, sol, rtol=1e-2)


def test_reverse_time():
    f, y0, t_points, sol = construct_problem(npts=50, ode="sine", reverse=True)
    y = odeint(f, y0, t_points, RK4)
    np.testing.assert_allclose(y, sol, rtol=1e-2, atol=1e-2)


def test_pytree_state():
    """States may be arbitrary pytrees — no flatten/unflatten layer."""

    def f(t, y):
        return {"a": -y["a"], "b": 0.5 * y["b"]}

    y0 = {"a": jnp.ones((2, 3)), "b": jnp.full((4,), 2.0)}
    t = jnp.linspace(0.0, 1.0, 21)
    y = odeint(f, y0, t, RK4)
    assert y["a"].shape == (2, 21, 3)  # time at axis -2
    assert y["b"].shape == (21, 4)  # 1-D leaves stay time-first
    np.testing.assert_allclose(y["a"][:, -1], np.ones((2, 3)) * np.exp(-1.0), rtol=1e-5)
    np.testing.assert_allclose(y["b"][-1], 2.0 * np.exp(0.5), rtol=1e-5)


def test_step_size_grid_with_dense_output():
    f, y0, t_points, sol = construct_problem(npts=10, ode="sine")
    for interp in ("linear", "cubic"):
        y = odeint(f, y0, t_points, RK4, options={"step_size": 0.01, "interp": interp})
        np.testing.assert_allclose(y, sol, rtol=1e-2, atol=1e-2)


def test_jit_and_grad_through_scan():
    """Direct backprop through the scan must work (baseline for adjoint tests)."""

    def loss(a):
        f = lambda t, y: a * y
        y = odeint(f, jnp.ones(()), jnp.linspace(0.0, 1.0, 41), RK4, time_axis=0)
        return y[-1]

    g = jax.jit(jax.grad(loss))(0.5)
    # d/da exp(a) at a=0.5 = exp(0.5)
    np.testing.assert_allclose(g, np.exp(0.5), rtol=1e-6)


def test_float32_smoke():
    with jax.enable_x64(False):
        f, y0, t_points, sol = construct_problem(npts=40, ode="sine", dtype=jnp.float32)
        y = odeint(f, y0, t_points, RK4)
        assert y.dtype == jnp.float32
        np.testing.assert_allclose(y, sol, rtol=5e-2, atol=5e-2)


def test_custom_step_function_through_odeint():
    """Power-user path: a custom fixed-step callable
    ``step(term, t0, t1, y0) -> (y1, dy0)`` passed as ``solver`` — e.g. a
    preconditioned Krylov stepper — goes straight through odeint, including
    reversed spans; adaptive-only options are rejected with a clear error."""
    import pytest as _pytest

    from paddlexde_tpu.solver.fixed import rk4_step

    f = lambda t, y: jnp.cos(t) * y
    ts = jnp.linspace(0.0, 2.0, 33)
    y_custom = odeint(f, jnp.ones(()), ts, rk4_step, time_axis=0)
    y_named = odeint(f, jnp.ones(()), ts, "rk4", time_axis=0)
    np.testing.assert_allclose(np.asarray(y_custom), np.asarray(y_named))

    y_rev = odeint(f, jnp.ones(()), ts[::-1], rk4_step, time_axis=0)
    assert bool(jnp.all(jnp.isfinite(y_rev)))

    with _pytest.raises(ValueError):
        odeint(f, jnp.ones(()), ts, rk4_step, options={"max_steps": 8},
               time_axis=0)
