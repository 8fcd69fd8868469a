"""Gradient-correctness tests for the adjoint path.

The reference never gradchecked its adjoint (SURVEY §4 coverage gaps); here the
adjoint is held to three independent truths: direct backprop-through-scan,
finite differences, and closed-form derivatives — for fixed AND adaptive
solvers, y0 / parameter / t_span cotangents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import RK4, odeint, odeint_adjoint

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from testing_utils import construct_problem  # noqa: E402


def _exp_loss(method, use_adjoint, a, t_end=1.0):
    fn = odeint_adjoint if use_adjoint else odeint

    def loss(a_):
        f = lambda t, y: a_ * y
        y = fn(f, jnp.ones(()), jnp.linspace(0.0, t_end, 5), method, time_axis=0)
        return y[-1]

    return loss(a), jax.grad(loss)(a)


@pytest.mark.parametrize("method", ["rk4", "dopri5", "bosh3"])
def test_closure_param_grad_closed_form(method):
    """d/da [exp(a t)] = t exp(a t): parameters discovered via closure."""
    a = jnp.asarray(0.7)
    val, grad = _exp_loss(method, use_adjoint=True, a=a)
    # rk4 on a 5-point grid carries ~dt^4 truncation error; the continuous
    # adjoint re-integrates backward with the same solver, so its gradient is
    # an approximation at that solver's order (not exact like direct backprop).
    # bosh3's dense-output midpoint (c_mid) is only O(dt^3), which bounds
    # accuracy at requested times inside steps — reference-parity behavior.
    val_tol = {"rk4": 2e-5, "dopri5": 1e-6, "bosh3": 1e-4}[method]
    grad_tol = {"rk4": 1e-4, "dopri5": 1e-5, "bosh3": 3e-4}[method]
    np.testing.assert_allclose(val, np.exp(0.7), rtol=val_tol)
    np.testing.assert_allclose(grad, np.exp(0.7), rtol=grad_tol)


def test_forward_value_matches_odeint():
    f, y0, t_points, _ = construct_problem(ode="sine")
    y_direct = odeint(f, y0, t_points, "dopri5", rtol=1e-8, atol=1e-10)
    y_adj = odeint_adjoint(f, y0, t_points, "dopri5", rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(y_adj, y_direct, rtol=1e-10)


def test_adjoint_vs_direct_backprop_rk4():
    """Adjoint grads vs plain backprop-through-scan on an MLP vector field."""
    rng = np.random.RandomState(0)
    params = {
        "w1": jnp.asarray(rng.randn(2, 16) * 0.3),
        "b1": jnp.zeros(16),
        "w2": jnp.asarray(rng.randn(16, 2) * 0.3),
    }
    y0 = jnp.array([1.0, -0.5])
    ts = jnp.linspace(0.0, 1.0, 9)

    def make_loss(fn):
        def loss(p):
            f = lambda t, y: jnp.tanh(y @ p["w1"] + p["b1"]) @ p["w2"]
            y = fn(f, y0, ts, RK4, time_axis=0)
            return jnp.sum(y**2) + jnp.mean(jnp.abs(y[-1]))

        return loss

    g_direct = jax.grad(make_loss(odeint))(params)
    g_adjoint = jax.grad(make_loss(odeint_adjoint))(params)
    for k in params:
        np.testing.assert_allclose(g_adjoint[k], g_direct[k], rtol=2e-4, atol=1e-7)


def test_adjoint_vs_finite_differences_dopri5():
    y0 = jnp.array([1.3, -0.4])
    ts = jnp.linspace(0.0, 1.5, 4)
    w = jnp.asarray([[-0.3, 1.1], [-1.1, -0.3]])

    def loss(y0_, w_):
        f = lambda t, y: y @ w_
        y = odeint_adjoint(f, y0_, ts, "dopri5", rtol=1e-9, atol=1e-11, time_axis=0)
        return jnp.sum(jnp.sin(y[-1]))

    g_y0, g_w = jax.grad(loss, argnums=(0, 1))(y0, w)

    eps = 1e-6
    for idx in range(2):
        e = jnp.zeros(2).at[idx].set(eps)
        fd = (loss(y0 + e, w) - loss(y0 - e, w)) / (2 * eps)
        np.testing.assert_allclose(g_y0[idx], fd, rtol=1e-4, atol=1e-7)
    for i in range(2):
        for j in range(2):
            e = jnp.zeros((2, 2)).at[i, j].set(eps)
            fd = (loss(y0, w + e) - loss(y0, w - e)) / (2 * eps)
            np.testing.assert_allclose(g_w[i, j], fd, rtol=1e-4, atol=1e-7)


def test_t_span_gradient():
    """dL/dt_i = <grad_y_i, f(t_i, y_i)> for the terminal output."""
    a = 0.8

    def loss(ts_):
        f = lambda t, y: a * y
        y = odeint_adjoint(f, jnp.ones(()), ts_, "dopri5", rtol=1e-10, atol=1e-12, time_axis=0)
        return y[-1]

    ts = jnp.linspace(0.0, 1.0, 4)
    g_ts = jax.grad(loss)(ts)
    # y(t_end) = exp(a t_end); d/dt_end = a exp(a t_end)
    np.testing.assert_allclose(g_ts[-1], a * np.exp(a), rtol=1e-5)
    # d/dt_0: shifting the start with fixed y0 changes the solution by -f(t0,y0)
    # propagated: for autonomous linear f, dL/dt0 = -a exp(a)
    np.testing.assert_allclose(g_ts[0], -a * np.exp(a), rtol=1e-4)


def test_seminorm_option():
    f, y0, t_points, _ = construct_problem(ode="sine")

    def loss(y0_):
        y = odeint_adjoint(
            f,
            y0_,
            t_points,
            "dopri5",
            adjoint_options={"norm": "seminorm"},
        )
        return jnp.sum(y)

    g = jax.grad(loss)(y0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_pytree_state_adjoint():
    def f(t, y):
        return {"a": -y["a"], "b": 0.5 * y["b"]}

    def loss(y0_):
        y = odeint_adjoint(f, y0_, jnp.linspace(0.0, 1.0, 5), RK4, time_axis=0)
        return jnp.sum(y["a"][-1]) + jnp.sum(y["b"][-1])

    y0 = {"a": jnp.ones((2,)), "b": jnp.full((3,), 2.0)}
    g = jax.grad(loss)(y0)
    # rk4 continuous-adjoint gradient is order-4 approximate at dt=0.25
    np.testing.assert_allclose(g["a"], np.exp(-1.0), rtol=1e-4)
    np.testing.assert_allclose(g["b"], np.exp(0.5), rtol=1e-4)


def test_adjoint_solver_override():
    f, y0, t_points, _ = construct_problem(ode="sine")

    def loss(y0_):
        y = odeint_adjoint(
            f, y0_, t_points, "dopri5", adjoint_solver="bosh3", adjoint_rtol=1e-6, adjoint_atol=1e-8
        )
        return jnp.sum(y)

    g = jax.grad(loss)(y0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_adjoint_decreasing_span():
    """Reverse-time primal + adjoint gradients vs direct backprop."""
    ts = jnp.linspace(1.0, 0.0, 9)  # decreasing

    def make_loss(fn):
        def loss(a):
            y = fn(lambda t, y: a * y, jnp.ones(()), ts, "rk4", time_axis=0)
            return y[-1]  # y at t=0 starting from y(1)=1 => exp(-a)
        return loss

    v = make_loss(odeint)(0.6)
    np.testing.assert_allclose(v, np.exp(-0.6), rtol=1e-5)
    g_direct = jax.grad(make_loss(odeint))(0.6)
    g_adj = jax.grad(make_loss(odeint_adjoint))(0.6)
    np.testing.assert_allclose(g_adj, g_direct, rtol=1e-3)


def test_adjoint_pytree_adaptive_single_pass():
    """Pytree state through dopri5 adjoint (the single-pass backward path),
    validated against finite differences (direct backprop through the
    adaptive while_loop is impossible by construction)."""
    def f(t, y):
        return {"a": -y["a"] + 0.1 * y["b"].sum(), "b": 0.5 * y["b"]}

    ts = jnp.linspace(0.0, 1.0, 7)
    y0 = {"a": jnp.ones((2,)), "b": jnp.full((3,), 2.0)}

    def loss(y0_):
        y = odeint_adjoint(f, y0_, ts, "dopri5", rtol=1e-9, atol=1e-11, time_axis=0)
        return jnp.sum(y["a"][-1] ** 2) + jnp.sum(y["b"][-1])

    g_adj = jax.grad(loss)(y0)
    eps = 1e-5
    for key, idx in (("a", 0), ("a", 1), ("b", 0), ("b", 2)):
        e = jax.tree.map(jnp.zeros_like, y0)
        e[key] = e[key].at[idx].set(eps)
        up = jax.tree.map(jnp.add, y0, e)
        dn = jax.tree.map(jnp.subtract, y0, e)
        fd = (loss(up) - loss(dn)) / (2 * eps)
        np.testing.assert_allclose(g_adj[key][idx], fd, rtol=1e-4, atol=1e-7)
