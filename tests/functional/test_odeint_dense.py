"""odeint_dense: one adaptive pass -> a callable DenseSolution.

Pinned: arbitrary-time evaluation accuracy (the interpolant's own 4th order
between knots — max_step caps it), agreement with the buffered-dense grid
path, derivative == f(t, y(t)) at interpolant order, differentiation through
the evaluation time, jit/pytree crossing, clamping, and the refusals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import odeint, odeint_dense


def _exp_sol(**opts):
    f = lambda t, y: y
    y0 = jnp.ones((3,), jnp.float64)
    return odeint_dense(f, y0, jnp.array([0.0, 2.0]), "dopri5",
                        rtol=1e-8, atol=1e-10, options=opts or None)


def test_dense_arbitrary_time_accuracy():
    """Between-knot error is the quartic interpolant's O(h^4), so capping
    max_step tightens it: free steps ~1e-3 rel on y'=y over [0,2];
    max_step=0.05 pins 1e-7."""
    ts = jnp.array([0.0, 0.137, 0.5, 1.234567, 1.999, 2.0], jnp.float64)
    exact = jnp.exp(ts)[:, None] * jnp.ones(3)

    sol = _exp_sol()
    rel = float(jnp.max(jnp.abs(sol(ts) - exact) / exact))
    assert rel < 5e-3, rel

    sol_fine = _exp_sol(max_step=0.05)
    rel_fine = float(jnp.max(jnp.abs(sol_fine(ts) - exact) / exact))
    assert rel_fine < 1e-7, rel_fine

    # exact left endpoint; clamping beyond the span
    np.testing.assert_allclose(np.asarray(sol(0.0)), 1.0, rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(sol(2.5)), np.asarray(sol(2.0)),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sol(-1.0)), np.asarray(sol(0.0)),
                               rtol=1e-12)


def test_dense_matches_grid_path():
    """sol(t_span) agrees with odeint's buffered-dense engine output (same
    recorded buffers, same Horner evaluation)."""
    f = lambda t, y: jnp.sin(y) - 0.3 * y
    y0 = jnp.asarray([0.5, 1.5], jnp.float64)
    ts = jnp.linspace(0.0, 4.0, 37)
    grid = odeint(f, y0, ts, "dopri5", options={"max_steps": 256},
                  time_axis=0)
    sol = odeint_dense(f, y0, ts, "dopri5", options={"max_steps": 256})
    np.testing.assert_allclose(np.asarray(sol(ts)), np.asarray(grid),
                               rtol=1e-12, atol=1e-14)


def test_dense_derivative_and_grad_through_time():
    sol = _exp_sol(max_step=0.05)
    t1 = jnp.float64(0.7)
    d = sol.derivative(t1)
    np.testing.assert_allclose(np.asarray(d), np.exp(0.7), rtol=1e-6)
    g = jax.grad(lambda t: sol(t)[0])(t1)
    np.testing.assert_allclose(float(g), np.exp(0.7), rtol=1e-6)
    # vectorized derivative
    ts = jnp.array([0.3, 1.1], jnp.float64)
    np.testing.assert_allclose(np.asarray(sol.derivative(ts)),
                               np.exp(np.asarray(ts))[:, None] * np.ones(3),
                               rtol=1e-6)


def test_dense_pytree_jit_and_state():
    f = lambda t, y: {"a": y["b"], "b": -y["a"]}
    y0 = {"a": jnp.ones((), jnp.float64), "b": jnp.zeros((), jnp.float64)}
    sol, stats = odeint_dense(f, y0, jnp.array([0.0, np.pi]),
                              options={"return_stats": True,
                                       "max_steps": 256})
    assert int(stats.status) == 0

    @jax.jit
    def eval_at(s, t):
        return s(t)["a"]

    np.testing.assert_allclose(float(eval_at(sol, jnp.float64(np.pi))),
                               -1.0, atol=1e-6)
    leaves, treedef = jax.tree.flatten(sol)
    sol2 = jax.tree.unflatten(treedef, leaves)
    np.testing.assert_allclose(float(sol2(1.0)["a"]), float(sol(1.0)["a"]))


def test_dense_refusals():
    f = lambda t, y: y
    y0 = jnp.ones(())
    with pytest.raises(ValueError, match="non-degenerate"):
        odeint_dense(f, y0, jnp.array([1.0, 1.0]))
    with pytest.raises(ValueError, match="adaptive"):
        odeint_dense(f, y0, jnp.array([0.0, 1.0]), "rk4")
    with pytest.raises(ValueError, match="unknown option"):
        odeint_dense(f, y0, jnp.array([0.0, 1.0]),
                     options={"step_t": jnp.array([0.5])})


def test_dense_reversed_span():
    """A decreasing span solves the reversed system over s = −t; the
    returned object maps queries and d/dt through the substitution.
    y' = y from y(2) = 1 backward: y(t) = e^{t−2} at arbitrary t."""
    f = lambda t, y: y
    sol = odeint_dense(f, jnp.ones((2,), jnp.float64),
                       jnp.array([2.0, 0.0]), options={"max_step": 0.05})
    ts = np.array([2.0, 1.3, 0.5, 0.0])
    for t in ts:
        np.testing.assert_allclose(float(sol(jnp.float64(t))[0]),
                                   np.exp(t - 2.0), rtol=1e-7)
    d = float(sol.derivative(jnp.float64(1.3))[0])
    g = float(jax.grad(lambda t: sol(t)[0])(jnp.float64(1.3)))
    np.testing.assert_allclose(d, np.exp(1.3 - 2.0), rtol=1e-6)
    np.testing.assert_allclose(g, np.exp(1.3 - 2.0), rtol=1e-6)
    # the user-time interval reports in the given orientation; queries
    # beyond it clamp
    lo, hi = sol.interval
    assert float(lo) == 2.0 and float(hi) == 0.0
    np.testing.assert_allclose(np.asarray(sol(-1.0)), np.asarray(sol(0.0)),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sol(3.0)), np.asarray(sol(2.0)),
                               rtol=1e-12)


def test_dense_boundary_gradients_and_traced_span():
    """Review regressions: (a) d/dt at EXACTLY t_lo / t_end equals the
    interpolant's derivative (jnp.clip's tie subgradient halved it; the
    y0 endpoint correction rides under stop_gradient); (b) a TRACED span
    raises instead of silently returning the zero-coefficient init."""
    f = lambda t, y: y
    sol = odeint_dense(f, jnp.ones((2,), jnp.float64),
                       jnp.array([0.0, 1.0]), options={"max_step": 0.05})
    for t in (0.0, 1.0):
        g = float(jax.grad(lambda tt: sol(tt)[0])(jnp.float64(t)))
        np.testing.assert_allclose(g, np.exp(t), rtol=1e-5)

    with pytest.raises(ValueError, match="concrete t_span"):
        jax.jit(
            lambda ts: odeint_dense(f, jnp.ones(2), ts)(ts[-1])
        )(jnp.array([1.0, 0.0]))
