"""Implicit (backward) Euler: A-stability on a stiff problem + order 1."""

import jax.numpy as jnp
import numpy as np

from paddlexde_tpu import odeint


def test_stiff_stability():
    """lambda = -1000, dt = 0.1: implicit stays bounded and accurate at the
    slow manifold; explicit Euler diverges violently (|1+dt*l| = 99)."""
    lam = -1000.0
    f = lambda t, y: lam * (y - jnp.cos(t)) - jnp.sin(t)  # y -> cos(t) fast
    ts = jnp.linspace(0.0, 2.0, 21)
    y_imp = odeint(f, jnp.asarray(1.5), ts, "implicit_euler", time_axis=0)
    assert bool(jnp.all(jnp.isfinite(y_imp)))
    np.testing.assert_allclose(np.asarray(y_imp[-1]), np.cos(2.0), atol=5e-3)

    y_exp = odeint(f, jnp.asarray(1.5), ts, "euler", time_axis=0)
    assert not bool(jnp.all(jnp.abs(y_exp) < 1e3))  # explicit blows up


def test_order_one():
    f = lambda t, y: jnp.cos(t) * y
    exact = float(np.exp(np.sin(2.0)))
    errs = []
    for n in (33, 65, 129):
        y = odeint(f, jnp.ones(()), jnp.linspace(0.0, 2.0, n), "implicit_euler",
                   time_axis=0)
        errs.append(abs(float(y[-1]) - exact))
    order = np.mean([np.log2(errs[i] / errs[i + 1]) for i in range(2)])
    assert abs(order - 1.0) < 0.3, (order, errs)


def test_pytree_state():
    def f(t, y):
        return {"a": -50.0 * y["a"], "b": -0.5 * y["b"]}

    y0 = {"a": jnp.ones((2,)), "b": jnp.full((3,), 2.0)}
    y = odeint(f, y0, jnp.linspace(0.0, 1.0, 11), "implicit_euler", time_axis=0)
    np.testing.assert_allclose(np.asarray(y["b"][-1]), 2 * np.exp(-0.5), rtol=2e-2)
    assert bool(jnp.all(jnp.abs(y["a"]) <= 1.0))
