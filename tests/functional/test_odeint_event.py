"""Event handling: terminal conditions located on the dense output.

Capability beyond the reference (torchdiffeq's odeint_event analogue).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import odeint_event


def test_exponential_threshold_crossing():
    """y' = -y from 1; event y - 0.5 fires at t = ln 2."""
    res = odeint_event(
        lambda t, y: -y, jnp.ones(()), 0.0,
        lambda t, y: y - 0.5, "dopri5", rtol=1e-10, atol=1e-12,
    )
    assert bool(res.event_fired) and int(res.status) == 0
    np.testing.assert_allclose(float(res.t_event), np.log(2.0), rtol=1e-7)
    np.testing.assert_allclose(float(res.y_event), 0.5, rtol=1e-7)


def test_bouncing_ball_impact_time():
    """Free fall from h=10: impact (y=0) at sqrt(2h/g)."""
    g = 9.81

    def f(t, s):
        return jnp.asarray([s[1], -g])

    res = odeint_event(
        f, jnp.asarray([10.0, 0.0]), 0.0,
        lambda t, s: s[0], "dopri5", rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(float(res.t_event), np.sqrt(2 * 10.0 / g), rtol=1e-7)
    # impact velocity -g t*
    np.testing.assert_allclose(
        float(res.y_event[1]), -g * np.sqrt(2 * 10.0 / g), rtol=1e-6
    )


def test_no_event_within_horizon():
    res = odeint_event(
        lambda t, y: -y, jnp.ones(()), 0.0,
        lambda t, y: y + 1.0,  # never crosses (y stays positive)
        "dopri5", t_max=2.0,
    )
    assert not bool(res.event_fired)
    np.testing.assert_allclose(float(res.t_event), 2.0, atol=1e-6)


def test_event_under_jit_and_vmap():
    @jax.jit
    def hit_time(thresh):
        return odeint_event(
            lambda t, y: -y, jnp.ones(()), 0.0,
            lambda t, y: y - thresh, "dopri5", rtol=1e-9, atol=1e-11,
        ).t_event

    np.testing.assert_allclose(float(hit_time(0.25)), np.log(4.0), rtol=1e-6)
    ts = jax.vmap(hit_time)(jnp.asarray([0.5, 0.25, 0.125]))
    np.testing.assert_allclose(
        np.asarray(ts), np.log([2.0, 4.0, 8.0]), rtol=1e-6
    )


def test_requires_adaptive():
    with pytest.raises(ValueError):
        odeint_event(lambda t, y: -y, jnp.ones(()), 0.0, lambda t, y: y, "rk4")


def test_event_time_gradients_closed_form():
    """y' = -a y, event y - c: t* = ln(1/c)/a, dt*/da = -t*/a, dt*/dc = -1/(a c)."""
    from paddlexde_tpu.functional.odeint_event import odeint_event_grad

    a0, c0 = 1.3, 0.4

    def t_star(a, c):
        return odeint_event_grad(
            lambda t, y: -a * y, jnp.ones(()), 0.0, lambda t, y: y - c,
            "dopri5",
        ).t_event

    t_expect = np.log(1 / c0) / a0
    np.testing.assert_allclose(float(t_star(a0, c0)), t_expect, rtol=1e-6)
    g_a = jax.grad(t_star, argnums=0)(a0, c0)
    g_c = jax.grad(t_star, argnums=1)(a0, c0)
    np.testing.assert_allclose(float(g_a), -t_expect / a0, rtol=1e-5)
    np.testing.assert_allclose(float(g_c), -1.0 / (a0 * c0), rtol=1e-5)


def test_event_state_gradients():
    """Ballistic impact: d(v_impact)/dh = -g/sqrt(2 g h) · ... vs FD."""
    from paddlexde_tpu.functional.odeint_event import odeint_event_grad

    g = 9.81

    def v_impact(h):
        res = odeint_event_grad(
            lambda t, s: jnp.asarray([s[1], -g]),
            jnp.asarray([h, 0.0]), 0.0, lambda t, s: s[0], "dopri5",
        )
        return res.y_event[1]

    h0 = 10.0
    grad = jax.grad(v_impact)(h0)
    eps = 1e-4
    fd = (v_impact(h0 + eps) - v_impact(h0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(grad), float(fd), rtol=1e-4)
    # closed form: v = -sqrt(2 g h) => dv/dh = -g/sqrt(2 g h)
    np.testing.assert_allclose(float(grad), -g / np.sqrt(2 * g * h0), rtol=1e-4)
