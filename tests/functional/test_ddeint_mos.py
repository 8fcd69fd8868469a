"""ddeint_mos: TRUE method-of-steps DDEs (``functional/ddeint_mos.py``).

The reference's DDE (and the parity ddeint) reads lags from a FIXED pre-t0
history window (``paddlexde/xde/base_dde.py:33-36``); these tests pin the
classical semantics — the delayed value re-enters the computed solution —
against the textbook closed form, the order of each stepper, the lag
gradients, and the documented semantic difference from ddeint.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paddlexde_tpu as pxt


def _closed(t):
    """y' = -y(t-1), phi == 1: y(t) = sum (-1)^k (t-(k-1))^k / k!."""
    m = int(np.floor(t)) + 1
    return sum(
        (-1) ** k * max(t - (k - 1), 0.0) ** k / math.factorial(k)
        for k in range(m + 1)
    )


F = lambda t, y, y_lags: -y_lags[..., 0, :]
HIS_SPAN = jnp.linspace(-2.0, 0.0, 9)
HIS = jnp.ones((9, 1))
Y0 = jnp.ones((1,))


def test_closed_form_and_stepper_orders():
    ts = jnp.linspace(0.0, 3.0, 7)
    truth = np.array([_closed(float(t)) for t in np.asarray(ts)])

    def err(sv, h):
        sol = pxt.ddeint_mos(F, Y0, ts, [1.0], HIS, HIS_SPAN, solver=sv,
                             step_size=h, time_axis=0)
        return float(jnp.max(jnp.abs(sol[:, 0] - truth)))

    e_eu = [err("euler", h) for h in (0.25, 0.0625)]
    e_mp = [err("midpoint", h) for h in (0.25, 0.0625)]
    assert 0.8 < np.log(e_eu[0] / e_eu[1]) / np.log(4) < 1.3
    assert 1.7 < np.log(e_mp[0] / e_mp[1]) / np.log(4) < 2.3
    # the solution is piecewise-cubic on [0, 3] with breaking points at the
    # integers: rk4 with a lag-aligned grid is EXACT (measured 5.6e-17)
    assert err("rk4", 0.25) < 1e-13
    # unaligned grid: breaking points fall inside steps -> tiny but nonzero
    e4 = err("rk4", 0.3 / 7)
    assert 1e-14 < e4 < 1e-4, e4  # measured 1.5e-5


def test_semantic_difference_vs_history_only_ddeint():
    """ddeint (reference semantics) integrates y' = -phi(t-1) == -1 forever
    (the lag never re-enters the solution): y(2) = -1. The true DDE gives
    y(2) = -0.5. Both pinned so the difference is a documented contract,
    not an accident."""
    ts = jnp.linspace(0.0, 2.0, 5)
    sol_mos = pxt.ddeint_mos(F, Y0, ts, [1.0], HIS, HIS_SPAN,
                             solver="rk4", step_size=0.05, time_axis=0)
    assert abs(float(sol_mos[-1, 0]) - (-0.5)) < 1e-10

    def func_ref(y_lags, y):
        return -y_lags[..., 0:1, :]

    sol_ref, _ = pxt.ddeint(func_ref, jnp.ones((1, 1, 1)), ts,
                            jnp.array([1.0]), jnp.ones((1, 9, 1)),
                            HIS_SPAN, solver="rk4")
    assert abs(float(sol_ref[0, 0, -1, 0]) - (-1.0)) < 1e-5


def test_lag_gradients_match_fd_at_generic_lags():
    """Gradients w.r.t. the lag flow through the Hermite query AND the
    solution's own lag dependence — FD-exact at generic (non-grid-aligned)
    lags; the aligned case sits on the interpolation kink (documented)."""

    def loss(tau):
        sol = pxt.ddeint_mos(F, Y0, jnp.array([0.0, 2.0]), jnp.array([tau]),
                             HIS, HIS_SPAN, solver="rk4", step_size=0.05,
                             time_axis=0)
        return sol[-1, 0]

    for tau in (0.93, 1.17):
        g = float(jax.grad(loss)(tau))
        eps = 1e-5
        fd = float((loss(tau + eps) - loss(tau - eps)) / (2 * eps))
        np.testing.assert_allclose(g, fd, rtol=1e-4)
    # tau in [1, 2]: the continuous sensitivity is dy/dtau = tau - 2. The
    # DISCRETE gradient differs by an O(h) breaking-point smear (measured
    # +0.013 at h=0.1 -> -0.0002 at h=0.00625) — pin convergence at fine h.
    def loss_fine(tau):
        sol = pxt.ddeint_mos(F, Y0, jnp.array([0.0, 2.0]), jnp.array([tau]),
                             HIS, HIS_SPAN, solver="rk4", step_size=0.00625,
                             time_axis=0)
        return sol[-1, 0]

    np.testing.assert_allclose(float(jax.grad(loss_fine)(1.17)), 1.17 - 2.0,
                               atol=1e-3)


def test_multiple_lags_batched_and_self_convergence():
    """Two lags, batched state: coarse rk4 converges to fine rk4."""
    f2 = lambda t, y, y_lags: (-y_lags[..., 0, :] + 0.3 * y_lags[..., 1, :]
                               - 0.1 * y)
    y0 = jnp.array([[1.0, 0.5], [0.8, -0.2]])
    his = jnp.broadcast_to(y0[:, None, :], (2, 9, 2))
    ts = jnp.linspace(0.0, 2.0, 5)
    kw = dict(solver="rk4", time_axis=0)
    fine = pxt.ddeint_mos(f2, y0, ts, [0.7, 1.3], his, HIS_SPAN,
                          step_size=0.01, **kw)
    coarse = pxt.ddeint_mos(f2, y0, ts, [0.7, 1.3], his, HIS_SPAN,
                            step_size=0.1, **kw)
    assert float(jnp.max(jnp.abs(fine - coarse))) < 2e-4


def test_guards():
    ts = jnp.linspace(0.0, 2.0, 5)
    with pytest.raises(ValueError, match="min\\(lags\\)"):
        pxt.ddeint_mos(F, Y0, ts, [0.1], HIS, HIS_SPAN, step_size=0.5)
    with pytest.raises(ValueError, match="his_span must end"):
        pxt.ddeint_mos(F, Y0, ts, [1.0], HIS, HIS_SPAN - 1.0, step_size=0.25)
    with pytest.raises(ValueError, match="euler/midpoint/rk4"):
        pxt.ddeint_mos(F, Y0, ts, [1.0], HIS, HIS_SPAN, solver="dopri5",
                       step_size=0.25)


# --- state-dependent delays (round 3): lags as a callable lags(t, y) -------


def test_state_dependent_delay_manufactured():
    """Manufactured solution y(t) = sin(t)·1: with τ(t, y) = 1.1 +
    0.3·tanh(mean y) (honestly state-dependent — it reads the solution),
    the RHS f = cos(t) + 0.8·(y_lag − sin(t − τ(t, y))) has y = sin as its
    exact solution. rk4 + Hermite buffer reproduce it to ~3e-6 at h=0.1
    over [0, 4] (error is NOT cleanly 4th-order in h — state-dependent
    breaking points move with the grid — so the pin is absolute)."""
    D = 3

    def tau_fn(t, y):
        return jnp.atleast_1d(1.1 + 0.3 * jnp.tanh(jnp.mean(y)))

    def f(t, y, ylags):
        tau = tau_fn(t, y)[0]
        return (jnp.cos(t) * jnp.ones_like(y)
                + 0.8 * (ylags[..., 0, :] - jnp.sin(t - tau)))

    ts_h = jnp.linspace(-2.0, 0.0, 41)
    his = jnp.sin(ts_h)[:, None] * jnp.ones(D)
    y0 = jnp.zeros((D,), jnp.float64)
    ts = jnp.linspace(0.0, 4.0, 9)
    sol = pxt.ddeint_mos(f, y0, ts, tau_fn, his, ts_h, solver="rk4",
                     step_size=0.1, time_axis=0)
    err = float(jnp.max(jnp.abs(sol - jnp.sin(ts)[:, None])))
    assert err < 1e-4, err


def test_state_dependent_constant_matches_static():
    """A constant callable reproduces the static-lag path (1-ulp trace-order
    dust only), and a rank-2 return is rejected loudly."""
    D = 3
    ts_h = jnp.linspace(-2.0, 0.0, 41)
    y0 = jnp.ones((D,), jnp.float64)
    his1 = jnp.ones((41, D), jnp.float64)
    f2 = lambda t, y, ylags: -ylags[..., 0, :]
    ts = jnp.linspace(0.0, 3.0, 7)
    a = pxt.ddeint_mos(f2, y0, ts, lambda t, y: jnp.array([1.3]), his1, ts_h,
                   solver="rk4", step_size=0.1, time_axis=0)
    b = pxt.ddeint_mos(f2, y0, ts, jnp.array([1.3]), his1, ts_h,
                   solver="rk4", step_size=0.1, time_axis=0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-14)

    with pytest.raises(ValueError, match="rank-1"):
        pxt.ddeint_mos(f2, y0, ts, lambda t, y: jnp.ones((2, 2)), his1, ts_h,
                   step_size=0.1)


def test_state_dependent_delay_gradients_and_vmap():
    """Gradients flow through the delay law's parameters (matches central
    FD), and per-element delays batch via vmap-of-solve."""
    D = 3
    ts_h = jnp.linspace(-2.0, 0.0, 41)
    his = jnp.sin(ts_h)[:, None] * jnp.ones(D)
    y0 = jnp.zeros((D,), jnp.float64)
    ts = jnp.linspace(0.0, 4.0, 9)

    def f(t, y, ylags):
        return (jnp.cos(t) * jnp.ones_like(y)
                + 0.8 * (ylags[..., 0, :]
                         - jnp.sin(t - (1.1 + 0.3 * jnp.tanh(jnp.mean(y))))))

    def loss(a):
        tfn = lambda t, y: jnp.atleast_1d(a + 0.3 * jnp.tanh(jnp.mean(y)))
        sol = pxt.ddeint_mos(f, y0, ts, tfn, his, ts_h, solver="rk4",
                         step_size=0.07, time_axis=0)
        return jnp.sum(sol[-1] ** 2)

    a = jnp.float64(1.1)
    g = float(jax.grad(loss)(a))
    eps = 1e-5
    fd = float((loss(a + eps) - loss(a - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-5)

    # vmap-of-solve: per-element delay offsets
    def solve_one(a):
        tfn = lambda t, y: jnp.atleast_1d(a + 0.3 * jnp.tanh(jnp.mean(y)))
        return pxt.ddeint_mos(f, y0, ts, tfn, his, ts_h, solver="rk4",
                          step_size=0.1, time_axis=0)

    offsets = jnp.array([1.0, 1.1, 1.2], jnp.float64)
    batch = jax.vmap(solve_one)(offsets)
    assert batch.shape == (3, 9, D)
    single = solve_one(jnp.float64(1.1))
    np.testing.assert_allclose(np.asarray(batch[1]), np.asarray(single),
                               rtol=1e-12)
