"""sdirk4 — Hairer–Wanner's 5-stage SDIRK (γ=1/4): adaptive L-stable order 4.

Tops out the stiff-adaptive ladder (kvaerno3 order 3, trbdf2 order 2). The
first stage is IMPLICIT (diag[0] = γ, abscissa c1 = γ) — also pins the
engine's SDIRK stage-0 Newton path. Pinned: the eight order-4 conditions
and stiff accuracy algebraically, L-stability, the derived embedded
order-3(-not-4) weights and θ=1/2 interpolant, measured convergence ~4,
Robertson vs a tight Radau reference with adaptive dt, transient crushing
at λdt = -1e8, and the buffered-dense engine.
"""

import math

import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

import paddlexde_tpu as pxt
from paddlexde_tpu.solver.tableaus import SDIRK4


def _abc():
    tab = SDIRK4
    a = np.zeros((5, 5))
    for i in range(4):
        a[i + 1, : i + 1] = tab.beta[i][: i + 1]
    np.fill_diagonal(a, tab.diag)
    return a, tab.c_sol, a.sum(1)


def test_sdirk4_tableau_algebra():
    a, b, c = _abc()
    np.testing.assert_allclose(c, [0.25, 0.75, 0.55, 0.5, 1.0], atol=1e-14)
    np.testing.assert_allclose(np.concatenate([SDIRK4.alpha]), c[1:], atol=1e-14)
    ac = a @ c
    for got, want in [
        (b.sum(), 1.0), (b @ c, 1 / 2), (b @ c**2, 1 / 3), (b @ ac, 1 / 6),
        (b @ c**3, 1 / 4), (b @ (c * ac), 1 / 8),
        (b @ (a @ c**2), 1 / 12), (b @ (a @ ac), 1 / 24),
    ]:
        np.testing.assert_allclose(got, want, atol=1e-12)
    np.testing.assert_allclose(a[4], b, atol=1e-14)  # stiffly accurate
    # L-stable: R(-inf) = 1 - b A^{-1} 1 = 0, and |R| < 1 deep on the axis
    np.testing.assert_allclose(
        1 - b @ np.linalg.solve(a, np.ones(5)), 0.0, atol=1e-12
    )
    r = 1 + (-1e8) * b @ np.linalg.solve(np.eye(5) + 1e8 * a, np.ones(5))
    assert abs(r) < 1e-6, r
    # embedded: order 3, genuinely not 4
    bh = b - SDIRK4.c_error
    for got, want in [(bh.sum(), 1.0), (bh @ c, 1 / 2), (bh @ c**2, 1 / 3),
                      (bh @ ac, 1 / 6)]:
        np.testing.assert_allclose(got, want, atol=1e-12)
    assert abs(bh @ c**3 - 1 / 4) > 1e-3
    # midpoint interpolant: third-order conditions at theta = 1/2
    m = SDIRK4.c_mid
    for got, want in [(m.sum(), 0.5), (m @ c, 0.125), (m @ c**2, 1 / 24),
                      (m @ ac, 1 / 48)]:
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_sdirk4_convergence_order():
    f = lambda t, y: jnp.stack([y[1], -y[0]])
    y0 = jnp.asarray([1.0, 0.0])

    def err(h):
        s = pxt.odeint(
            f, y0, jnp.asarray([0.0, 3.0]), "sdirk4", time_axis=0,
            options={"min_step": h, "max_step": h, "first_step": h,
                     "newton_iters": 10},
        )
        return float(jnp.abs(s[-1, 0] - math.cos(3.0)))

    e_c, e_f = err(0.1), err(0.05)
    order = np.log2(e_c / e_f)
    assert order > 3.5, (order, e_c, e_f)


def test_sdirk4_robertson_adaptive():
    def rob_np(t, y):
        return [
            -0.04 * y[0] + 1e4 * y[1] * y[2],
            0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
            3e7 * y[1] ** 2,
        ]

    truth = solve_ivp(rob_np, (0.0, 100.0), [1.0, 0.0, 0.0], method="Radau",
                      rtol=1e-10, atol=1e-14).y[:, -1]

    def rob(t, y):
        return jnp.stack([
            -0.04 * y[0] + 1e4 * y[1] * y[2],
            0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
            3e7 * y[1] ** 2,
        ])

    ts = jnp.asarray([0.0, 1.0, 10.0, 100.0])
    sol, stats = pxt.odeint(
        rob, jnp.asarray([1.0, 0.0, 0.0]), ts, "sdirk4",
        rtol=1e-7, atol=1e-10, time_axis=0,
        # Robertson at this rtol takes ~660 accepted steps — past the
        # direct-grad recorder's default 512 buffer. The overflow must NOT
        # surface in status (gradient-quality warning, not solve health):
        # status==0 on the DEFAULT buffer is the regression pin
        options={"return_stats": True, "newton_iters": 8},
    )
    assert int(stats.status) == 0
    assert int(stats.n_accept) < 2000
    # measured 7.6e-6 worst rel (y2 ~ 6e-6 absolute) at rtol 1e-7 — the
    # derived least-norm embedded estimator is a touch looser than kvaerno3's
    np.testing.assert_allclose(np.asarray(sol[-1]), truth, rtol=2e-5)


def test_sdirk4_l_stable_transient():
    lam = -1e8
    f = lambda t, y: lam * y
    sol = pxt.odeint(
        f, jnp.asarray([1.0]), jnp.asarray([0.0, 1.0]), "sdirk4",
        time_axis=0,
        options={"min_step": 1.0, "max_step": 1.0, "first_step": 1.0,
                 "newton_iters": 10},
    )
    assert abs(float(sol[-1, 0])) < 1e-4


def test_sdirk4_dense_engine():
    f = lambda t, y: -50.0 * (y - jnp.sin(t))
    ts = jnp.linspace(0.0, 2.0, 33)
    y, stats = pxt.odeint(
        f, jnp.asarray([0.0]), ts, "sdirk4", rtol=1e-6, atol=1e-9,
        time_axis=0, options={"return_stats": True, "max_steps": 256},
    )
    assert int(stats.status) == 0
    exact = (50.0**2 * np.sin(np.asarray(ts)) - 50.0 * np.cos(np.asarray(ts))
             + 50.0 * np.exp(-50.0 * np.asarray(ts))) / (1 + 50.0**2)
    np.testing.assert_allclose(np.asarray(y[:, 0]), exact, atol=2e-4)


def test_sdirk4_adjoint_gradient():
    """odeint_adjoint composes with the SDIRK tableau (fully implicit
    adjoint through the implicit first stage too)."""
    import jax

    def loss(y0):
        s = pxt.odeint_adjoint(
            lambda t, y: jnp.cos(t) * y, y0, jnp.asarray([0.0, 2.0]),
            "sdirk4", time_axis=0,
        )
        return s[-1]

    g = jax.grad(loss)(jnp.asarray(1.3))
    np.testing.assert_allclose(float(g), math.exp(math.sin(2.0)), rtol=1e-5)


def test_failed_adjoint_backward_poisons_gradients():
    """A backward solve that cannot finish (here: starved of steps via
    adjoint_options max_num_steps) must return NaN gradients, not a
    silently truncated adjoint (found on-chip: an f32 dt-underflowing
    sdirk4 backward returned 0.92 where 2.48 was exact)."""
    import jax

    def loss(y0):
        s = pxt.odeint_adjoint(
            lambda t, y: jnp.cos(t) * y, y0, jnp.asarray([0.0, 2.0]),
            "dopri5", time_axis=0,
            adjoint_options={"max_num_steps": 2},
        )
        return s[-1]

    g = jax.grad(loss)(jnp.asarray(1.3))
    assert bool(jnp.isnan(g)), float(g)

    # multi-output span exercises the single-pass backward's check too
    def loss_mp(y0):
        s = pxt.odeint_adjoint(
            lambda t, y: jnp.cos(t) * y, y0, jnp.linspace(0.0, 2.0, 5),
            "dopri5", time_axis=0,
            adjoint_options={"max_num_steps": 2},
        )
        return s[-1]

    g = jax.grad(loss_mp)(jnp.asarray(1.3))
    assert bool(jnp.isnan(g)), float(g)


def test_sdirk4_beats_kvaerno3_at_equal_grid():
    """Order 4 vs 3: at the same fixed step the error must be clearly lower."""
    f = lambda t, y: jnp.cos(t) * y
    exact = math.exp(math.sin(3.0))
    errs = {}
    for name in ("sdirk4", "kvaerno3"):
        s = pxt.odeint(
            f, jnp.ones(()), jnp.asarray([0.0, 3.0]), name, time_axis=0,
            options={"min_step": 0.1, "max_step": 0.1, "first_step": 0.1,
                     "newton_iters": 12},
        )
        errs[name] = abs(float(s[-1]) - exact)
    assert errs["sdirk4"] < errs["kvaerno3"] / 3, errs
