"""Tsitouras 5(4): the modern default explicit pair (capability beyond the
reference's adaptive zoo, ``paddlexde/solver/adaptive_solver/*``).

Pins: all 17 order-5 conditions + the 8 embedded order-4 conditions
algebraically (a transcription slip in any coefficient breaks one), the
FSAL structure, the derived 4th-order midpoint weights, measured convergence
order ~5 on a fixed grid, adaptive accuracy vs dopri5 at equal tolerance,
and the dense-output engine.
"""

import math

import jax.numpy as jnp
import numpy as np

import paddlexde_tpu as pxt
from paddlexde_tpu.solver.tableaus import TSIT5


def _abc():
    tab = TSIT5
    s = tab.n_stages
    c = np.concatenate([[0.0], tab.alpha])
    a = np.zeros((s, s))
    for i in range(s - 1):
        a[i + 1, : i + 1] = tab.beta[i][: i + 1]
    return a, tab.c_sol, c


def test_tsit5_order5_conditions():
    a, b, c = _abc()
    ac = a @ c
    # row-sum consistency catches single-entry typos directly
    np.testing.assert_allclose(a.sum(1), c, atol=1e-14)
    conds = [
        (b.sum(), 1.0), (b @ c, 1 / 2), (b @ c**2, 1 / 3), (b @ ac, 1 / 6),
        (b @ c**3, 1 / 4), (b @ (c * ac), 1 / 8), (b @ (a @ c**2), 1 / 12),
        (b @ (a @ ac), 1 / 24),
        (b @ c**4, 1 / 5), (b @ (c**2 * ac), 1 / 10), (b @ (ac * ac), 1 / 20),
        (b @ (c * (a @ c**2)), 1 / 15), (b @ (c * (a @ ac)), 1 / 30),
        (b @ (a @ (c * ac)), 1 / 40), (b @ (a @ c**3), 1 / 20),
        (b @ (a @ (a @ c**2)), 1 / 60), (b @ (a @ (a @ ac)), 1 / 120),
    ]
    for got, want in conds:
        np.testing.assert_allclose(got, want, atol=1e-13)


def test_tsit5_embedded_order4_not_5():
    a, b, c = _abc()
    ac = a @ c
    bh = b - TSIT5.c_error
    for got, want in [
        (bh.sum(), 1.0), (bh @ c, 1 / 2), (bh @ c**2, 1 / 3), (bh @ ac, 1 / 6),
        (bh @ c**3, 1 / 4), (bh @ (c * ac), 1 / 8),
        (bh @ (a @ c**2), 1 / 12), (bh @ (a @ ac), 1 / 24),
    ]:
        np.testing.assert_allclose(got, want, atol=1e-13)
    # must FAIL order 5 (or the error estimate would vanish on smooth flows)
    assert abs(bh @ c**4 - 1 / 5) > 1e-5


def test_tsit5_fsal_and_midpoint():
    a, b, c = _abc()
    assert TSIT5.fsal
    np.testing.assert_allclose(a[-1], b, atol=1e-15)
    # derived midpoint weights satisfy the order-4 interpolation conditions
    ac = a @ c
    m = TSIT5.c_mid
    th = 0.5
    for got, want in [
        (m.sum(), th), (m @ c, th**2 / 2), (m @ c**2, th**3 / 3),
        (m @ ac, th**3 / 6), (m @ c**3, th**4 / 4), (m @ (c * ac), th**4 / 8),
        (m @ (a @ c**2), th**4 / 12), (m @ (a @ ac), th**4 / 24),
    ]:
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_tsit5_convergence_order5():
    """Fixed grid through the adaptive engine: measured slope ~5."""
    f = lambda t, y: jnp.cos(t) * y
    exact = math.exp(math.sin(3.0))

    def err(h):
        s = pxt.odeint(
            f, jnp.ones(()), jnp.asarray([0.0, 3.0]), "tsit5", time_axis=0,
            options={"min_step": h, "max_step": h, "first_step": h},
        )
        return abs(float(s[-1]) - exact)

    e_c, e_f = err(0.1), err(0.05)
    order = np.log2(e_c / e_f)
    assert 4.4 < order < 5.8, (order, e_c, e_f)


def test_tsit5_beats_dopri5_at_equal_grid():
    """The design claim (smaller error constants than Dormand–Prince) at the
    same fixed grid; measured ratio ~2-3x on this problem."""
    f = lambda t, y: jnp.cos(t) * y
    exact = math.exp(math.sin(3.0))
    errs = {}
    for name in ("tsit5", "dopri5"):
        s = pxt.odeint(
            f, jnp.ones(()), jnp.asarray([0.0, 3.0]), name, time_axis=0,
            options={"min_step": 0.1, "max_step": 0.1, "first_step": 0.1},
        )
        errs[name] = abs(float(s[-1]) - exact)
    assert errs["tsit5"] < errs["dopri5"], errs


def test_tsit5_adaptive_and_dense():
    """Adaptive solve + buffered dense output track a stiff-ish oscillator."""
    f = lambda t, y: jnp.stack([y[1], -25.0 * y[0]])
    ts = jnp.linspace(0.0, 2.0, 41)
    y, stats = pxt.odeint(
        f, jnp.asarray([1.0, 0.0]), ts, "tsit5", rtol=1e-7, atol=1e-9,
        time_axis=0, options={"return_stats": True, "max_steps": 512},
    )
    assert int(stats.status) == 0
    exact = np.cos(5.0 * np.asarray(ts))
    np.testing.assert_allclose(np.asarray(y[:, 0]), exact, atol=5e-5)


def test_tsit5_adjoint_gradient():
    """odeint_adjoint composes with the new tableau (grad vs closed form:
    d/dy0 y0*exp(sin t) = exp(sin t))."""
    import jax

    def loss(y0):
        s = pxt.odeint_adjoint(
            lambda t, y: jnp.cos(t) * y, y0, jnp.asarray([0.0, 2.0]),
            "tsit5", time_axis=0,
        )
        return s[-1]

    g = jax.grad(loss)(jnp.asarray(1.3))
    np.testing.assert_allclose(float(g), math.exp(math.sin(2.0)), rtol=1e-5)
