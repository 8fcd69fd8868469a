"""Interpolation golden tests, mirroring the reference suite exactly.

Same fixtures and tolerances as ``tests/interpolation/test_interpolation.py``
in DrownFish19/PaddleXDE: a fixed-slope ramp (all families exact to 1e-4) and
sin(t) (Hermite 1e-5, linear/Bezier 5e-2, derivatives 1e-2), plus lag-gradient
tests for the HistoryIndex mechanism the reference never tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import (
    BezierSpline,
    CubicHermiteSpline,
    LinearInterpolation,
    history_index,
)

FAMILIES = [LinearInterpolation, CubicHermiteSpline, BezierSpline]


class TestFixedDeriv:
    """Ramp series: value 0.5*t in channel 0, zeros in channel 1."""

    @classmethod
    def setup_class(cls):
        ramp = jnp.arange(0, 1000, 0.5, dtype=jnp.float64)
        cls.series = jnp.stack([ramp, jnp.zeros(2000, jnp.float64)], axis=-1)[None]
        cls.t = jnp.arange(0, 2000, 1, dtype=jnp.float64)
        cls.t_eval = jnp.asarray([21.12])
        cls.val_tgt = jnp.asarray([[[21.12 * 0.5, 0.0]]])
        cls.deriv_tgt = jnp.asarray([[[0.5, 0.0]]])

    @pytest.mark.parametrize("cls_i", FAMILIES)
    def test_family(self, cls_i):
        interp = cls_i(self.series, self.t)
        np.testing.assert_allclose(
            interp.evaluate(self.t_eval), self.val_tgt, rtol=1e-4, atol=1e-12
        )
        np.testing.assert_allclose(
            interp.derivative(self.t_eval), self.deriv_tgt, rtol=1e-4, atol=1e-12
        )


class TestDynamicDeriv:
    """sin(t) series sampled at dt=0.01 over [0, 20)."""

    @classmethod
    def setup_class(cls):
        base = jnp.stack(
            [jnp.arange(0, 20, 0.01, dtype=jnp.float64), jnp.zeros(2000, jnp.float64)],
            axis=-1,
        )[None]
        cls.series = jnp.sin(base)
        cls.t = jnp.arange(0, 20, 0.01, dtype=jnp.float64)
        cls.t_eval = jnp.asarray([16.5])
        cls.val_tgt = np.array([[[np.sin(16.5), 0.0]]])
        cls.deriv_tgt = np.array([[[np.cos(16.5), 0.0]]])

    def test_linear(self):
        interp = LinearInterpolation(self.series, self.t)
        np.testing.assert_allclose(interp.evaluate(self.t_eval), self.val_tgt, rtol=5e-2)
        np.testing.assert_allclose(
            interp.derivative(self.t_eval), self.deriv_tgt, rtol=1e-2, atol=1e-8
        )

    def test_cubic_hermite(self):
        interp = CubicHermiteSpline(self.series, self.t)
        np.testing.assert_allclose(interp.evaluate(self.t_eval), self.val_tgt, rtol=1e-5)
        np.testing.assert_allclose(
            interp.derivative(self.t_eval), self.deriv_tgt, rtol=1e-2, atol=1e-8
        )

    def test_bezier(self):
        interp = BezierSpline(self.series, self.t)
        np.testing.assert_allclose(interp.evaluate(self.t_eval), self.val_tgt, rtol=5e-2)
        np.testing.assert_allclose(
            interp.derivative(self.t_eval), self.deriv_tgt, rtol=1e-2, atol=1e-8
        )


def test_batch_shapes_and_many_queries():
    series = jnp.asarray(np.random.RandomState(0).randn(3, 50, 4))
    interp = CubicHermiteSpline(series)
    te = jnp.linspace(0.0, 49.0, 17)
    out = interp.evaluate(te)
    assert out.shape == (3, 17, 4)
    out_d = interp.derivative(te)
    assert out_d.shape == (3, 17, 4)


def test_evaluate_at_knots_exact():
    series = jnp.asarray(np.random.RandomState(1).randn(2, 30, 3))
    t = jnp.asarray(np.sort(np.random.RandomState(2).rand(30)) * 10)
    for cls in (LinearInterpolation, CubicHermiteSpline):
        interp = cls(series, t)
        np.testing.assert_allclose(
            interp.evaluate(t[:-1]), series[:, :-1], rtol=1e-10, atol=1e-10
        )


def test_scalar_query():
    series = jnp.asarray(np.random.RandomState(0).randn(2, 10, 3))
    interp = LinearInterpolation(series)
    out = interp.evaluate(jnp.asarray(2.5))
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out, 0.5 * (series[:, 2] + series[:, 3]), rtol=1e-12)


def test_history_index_lag_gradients():
    """grad wrt lags matches the spline derivative; no grad to history."""
    rng = np.random.RandomState(0)
    his = jnp.asarray(rng.randn(2, 40, 3))
    lags = jnp.asarray([5.3, 17.8, 33.1])

    def loss(lags_, his_):
        y = history_index(lags_, his_, interpolation="cubic")
        return jnp.sum(y)

    g_lags, g_his = jax.grad(loss, argnums=(0, 1))(lags, his)

    interp = CubicHermiteSpline(his)
    expected = jnp.sum(interp.derivative(lags), axis=(0, 2))
    np.testing.assert_allclose(g_lags, expected, rtol=1e-8)
    np.testing.assert_allclose(g_his, np.zeros_like(his))  # reference contract

    # extension: history gradients when requested
    g_his2 = jax.grad(lambda h: jnp.sum(history_index(lags, h, stop_his_gradient=False)))(his)
    assert float(jnp.sum(jnp.abs(g_his2))) > 0


def test_stateless_two_point_forms():
    from paddlexde_tpu.interpolation import cubic_hermite_interp, linear_interp

    y0, y1 = jnp.asarray([1.0, 2.0]), jnp.asarray([3.0, 6.0])
    out = linear_interp(0.0, 1.0, y0, y1, 0.25)
    np.testing.assert_allclose(out, [1.5, 3.0])
    # Hermite through matching data reproduces a cubic exactly
    f = lambda t: t**3 - 2 * t
    df = lambda t: 3 * t**2 - 2
    out = cubic_hermite_interp(0.0, f(0.0), df(0.0), 2.0, f(2.0), df(2.0), 1.3)
    np.testing.assert_allclose(out, f(1.3), rtol=1e-12)


def test_fill_forward_missing_data():
    from paddlexde_tpu.interpolation import fill_forward

    x = jnp.asarray([
        [np.nan, 1.0], [2.0, np.nan], [np.nan, np.nan], [4.0, 5.0],
    ])  # [T=4, D=2]
    filled = fill_forward(x)
    np.testing.assert_allclose(
        np.asarray(filled), [[2.0, 1.0], [2.0, 1.0], [2.0, 1.0], [4.0, 5.0]]
    )
    # batched
    xb = jnp.stack([x, x + 10])
    fb = fill_forward(xb)
    assert fb.shape == xb.shape and not bool(jnp.any(jnp.isnan(fb)))


class TestNaturalCubicSpline:
    def test_sin_accuracy(self):
        from paddlexde_tpu.interpolation import NaturalCubicSpline

        t = jnp.arange(0, 20, 0.05, dtype=jnp.float64)
        series = jnp.sin(t)[None, :, None]
        sp = NaturalCubicSpline(series, t)
        te = jnp.asarray([7.321])
        np.testing.assert_allclose(sp.evaluate(te)[0, 0, 0], np.sin(7.321), rtol=1e-7)
        np.testing.assert_allclose(sp.derivative(te)[0, 0, 0], np.cos(7.321), rtol=1e-5)

    def test_exact_at_knots_and_batched(self):
        from paddlexde_tpu.interpolation import NaturalCubicSpline

        rng = np.random.RandomState(0)
        series = jnp.asarray(rng.randn(3, 25, 4))
        t = jnp.asarray(np.sort(rng.rand(25)) * 5)
        sp = NaturalCubicSpline(series, t)
        np.testing.assert_allclose(
            np.asarray(sp.evaluate(t[:-1])), np.asarray(series[:, :-1]),
            rtol=1e-8, atol=1e-9,
        )
        # batch correctness: each batch member must reproduce its OWN values
        # (catches flattening-layout mistakes)
        single = NaturalCubicSpline(series[1:2], t)
        te = jnp.asarray([1.234, 3.21])
        np.testing.assert_allclose(
            np.asarray(sp.evaluate(te)[1]), np.asarray(single.evaluate(te)[0]),
            rtol=1e-10,
        )

    def test_c2_continuity(self):
        from paddlexde_tpu.interpolation import NaturalCubicSpline

        rng = np.random.RandomState(2)
        series = jnp.asarray(rng.randn(1, 12, 2))
        t = jnp.arange(12.0)
        sp = NaturalCubicSpline(series, t)
        eps = 1e-6
        for knot in (3.0, 7.0):
            d_left = np.asarray(sp.derivative(jnp.asarray([knot - eps])))
            d_right = np.asarray(sp.derivative(jnp.asarray([knot + eps])))
            np.testing.assert_allclose(d_left, d_right, atol=1e-4)

    def test_as_cde_control(self):
        from paddlexde_tpu import cdeint
        from paddlexde_tpu.interpolation import NaturalCubicSpline

        ts = jnp.linspace(0.0, 1.0, 33)
        series = jnp.stack([ts, 2 * ts], axis=-1)
        control = NaturalCubicSpline(series, ts)
        sol = cdeint(lambda t, y: jnp.eye(2), jnp.asarray([0.5, -1.0]), ts,
                     control, "rk4", time_axis=0)
        expect = jnp.asarray([0.5, -1.0])[None] + series - series[0]
        np.testing.assert_allclose(np.asarray(sol), np.asarray(expect), rtol=1e-5, atol=1e-7)


def test_rectilinear_interpolation_is_causal():
    """torchcde's rectilinear mode: time advances first (value held), then
    the value jumps at the new observation time — the interpolated control
    never looks ahead of the last observation, the property online neural
    CDEs need. Pinned pointwise on the doubled-knot schedule, plus the CDE
    time-reparameterization invariance (a pure-time integrand recovers the
    clock)."""
    import jax.numpy as jnp
    import numpy as np

    from paddlexde_tpu import cdeint
    from paddlexde_tpu.interpolation import rectilinear_interpolation

    t = jnp.array([0.0, 0.3, 1.0, 1.4])
    vals = jnp.array([1.0, 2.0, -1.0, 0.5])
    series = jnp.stack([t, vals], -1)
    interp, s_knots = rectilinear_interpolation(series, t)
    assert s_knots.shape == (7,)
    for s, expect in [(0.5, (0.15, 1.0)), (1.0, (0.3, 1.0)),
                      (1.5, (0.3, 1.5)), (2.5, (0.65, 2.0)),
                      (4.0, (1.0, -1.0)), (6.0, (1.4, 0.5))]:
        out = interp.evaluate(jnp.asarray(s))
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-12)

    # CDE invariance: dy = [1, 0]·dX integrates the time channel -> y
    # recovers the clock at every doubled knot regardless of the
    # reparameterization
    f = lambda tt, y: jnp.array([[1.0, 0.0]])
    y0 = jnp.array([0.0])
    # euler: the rectilinear derivative is CONSTANT per unit segment and
    # discontinuous at the doubled knots — multi-stage solvers' end-of-step
    # stages read the next segment's slope at the corners (the documented
    # LinearInterpolation boundary behavior); euler only samples left
    # endpoints, so aligned steps integrate the piecewise-constant
    # derivative exactly
    sol = cdeint(f, y0, s_knots, interp, "euler",
                 options={"step_size": 0.25}, time_axis=0)
    clock = jnp.array([0.0, 0.3, 0.3, 1.0, 1.0, 1.4, 1.4])
    np.testing.assert_allclose(np.asarray(sol[:, 0]), np.asarray(clock),
                               atol=1e-9)
