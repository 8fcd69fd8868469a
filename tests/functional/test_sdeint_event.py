"""sdeint_event: SDE first-passage detection via path-refining bisection
(``functional/sdeint_event.py``; no counterpart in the reference — its
sdeint is a fixed-grid Euler loop and cannot re-query the path inside a
step).

Pinned claims:
- the refined event state lands ON the barrier (the bracket's path
  oscillation scale, orders below the march step);
- refinement is a NESTED deterministic bisection: deeper refine_iters stay
  inside the shallower bracket;
- the first-passage LAW is right: E[tau] for drifted BM hitting a barrier
  matches Wald's identity a/mu over 4096 vmapped paths;
- horizon / t0-event / step-budget edge cases are flagged, not silent.
"""

import jax
import jax.numpy as jnp
import pytest

import paddlexde_tpu as pxt
from paddlexde_tpu.brownian.api import BrownianInterval
from paddlexde_tpu.solver.adaptive import MAX_STEPS_EXCEEDED

BARRIER = 1.5


def _gbm():
    f = lambda t, y: 0.8 * y
    g = lambda t, y: 0.4 * y
    y0 = jnp.array([1.0], dtype=jnp.float64)
    ev = lambda t, y: y[0] - BARRIER
    return f, g, y0, ev


def test_barrier_hit_and_refinement():
    f, g, y0, ev = _gbm()
    bm = BrownianInterval(
        0.0, 10.0, size=(1,), key=jax.random.key(0), dtype=jnp.float64
    )
    res = pxt.sdeint_event(
        f, g, y0, 0.0, ev, "milstein", t_max=10.0, step_size=1 / 64,
        bm=bm, refine_iters=24,
    )
    assert bool(res.event_fired)
    assert 0.0 < float(res.t_event) < 10.0
    assert int(res.status) == 0
    # the refined state sits on the barrier far below the march-step scale:
    # path oscillation over the 2^-24 bracket, not O(h) interpolation error
    assert abs(float(res.y_event[0]) - BARRIER) < 1e-3

    # nested bisection: deeper refinement stays inside the shallow bracket
    res8 = pxt.sdeint_event(
        f, g, y0, 0.0, ev, "milstein", t_max=10.0, step_size=1 / 64,
        bm=bm, refine_iters=8,
    )
    assert abs(float(res8.t_event) - float(res.t_event)) <= (1 / 64) * 2**-7
    assert abs(float(res.y_event[0]) - BARRIER) <= abs(
        float(res8.y_event[0]) - BARRIER
    ) + 1e-9


def test_no_event_horizon():
    f, g, y0, _ = _gbm()
    ev = lambda t, y: y[0] - 1e9  # unreachable
    res = pxt.sdeint_event(
        f, g, y0, 0.0, ev, "euler", t_max=1.0, step_size=0.05,
        key=jax.random.key(1),
    )
    assert not bool(res.event_fired)
    assert float(res.t_event) == 1.0
    assert int(res.status) == 0
    assert bool(jnp.all(jnp.isfinite(res.y_event)))


def test_event_at_t0():
    f, g, y0, _ = _gbm()
    ev = lambda t, y: y[0] - 1.0  # zero at the initial state
    res = pxt.sdeint_event(
        f, g, y0, 0.0, ev, "euler", t_max=1.0, step_size=0.1,
        key=jax.random.key(2),
    )
    assert bool(res.event_fired)
    assert float(res.t_event) == 0.0
    assert jnp.array_equal(res.y_event, y0)


def test_max_steps_status():
    f, g, y0, _ = _gbm()
    ev = lambda t, y: y[0] - 1e9
    res = pxt.sdeint_event(
        f, g, y0, 0.0, ev, "euler", t_max=10.0, step_size=1e-3,
        key=jax.random.key(3), max_num_steps=7,
    )
    assert not bool(res.event_fired)
    assert int(res.status) & MAX_STEPS_EXCEEDED
    assert float(res.t_event) < 10.0


def test_unknown_scheme_rejected():
    f, g, y0, ev = _gbm()
    with pytest.raises(ValueError, match="sdeint_event supports"):
        pxt.sdeint_event(
            f, g, y0, 0.0, ev, "weak2", t_max=1.0, step_size=0.1
        )


def test_first_passage_law_wald():
    """Drifted BM dy = mu dt + sigma dW from 0 hitting a > 0:
    E[tau] = a/mu (Wald). 4096 vmapped paths per h, one program each.

    Discrete barrier MONITORING overestimates tau by O(sqrt(h)) — the path
    can cross and return between knots, and no bisection can recover an
    excursion the march never saw (the classical Broadie-Glasserman-Kou
    continuity correction exists for exactly this). The pin is therefore
    two-sided: the bias is POSITIVE and SHRINKS with h, and at the finer h
    the estimate is within bias+noise of Wald's a/mu."""
    mu, sigma, a = 1.0, 0.5, 0.5
    f = lambda t, y: mu * jnp.ones_like(y)
    g = lambda t, y: sigma * jnp.ones_like(y)
    y0 = jnp.zeros((1,), dtype=jnp.float64)
    ev = lambda t, y: y[0] - a
    t_max = 20.0  # P(tau > 20) is negligible at these parameters

    def mean_tau(h):
        def tau(k):
            bm = BrownianInterval(
                0.0, t_max, size=(1,), key=k, dtype=jnp.float64
            )
            res = pxt.sdeint_event(
                f, g, y0, 0.0, ev, "euler", t_max=t_max, step_size=h,
                bm=bm, refine_iters=16,
            )
            return res.t_event, res.event_fired

        keys = jax.random.split(jax.random.key(7), 4096)
        t_ev, fired = jax.vmap(tau)(keys)
        assert float(jnp.mean(fired)) > 0.999
        return float(jnp.mean(jnp.where(fired, t_ev, t_max)))

    bias_coarse = mean_tau(0.08) - a / mu
    bias_fine = mean_tau(0.02) - a / mu
    # monitoring bias: positive, ~sqrt(h) decay (same paths across h, so
    # the comparison is coupled); stderr ~ 0.0055
    assert bias_coarse > bias_fine > -0.01, (bias_coarse, bias_fine)
    assert bias_fine < 0.6 * bias_coarse + 0.01, (bias_coarse, bias_fine)
    assert abs(bias_fine) < 0.06, bias_fine


def test_event_general_matrix_noise():
    """First passage for a NON-commuting matrix-noise SDE: every general
    scheme brackets + refines onto the barrier; the two strong-order-1+
    schemes agree on the passage time far more closely than Euler (whose
    O(sqrt h) path error shifts the crossing)."""
    b1 = jnp.array([[0.0, 0.4], [0.0, 0.0]], jnp.float64)
    b2 = jnp.array([[0.0, 0.0], [0.4, 0.0]], jnp.float64)
    a0 = jnp.array([[0.5, 0.1], [-0.1, 0.6]], jnp.float64)
    f = lambda t, y: y @ a0.T
    g = lambda t, y: jnp.stack([y @ b1.T, y @ b2.T], axis=-1)
    y0 = jnp.array([[1.0, 0.5]], jnp.float64)
    ev_fn = lambda t, y: jnp.sum(y * y) - 4.0

    t_star = {}
    for sv in ("euler_general", "milstein_general", "taylor15_general"):
        res = pxt.sdeint_event(f, g, y0, 0.0, ev_fn, solver=sv, t_max=6.0,
                               step_size=1.0 / 64, key=jax.random.key(3),
                               noise_dim=2)
        assert bool(res.event_fired) and int(res.status) == 0
        assert abs(float(jnp.sum(res.y_event**2)) - 4.0) < 1e-5
        t_star[sv] = float(res.t_event)
    gap_hi = abs(t_star["milstein_general"] - t_star["taylor15_general"])
    gap_em = abs(t_star["euler_general"] - t_star["taylor15_general"])
    assert gap_hi < gap_em / 3, t_star

    with pytest.raises(ValueError, match="supports"):
        pxt.sdeint_event(f, g, y0, 0.0, ev_fn, solver="weak2", t_max=1.0,
                         step_size=0.1)


def test_stiff_first_passage_implicit():
    """Drift-implicit schemes compose with the event machinery: a stiff
    relaxation dy = -th(y-1)dt + sigma dW from y0=5 crosses y=1.5 at
    t* = ln(8)/th; at th*h = 10 the implicit march (and every bracket-
    refinement probe) stays stable and resolves t* to the noise scale,
    while the small-sigma closed form pins the value."""
    import numpy as np

    th, sigma = 100.0, 1e-4
    f = lambda t, y: -th * (y - 1.0)
    g = lambda t, y: sigma * jnp.ones_like(y)
    y0 = jnp.full((4,), 5.0, jnp.float64)
    t_star = np.log(8.0) / th  # 0.02079
    # event-time accuracy tracks each scheme's own probe-path accuracy at
    # th*h_probe ~ O(1) (measured): implicit_foster2's SDIRK4 probes nail
    # t* (rel 9e-4 at h=0.01), implicit_sra1 lands within ~4%, backward
    # Euler's first-order probes lag the relaxation (rel ~0.35 at h=0.01,
    # halving toward 0 with h — pinned decreasing, not tight)
    tol = {"implicit_em": 0.5, "implicit_sra1": 0.08,
           "implicit_foster2": 0.01}

    def t_event(scheme, h):
        res = pxt.sdeint_event(
            f, g, y0, 0.0,
            lambda t, y: jnp.mean(y) - 1.5,
            scheme, t_max=2.0, step_size=h, key=3,
        )
        assert bool(res.event_fired)
        # bisection converges on the probe path, so y_event sits ON the
        # barrier regardless of the scheme's time bias
        np.testing.assert_allclose(np.asarray(res.y_event),
                                   np.full(4, 1.5), rtol=0.01)
        return float(res.t_event)

    for scheme, rtol in tol.items():
        rel = abs(t_event(scheme, 0.01) - t_star) / t_star
        assert rel < rtol, (scheme, rel)
    # backward Euler's bias is h-driven: finer march -> smaller bias
    e_coarse = abs(t_event("implicit_em", 0.02) - t_star)
    e_fine = abs(t_event("implicit_em", 0.01) - t_star)
    assert e_fine < e_coarse, (e_fine, e_coarse)
