"""Drift-implicit (stiff) SDE schemes: implicit_em / implicit_milstein.

The stochastic theta method (Higham 2000): drift treated implicitly (Newton
inside the term's move, the stage machinery shared with the implicit ODE
solvers), diffusion explicit at the left state. Pinned:

- STABILITY, the scheme's reason to exist: on dy = -th*y dt + sigma dW with
  th*h = 10, explicit EM's second moment explodes geometrically while the
  implicit step contracts; at small th*h the stationary law matches
  sigma^2/(2 th);
- strong orders on the same tree path vs closed-form GBM (implicit_em ~0.5
  like EM; implicit_milstein ~1.0 like Milstein);
- theta=0.5 (drift-trapezoid) is deterministically order 2 where theta=1 is
  order 1 (sigma=0 collapse);
- discrete-exact replay adjoint == direct backprop; reverse retraces;
  adaptive runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import BrownianInterval, sdeint, sdeint_adjoint

MU, SIG = 0.05, 0.4


def _gbm_truth(bm, y0, t):
    w = bm(0.0, t)
    return y0 * jnp.exp((MU - 0.5 * SIG**2) * t + SIG * w)


def _strong_err(method, n, n_paths=512, seed=3):
    bm = BrownianInterval(0.0, 1.0, size=(n_paths,), key=jax.random.key(seed),
                          dtype=jnp.float64)
    ts = jnp.linspace(0.0, 1.0, n)
    y0 = jnp.ones((n_paths,), jnp.float64)
    f = lambda t, y: MU * y
    g = lambda t, y: SIG * y
    sol = sdeint(f, g, y0, ts, method, bm=bm, time_axis=0)
    truth = _gbm_truth(bm, y0, 1.0)
    return float(jnp.sqrt(jnp.mean((sol[-1] - truth) ** 2)))


def test_stiff_drift_stability_vs_explicit():
    """theta_stiff*h = 10: explicit EM blows up, implicit contracts."""
    th, sig, h, nstep = 50.0, 1.0, 0.2, 26
    n_paths = 2048
    bm = BrownianInterval(0.0, h * (nstep - 1), size=(n_paths,),
                          key=jax.random.key(0), dtype=jnp.float64)
    ts = jnp.linspace(0.0, h * (nstep - 1), nstep)
    y0 = jnp.ones((n_paths,), jnp.float64)
    f = lambda t, y: -th * y
    g = lambda t, y: sig * jnp.ones_like(y)
    y_exp = sdeint(f, g, y0, ts, "euler", bm=bm, time_axis=0)
    y_imp = sdeint(f, g, y0, ts, "implicit_em", bm=bm, time_axis=0)
    m2_exp = float(jnp.mean(y_exp[-1] ** 2))
    m2_imp = float(jnp.mean(y_imp[-1] ** 2))
    assert m2_exp > 1e15, m2_exp  # |1 - th h| = 9 per step, 25 steps
    assert m2_imp < 1.0, m2_imp  # contraction 1/(1+th h) + bounded noise


def test_stationary_law_small_steps():
    """th*h = 0.1: the implicit chain's long-run variance ~ sigma^2/(2 th)."""
    th, sig, h = 5.0, 0.8, 0.02
    nstep = 201  # T = 4 >> 1/th
    n_paths = 8192
    bm = BrownianInterval(0.0, h * (nstep - 1), size=(n_paths,),
                          key=jax.random.key(1), dtype=jnp.float64)
    ts = jnp.linspace(0.0, h * (nstep - 1), nstep)
    sol = sdeint(lambda t, y: -th * y, lambda t, y: sig * jnp.ones_like(y),
                 jnp.zeros((n_paths,), jnp.float64), ts, "implicit_em",
                 bm=bm, time_axis=0)
    var = float(jnp.var(sol[-1]))
    exact = sig**2 / (2 * th)  # 0.064
    np.testing.assert_allclose(var, exact, rtol=0.12)


def test_implicit_em_strong_order_half():
    e_c, e_f = _strong_err("implicit_em", 17), _strong_err("implicit_em", 257)
    order = np.log(e_c / e_f) / np.log(16.0)
    assert 0.35 < order < 0.8, (order, e_c, e_f)


def test_implicit_milstein_strong_order_one():
    e_c, e_f = (_strong_err("implicit_milstein", 17),
                _strong_err("implicit_milstein", 257))
    order = np.log(e_c / e_f) / np.log(16.0)
    assert order > 0.85, (order, e_c, e_f)
    # and the Milstein correction matters: clearly below implicit_em
    assert e_f < _strong_err("implicit_em", 257) * 0.5


def test_theta_half_is_deterministic_order_two():
    """sigma = 0 collapses the scheme to the deterministic theta method:
    trapezoid (theta=0.5) is order 2, backward Euler (theta=1) order 1."""
    from paddlexde_tpu.functional.sdeint import make_implicit_em_term
    from paddlexde_tpu.functional.solve import integrate_term

    f = lambda t, y: jnp.cos(t) * y
    g = lambda t, y: jnp.zeros_like(y)
    exact = float(np.exp(np.sin(2.0)))

    def err(theta, n):
        bm = BrownianInterval(0.0, 2.0, size=(), key=jax.random.key(0),
                              dtype=jnp.float64)
        term = make_implicit_em_term(f, g, bm, theta=theta)
        ts = jnp.linspace(0.0, 2.0, n)
        sol = integrate_term(term, jnp.ones((), jnp.float64), ts, "euler",
                             time_axis=0)
        return abs(float(sol[-1]) - exact)

    o_trap = np.log2(err(0.5, 33) / err(0.5, 65))
    o_be = np.log2(err(1.0, 33) / err(1.0, 65))
    assert o_trap > 1.7, o_trap
    assert 0.7 < o_be < 1.3, o_be


def test_replay_adjoint_matches_direct_backprop():
    n_paths = 64
    bm = BrownianInterval(0.0, 1.0, size=(n_paths,), key=jax.random.key(7),
                          dtype=jnp.float64)
    ts = jnp.linspace(0.0, 1.0, 9)
    y0 = jnp.ones((n_paths,), jnp.float64)

    def loss(mu, run):
        sol = run(lambda t, y: mu * y, lambda t, y: SIG * y, y0, ts,
                  "implicit_em", bm=bm, time_axis=0)
        return jnp.mean(sol[-1] ** 2)

    g_adj = jax.grad(lambda m: loss(m, sdeint_adjoint))(jnp.asarray(0.3))
    g_dir = jax.grad(lambda m: loss(m, sdeint))(jnp.asarray(0.3))
    np.testing.assert_allclose(float(g_adj), float(g_dir), rtol=1e-9)


def test_reverse_retraces():
    bm = BrownianInterval(0.0, 1.0, size=(8,), key=jax.random.key(9),
                          dtype=jnp.float64)
    ts = jnp.linspace(0.0, 1.0, 17)
    y0 = jnp.full((8,), 1.3, jnp.float64)
    f = lambda t, y: MU * y
    g = lambda t, y: SIG * y
    fwd = sdeint(f, g, y0, ts, "implicit_milstein", bm=bm, time_axis=0)
    back = sdeint(f, g, fwd[-1], ts[::-1], "implicit_milstein", bm=bm,
                  reverse=True, time_axis=0)
    np.testing.assert_allclose(np.asarray(back[-1]), np.asarray(y0), rtol=2e-3)


def test_adaptive_runs():
    bm = BrownianInterval(0.0, 1.0, size=(16,), key=jax.random.key(11),
                          dtype=jnp.float64)
    sol, stats = sdeint(
        lambda t, y: -4.0 * y, lambda t, y: 0.3 * jnp.ones_like(y),
        jnp.ones((16,), jnp.float64), jnp.asarray([0.0, 1.0]), "implicit_em",
        bm=bm, adaptive=True, rtol=1e-4, atol=1e-6, time_axis=0,
        options={"return_stats": True},
    )
    assert int(stats.status) == 0
    assert bool(jnp.all(jnp.isfinite(sol)))


def test_theta_knob_through_public_api():
    """options={'theta': ...} reaches the term builder from sdeint AND
    sdeint_adjoint (review find: the knob used to be unreachable — the
    adaptive validator rejected it and the fixed path dropped it). sigma=0
    collapse: theta=0.5 must be visibly more accurate than theta=1."""
    bm = BrownianInterval(0.0, 2.0, size=(), key=jax.random.key(0),
                          dtype=jnp.float64)
    f = lambda t, y: jnp.cos(t) * y
    g = lambda t, y: jnp.zeros_like(y)
    ts = jnp.linspace(0.0, 2.0, 33)
    exact = float(np.exp(np.sin(2.0)))
    errs = {}
    for theta in (0.5, 1.0):
        sol = sdeint(f, g, jnp.ones((), jnp.float64), ts, "stochastic_theta",
                     bm=bm, time_axis=0, options={"theta": theta})
        errs[theta] = abs(float(sol[-1]) - exact)
    assert errs[0.5] < errs[1.0] / 20, errs
    # adjoint path takes the same knob and still matches direct backprop
    y0 = jnp.ones((4,), jnp.float64)
    bm2 = BrownianInterval(0.0, 1.0, size=(4,), key=jax.random.key(2),
                           dtype=jnp.float64)
    ts2 = jnp.linspace(0.0, 1.0, 9)

    def loss(mu, run):
        sol = run(lambda t, y: mu * y, lambda t, y: 0.2 * y, y0, ts2,
                  "implicit_em", bm=bm2, time_axis=0,
                  options={"theta": 0.5, "newton_iters": 10})
        return jnp.mean(sol[-1] ** 2)

    g_adj = jax.grad(lambda m: loss(m, sdeint_adjoint))(jnp.asarray(0.3))
    g_dir = jax.grad(lambda m: loss(m, sdeint))(jnp.asarray(0.3))
    np.testing.assert_allclose(float(g_adj), float(g_dir), rtol=1e-9)
    # theta on the milstein variant is rejected loudly
    with pytest.raises(ValueError, match="theta"):
        sdeint(lambda t, y: y, lambda t, y: y, y0, ts2, "implicit_milstein",
               bm=bm2, time_axis=0, options={"theta": 0.5})


def test_theta_validation():
    from paddlexde_tpu.functional.sdeint import make_implicit_em_term

    with pytest.raises(ValueError, match="theta"):
        make_implicit_em_term(lambda t, y: y, lambda t, y: y, None, theta=0.0)
