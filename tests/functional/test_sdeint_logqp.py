"""Girsanov KL augmentation (functional/sdeint_logqp.py).

Pinned:
- the discrete accumulator is EXACT for euler: kl_{k+1} = kl_k +
  0.5 |u(t_k, y_k)|^2 h reconstructed from the RETURNED y path matches the
  returned logqp path to f64 roundoff (non-circular — the reconstruction
  uses only the public outputs);
- closed-form E[logqp] on a linear posterior/prior pair (u = (a-b) z / s,
  E[kl(T)] = ((a-b)^2/(2 s^2)) \\int E[z_t^2] dt with the moment ODE
  solved in closed form) within MC tolerance;
- gradients d E[logqp] / d a match central FD; adjoint=True matches
  direct backprop values bitwise and gradients to 1e-6;
- milstein/sriw1 (multiplicative g) logqp match the fine-euler pathwise
  truth on a SHARED bm (couple with ONE bm object: the tree consumes
  draws differently per levy_area_approximation, so 'none' vs
  'space-time' bms give different paths from the same key); sriw1's
  Levy-integral queries survive the zero-filling wrapper;
- scalar y0 and custom-solver-without-bm raise ValueError.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import BrownianInterval, sdeint_logqp


def _linear_pair(a, b, sigma):
    drift = lambda t, y: a * y
    prior = lambda t, y: b * y
    diffusion = lambda t, y: jnp.full_like(y, sigma)
    return drift, prior, diffusion


def test_euler_accumulator_exact_on_returned_path():
    a, b, sigma = -0.5, 0.3, 0.7
    drift, prior, diffusion = _linear_pair(a, b, sigma)
    n, steps, T = 8, 64, 1.0
    y0 = jnp.ones((n, 1), jnp.float64)
    ts = jnp.linspace(0.0, T, steps + 1)
    bm = BrownianInterval(0.0, T, size=(n, 1), key=jax.random.key(0),
                          dtype=jnp.float64)
    ys, kl = sdeint_logqp(drift, prior, diffusion, y0, ts, "euler", bm=bm,
                          time_axis=0)
    assert ys.shape == (steps + 1, n, 1) and kl.shape == (steps + 1, n)
    h = float(T / steps)
    y_np = np.asarray(ys)
    u = (a - b) * y_np[:-1, :, 0] / sigma
    kl_rebuilt = np.concatenate(
        [np.zeros((1, n)), np.cumsum(0.5 * u * u * h, axis=0)], axis=0)
    np.testing.assert_allclose(np.asarray(kl), kl_rebuilt, rtol=1e-12,
                               atol=1e-14)


def test_expected_logqp_matches_closed_form():
    # E[z_t^2] = (z0^2 + s^2/(2a)) e^{2at} - s^2/(2a);
    # E[kl(T)] = ((a-b)^2 / (2 s^2)) * \int_0^T E[z_t^2] dt
    a, b, sigma, z0, T = -1.0, 0.5, 0.6, 1.2, 1.0
    drift, prior, diffusion = _linear_pair(a, b, sigma)
    n, steps = 8192, 256
    y0 = jnp.full((n, 1), z0, jnp.float64)
    ts = jnp.linspace(0.0, T, steps + 1)
    bm = BrownianInterval(0.0, T, size=(n, 1), key=jax.random.key(3),
                          dtype=jnp.float64)
    _, kl = sdeint_logqp(drift, prior, diffusion, y0, ts, "euler", bm=bm,
                         time_axis=0)
    c = z0 * z0 + sigma * sigma / (2 * a)
    int_m2 = c * (np.exp(2 * a * T) - 1.0) / (2 * a) - sigma * sigma / (
        2 * a) * T
    expect = (a - b) ** 2 / (2 * sigma * sigma) * int_m2
    got = float(jnp.mean(kl[-1]))
    np.testing.assert_allclose(got, expect, rtol=0.03)


def test_gradients_match_fd_and_adjoint_matches_direct():
    b, sigma, T, steps, n = 0.4, 0.8, 0.5, 32, 64
    y0 = jnp.ones((n, 1), jnp.float64)
    ts = jnp.linspace(0.0, T, steps + 1)

    def mean_kl(a, adjoint):
        drift = lambda t, y: a * y
        prior = lambda t, y: b * y
        diffusion = lambda t, y: jnp.full_like(y, sigma)
        bm = BrownianInterval(0.0, T, size=(n, 1), key=jax.random.key(7),
                              dtype=jnp.float64)
        ys, kl = sdeint_logqp(drift, prior, diffusion, y0, ts, "euler",
                              bm=bm, adjoint=adjoint, time_axis=0)
        return jnp.mean(kl[-1]) + 0.0 * jnp.mean(ys[-1])

    a0 = jnp.asarray(-0.7, jnp.float64)
    v_direct = float(mean_kl(a0, False))
    v_adj = float(mean_kl(a0, True))
    assert v_direct == v_adj  # same discretization, same path
    g = float(jax.grad(mean_kl)(a0, False))
    eps = 1e-6
    fd = (mean_kl(a0 + eps, False) - mean_kl(a0 - eps, False)) / (2 * eps)
    np.testing.assert_allclose(g, float(fd), rtol=1e-5)
    g_adj = float(jax.grad(mean_kl)(a0, True))
    np.testing.assert_allclose(g_adj, g, rtol=1e-6)


def test_milstein_and_sriw1_compose():
    # multiplicative diffusion: milstein's (dg/dy) g term and sriw1's
    # return_U bm queries both ride the zero-filled kl channel. Pathwise
    # COUPLED comparison — all schemes share ONE bm object: the tree's
    # draw consumption depends on levy_area_approximation ('none' and
    # 'space-time' give DIFFERENT paths from the same key), so a fair
    # scheme comparison must use one mode for all of them.
    a, b = -0.6, 0.2
    drift = lambda t, y: a * y
    prior = lambda t, y: b * y
    diffusion = lambda t, y: 0.4 * y + 0.3
    T, n = 0.5, 256
    y0 = jnp.ones((n, 1), jnp.float64)
    bm = BrownianInterval(0.0, T, size=(n, 1), key=jax.random.key(11),
                          dtype=jnp.float64,
                          levy_area_approximation="space-time")

    def run(solver, steps):
        ts = jnp.linspace(0.0, T, steps + 1)
        return sdeint_logqp(drift, prior, diffusion, y0, ts, solver, bm=bm,
                            time_axis=0)

    _, kl_ref = run("euler", 2048)  # pathwise truth for the kl integral
    for solver, steps, tol in (("milstein", 256, 2e-3),
                               ("sriw1", 64, 5e-4)):
        _, kl = run(solver, steps)
        gap = float(jnp.mean(jnp.abs(kl[-1] - kl_ref[-1])))
        assert gap < tol, (solver, gap)
    # euler itself carries the O(h) left-quadrature gap at coarse h —
    # the pathwise ref above is meaningful
    _, kl_coarse = run("euler", 64)
    assert float(jnp.mean(jnp.abs(kl_coarse[-1] - kl_ref[-1]))) > 5e-4
    # default-bm construction resolves the scheme's Levy mode itself
    ys2, kl2 = sdeint_logqp(drift, prior, diffusion, y0,
                            jnp.linspace(0.0, T, 65), "sriw1",
                            key=jax.random.key(5), time_axis=0)
    assert np.all(np.isfinite(np.asarray(kl2)))


def test_refusals():
    drift, prior, diffusion = _linear_pair(-1.0, 0.0, 1.0)
    ts = jnp.linspace(0.0, 1.0, 9)
    with pytest.raises(ValueError, match="array state"):
        sdeint_logqp(drift, prior, diffusion, jnp.asarray(1.0), ts, key=0)
    with pytest.raises(ValueError, match="custom solver"):
        sdeint_logqp(drift, prior, diffusion, jnp.ones((4, 1)), ts,
                     lambda *a, **k: None)
    # non-Ito / wrong-contract schemes are refused (advisor round 3): a
    # Stratonovich scheme would integrate the Ito Girsanov integrand with
    # the wrong calculus — silently wrong KL
    for bad in ("heun_stratonovich", "weak2", "euler_general", "taylor15",
                "reversible_heun"):
        with pytest.raises(ValueError, match="diagonal It"):
            sdeint_logqp(drift, prior, diffusion, jnp.ones((4, 1)), ts,
                         bad, key=0)


def test_time_axis_layouts():
    # advisor round 3 (medium): the (ys, logqp) split used to run AFTER
    # format_solution, assuming channels land last — time_axis=-1 silently
    # split off the final TIME POINT as logqp. Pinned: default -2 keeps the
    # pre-fix layout (ys [B,T,D], logqp [B,T] — logqp is ys minus the
    # channel axis), values identical to the time_axis=0 run, and a
    # trailing-axis time_axis now raises instead of corrupting.
    drift, prior, diffusion = _linear_pair(-0.5, 0.2, 0.7)
    n, steps, T = 4, 16, 0.5
    y0 = jnp.ones((n, 1), jnp.float64)
    ts = jnp.linspace(0.0, T, steps + 1)

    def run(ta):
        bm = BrownianInterval(0.0, T, size=(n, 1), key=jax.random.key(2),
                              dtype=jnp.float64)
        return sdeint_logqp(drift, prior, diffusion, y0, ts, "euler",
                            bm=bm, time_axis=ta)

    ys0, kl0 = run(0)
    assert ys0.shape == (steps + 1, n, 1) and kl0.shape == (steps + 1, n)
    ys2, kl2 = run(-2)
    assert ys2.shape == (n, steps + 1, 1) and kl2.shape == (n, steps + 1)
    np.testing.assert_array_equal(np.moveaxis(np.asarray(ys0), 0, -2),
                                  np.asarray(ys2))
    np.testing.assert_array_equal(np.asarray(kl0).T, np.asarray(kl2))
    with pytest.raises(ValueError, match="trailing"):
        run(-1)
    with pytest.raises(ValueError, match="trailing"):
        run(2)


def test_zero_diffusion_guard():
    # where g == 0 and the drifts AGREE, the 0/0 is guarded: values and
    # gradients stay finite (the agreeing channel contributes zero KL)
    n, steps, T = 8, 32, 0.5
    ts = jnp.linspace(0.0, T, steps + 1)

    def mean_kl(a):
        # channel 0: live noise + differing drifts; channel 1: zero
        # diffusion, drifts agree (both zero)
        mask = jnp.array([1.0, 0.0], jnp.float64)
        drift = lambda t, y: a * y * mask
        prior = lambda t, y: 0.2 * y * mask
        diffusion = lambda t, y: 0.5 * mask * jnp.ones_like(y)
        bm = BrownianInterval(0.0, T, size=(n, 2), key=jax.random.key(9),
                              dtype=jnp.float64)
        _, kl = sdeint_logqp(drift, prior, diffusion,
                             jnp.ones((n, 2), jnp.float64), ts, "euler",
                             bm=bm, time_axis=0)
        return jnp.mean(kl[-1])

    a0 = jnp.asarray(-0.6, jnp.float64)
    v = float(mean_kl(a0))
    g = float(jax.grad(mean_kl)(a0))
    assert np.isfinite(v) and np.isfinite(g)
    eps = 1e-6
    fd = float((mean_kl(a0 + eps) - mean_kl(a0 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-5)
