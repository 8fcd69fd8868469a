"""Symplectic integrators (``solver/symplectic.py``): leapfrog (velocity
Verlet) and Yoshida-4 for separable Hamiltonian systems. The reference has
no symplectic story (``paddlexde/solver/__init__.py:1-6``). Claims pinned:
convergence orders, EXACT phase-space volume preservation (det of the step
Jacobian), and the long-horizon property the class exists for — bounded
energy error where a same-order non-symplectic scheme drifts ∝ T.
"""

import jax
import jax.numpy as jnp
import numpy as np

import paddlexde_tpu as pxt
from paddlexde_tpu.solver.fixed import rk4_step
from paddlexde_tpu.solver.symplectic import leapfrog_step, yoshida4_step
from paddlexde_tpu.xde.term import ode_term


def _sho(t, y):  # H = p²/2 + q²/2
    q, p = y
    return (p, -q)


Y0 = (jnp.array([1.0]), jnp.array([0.0]))


def test_convergence_orders():
    """One full period of the harmonic oscillator: measured slopes 2.00 /
    4.00 against the closed form."""
    for sv, lo, hi in [("leapfrog", 1.9, 2.1), ("yoshida4", 3.9, 4.1),
                       ("velocity_verlet", 1.9, 2.1)]:
        errs = []
        for n in (64, 256):
            ts = jnp.linspace(0.0, 2 * np.pi, n + 1)
            sol = pxt.odeint(_sho, Y0, ts, sv, time_axis=0)
            errs.append(float(jnp.abs(sol[0][-1] - 1.0)[0]
                              + jnp.abs(sol[1][-1])[0]))
        slope = np.log(errs[0] / errs[1]) / np.log(4.0)
        assert lo < slope < hi, (sv, slope, errs)


def test_phase_space_volume_exact():
    """det of the one-step phase-space Jacobian == 1 to machine precision
    (the defining symplectic property); rk4's measurably is not."""
    term = ode_term(_sho)

    def stepmap(fn):
        def m(z):
            y1, _ = fn(term, 0.0, 0.3, (z[:1], z[1:]))
            return jnp.concatenate([y1[0], y1[1]])

        return m

    z = jnp.array([0.7, -0.4], jnp.float64)
    for fn in (leapfrog_step, yoshida4_step):
        det = float(jnp.linalg.det(jax.jacobian(stepmap(fn))(z)))
        assert abs(det - 1.0) < 1e-12, det
    det_rk4 = float(jnp.linalg.det(jax.jacobian(stepmap(rk4_step))(z)))
    assert abs(det_rk4 - 1.0) > 1e-6, det_rk4  # measured 1e-5 at h=0.3


def test_long_horizon_energy_bounded_vs_rk4():
    """Same order, same step: yoshida4's energy error is BOUNDED (shadow
    Hamiltonian) while rk4's drifts ∝ T — measured 3.8e-6 vs 6.9e-5 at
    T=1000 and the rk4 drift doubles by T=2000 while yoshida4's does not."""
    h = 0.1

    def energy_drift(sv, T):
        n = int(T / h)
        ts = jnp.linspace(0.0, T, n + 1)
        sol = pxt.odeint(_sho, Y0, ts, sv, time_axis=0)
        H = 0.5 * (sol[0][:, 0] ** 2 + sol[1][:, 0] ** 2)
        return float(jnp.max(jnp.abs(H - 0.5)))

    y4_1k, rk_1k = energy_drift("yoshida4", 1000.0), energy_drift("rk4", 1000.0)
    assert y4_1k < rk_1k / 5, (y4_1k, rk_1k)
    rk_2k = energy_drift("rk4", 2000.0)
    y4_2k = energy_drift("yoshida4", 2000.0)
    assert rk_2k > 1.5 * rk_1k, (rk_1k, rk_2k)  # linear drift
    assert y4_2k < 2.0 * y4_1k, (y4_1k, y4_2k)  # bounded oscillation


def test_pendulum_nonlinear_and_grads():
    """Nonlinear separable system (pendulum): yoshida4 matches a fine rk4
    reference, and gradients flow through the scan (dE/dq0 of the exactly
    conserved energy ~ analytic)."""
    def f(t, y):
        q, p = y
        return (p, -jnp.sin(q))

    y0 = (jnp.array([1.2]), jnp.array([0.0]))
    ts = jnp.linspace(0.0, 10.0, 501)
    sol = pxt.odeint(f, y0, ts, "yoshida4", time_axis=0)
    ref = pxt.odeint(f, y0, jnp.linspace(0.0, 10.0, 8001), "rk4", time_axis=0)
    np.testing.assert_allclose(np.asarray(sol[0][-1]), np.asarray(ref[0][-1]),
                               atol=1e-5)

    def final_energy(q0):
        y = (jnp.array([q0]), jnp.array([0.0]))
        s = pxt.odeint(f, y, ts, "yoshida4", time_axis=0)
        return 0.5 * s[1][-1, 0] ** 2 + (1.0 - jnp.cos(s[0][-1, 0]))

    g = float(jax.grad(final_energy)(1.2))
    # energy is conserved to O(h^4): dE/dq0 ≈ d/dq0 (1 − cos q0) = sin q0
    np.testing.assert_allclose(g, float(jnp.sin(1.2)), atol=1e-4)


def test_odeint_adjoint_refuses_symplectic():
    """The adjoint's augmented backward system is not a (q, p) pair —
    odeint_adjoint refuses with a pointer to direct backprop (which works
    and is pinned in test_pendulum_nonlinear_and_grads)."""
    import pytest

    ts = jnp.linspace(0.0, 1.0, 9)
    with pytest.raises(ValueError, match="PAIR state"):
        pxt.odeint_adjoint(_sho, Y0, ts, "leapfrog", time_axis=0)


# implicit midpoint (one-stage Gauss–Legendre): symplectic for EVERY
# Hamiltonian (incl. non-separable, where leapfrog's splitting does not
# apply), symmetric order 2, A-stable (NOT L-stable), and exactly
# conservative for QUADRATIC invariants.


def _nonsep(t, y):  # H = (q² + p²)/2 + 0.6qp — non-separable
    q, p = y[..., 0], y[..., 1]
    return jnp.stack([p + 0.6 * q, -(q + 0.6 * p)], -1)


def test_implicit_midpoint_order_and_symplecticity():
    y0 = jnp.array([1.0, 0.0], jnp.float64)
    ref = pxt.odeint(_nonsep, y0, jnp.linspace(0.0, 3.0, 8001), "rk4",
                     time_axis=0)[-1]

    def err(n):
        ts = jnp.linspace(0.0, 3.0, n + 1)
        sol = pxt.odeint(_nonsep, y0, ts, "implicit_midpoint", time_axis=0)
        return float(jnp.max(jnp.abs(sol[-1] - ref)))

    slope = np.log(err(64) / err(256)) / np.log(4.0)
    assert 1.9 < slope < 2.1, slope

    from paddlexde_tpu.solver.implicit import implicit_midpoint_step

    term = ode_term(_nonsep)

    def m(z):
        y1, _ = implicit_midpoint_step(term, 0.0, 0.3, z)
        return y1

    det = float(jnp.linalg.det(jax.jacobian(m)(jnp.array([0.7, -0.4]))))
    assert abs(det - 1.0) < 1e-10, det  # symplectic on a NON-separable H


def test_implicit_midpoint_conserves_quadratic_invariants_exactly():
    """Gauss methods conserve quadratic first integrals EXACTLY — measured
    8.9e-15 over T=500 (not merely bounded like leapfrog's shadow energy).
    The flip side: R(−∞) = −1 (A-stable, not L-stable) — a hugely stiff
    transient alternates instead of damping (use sdirk2/trbdf2 there)."""
    y0 = jnp.array([1.0, 0.0], jnp.float64)
    ts = jnp.linspace(0.0, 500.0, 5001)
    sol = pxt.odeint(_nonsep, y0, ts, "implicit_midpoint", time_axis=0)
    H = (0.5 * (sol[..., 0] ** 2 + sol[..., 1] ** 2)
         + 0.6 * sol[..., 0] * sol[..., 1])
    assert float(jnp.max(jnp.abs(H - H[0]))) < 1e-12

    fl = lambda t, y: -1e8 * y
    s1 = pxt.odeint(fl, jnp.array([1.0]), jnp.array([0.0, 1.0]),
                    "implicit_midpoint", options={"step_size": 1.0},
                    time_axis=0)
    assert abs(float(s1[-1, 0]) + 1.0) < 1e-6  # R(-inf) = -1, pinned
