"""Kinetic Langevin splitting family (functional/langevin.py).

Pinned:
- EXACT harmonic-chain stationary covariance for EVERY scheme (baoab /
  obabo / aboba, with and without a mass matrix): each update on
  V = k q^2/2 is linear (x1 = T x + B xi), so the chain's stationary
  covariance solves the 2x2 discrete Lyapunov equation S = T S T' + B B' —
  solved directly in the test (no h->0 approximation) and matched by the
  simulated ensemble;
- the exact marginal STRUCTURE of the family on the harmonic chain
  (closed-form-pinned): baoab and aboba sample the CONFIGURATIONAL
  marginal exactly (kinetic biases (1 - h^2 w^2/4)/beta and its
  reciprocal), obabo samples the KINETIC marginal exactly (config bias
  1/(beta w^2 (1 - h^2 w^2/4))); an EM discretization carries O(h);
- gamma = 0 IS velocity Verlet for baoab/obabo and POSITION Verlet for
  aboba (agreement with hand-rolled chains);
- mass-matrix marginals: Var(q) = 1/(beta k) independent of mass,
  Var(p) = m/beta (Lyapunov h->0 + simulated at moderate h);
- reproducibility per key; direct backprop through the scan matches FD
  (incl. obabo's two-draws-per-step path).
"""

import jax
import jax.numpy as jnp
import numpy as np

from paddlexde_tpu import BrownianInterval, langevin, langevin_baoab


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


def _lyapunov(scheme, k, gamma, beta, h, m=1.0):
    """Exact stationary covariance of the harmonic chain for any scheme.

    Force = -k q, diagonal mass m: B(s) = [[1,0],[-k s,1]],
    A(s) = [[1,s/m],[0,1]], O(s) = diag(1, c1(s)) with noise column
    [0, c2(s) sqrt(m)]. Ops compose right-to-left in time."""

    def M_B(s):
        return np.array([[1.0, 0.0], [-k * s, 1.0]])

    def M_A(s):
        return np.array([[1.0, s / m], [0.0, 1.0]])

    def ou(s):
        c1 = np.exp(-gamma * s)
        c2 = np.sqrt(max(1.0 - c1 * c1, 0.0) / beta)
        return np.diag([1.0, c1]), np.array([0.0, c2 * np.sqrt(m)])

    half = h / 2.0
    if scheme == "baoab":
        M_O, b = ou(h)
        T = M_B(half) @ M_A(half) @ M_O @ M_A(half) @ M_B(half)
        B = (M_B(half) @ M_A(half) @ b)[:, None]
    elif scheme == "obabo":
        M_O, b = ou(half)
        mid = M_B(half) @ M_A(h) @ M_B(half)
        T = M_O @ mid @ M_O
        B = np.stack([M_O @ mid @ b, b], axis=1)
    elif scheme == "aboba":
        M_O, b = ou(h)
        T = M_A(half) @ M_B(half) @ M_O @ M_B(half) @ M_A(half)
        B = (M_A(half) @ M_B(half) @ b)[:, None]
    else:
        raise ValueError(scheme)
    K = np.eye(4) - np.kron(T, T)
    sigma = np.linalg.solve(K, (B @ B.T).reshape(-1)).reshape(2, 2)
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


def test_lyapunov_oracle_self_consistent():
    # the generalized oracle reproduces the original BAOAB one at m=1
    w, gamma, beta, h = 1.3, 2.0, 1.5, 0.25
    np.testing.assert_allclose(
        _lyapunov("baoab", w * w, gamma, beta, h),
        _baoab_lyapunov(w, gamma, beta, h), rtol=1e-12)


def _run_scheme(scheme, k, gamma, beta, h, nstep, n_paths, mass=1.0, seed=0):
    force = lambda t, q: -k * q
    q0 = jnp.zeros((n_paths,), jnp.float64)
    p0 = jnp.zeros((n_paths,), jnp.float64)
    ts = jnp.linspace(0.0, h * nstep, nstep + 1)
    bm = BrownianInterval(0.0, float(h * nstep), size=(n_paths,),
                          key=jax.random.key(seed), dtype=jnp.float64)
    return langevin(force, (q0, p0), ts, gamma=gamma, beta=beta, mass=mass,
                    bm=bm, scheme=scheme, time_axis=0)


def test_obabo_aboba_stationary_covariance_matches_lyapunov():
    k, gamma, beta, h = 1.3 * 1.3, 2.0, 1.5, 0.25
    for scheme in ("obabo", "aboba"):
        q, p = _run_scheme(scheme, k, gamma, beta, h, nstep=4000,
                           n_paths=4096, seed=7)
        qs = np.asarray(q[2000::20]).ravel()
        ps = np.asarray(p[2000::20]).ravel()
        sigma = _lyapunov(scheme, k, gamma, beta, h)
        np.testing.assert_allclose(np.var(qs), sigma[0, 0], rtol=0.04,
                                   err_msg=scheme)
        np.testing.assert_allclose(np.var(ps), sigma[1, 1], rtol=0.04,
                                   err_msg=scheme)
        # both Lyapunov solutions approach the Gibbs marginals at h -> 0
        sigma_small = _lyapunov(scheme, k, gamma, beta, 1e-4)
        np.testing.assert_allclose(sigma_small[0, 0], 1.0 / (beta * k),
                                   rtol=1e-5)
        np.testing.assert_allclose(sigma_small[1, 1], 1.0 / beta, rtol=1e-5)


def test_scheme_marginal_structure_closed_form():
    """Which marginal each scheme gets EXACTLY right on the harmonic chain
    (deterministic, Lyapunov-only — found by solving the Lyapunov equation,
    then pinned in closed form):

      baoab: Var(q) exact,                Var(p) = (1 − h²ω²/4)/β
      aboba: Var(q) exact,                Var(p) = (1/β)/(1 − h²ω²/4)
      obabo: Var(p) exact (B–P property), Var(q) = (1/(βω²))/(1 − h²ω²/4)

    so the biased marginal of every scheme carries O(h²) bias (the 1∓h²ω²/4
    factors), and no scheme is exact in both."""
    k, gamma, beta = 1.0, 1.3, 1.5
    for h in (0.4, 0.2, 0.1):
        d = 1.0 - h * h * k / 4.0
        sig = _lyapunov("baoab", k, gamma, beta, h)
        np.testing.assert_allclose(sig[0, 0], 1.0 / (beta * k), rtol=1e-12)
        np.testing.assert_allclose(sig[1, 1], d / beta, rtol=1e-10)
        sig = _lyapunov("aboba", k, gamma, beta, h)
        np.testing.assert_allclose(sig[0, 0], 1.0 / (beta * k), rtol=1e-12)
        np.testing.assert_allclose(sig[1, 1], 1.0 / (beta * d), rtol=1e-10)
        sig = _lyapunov("obabo", k, gamma, beta, h)
        np.testing.assert_allclose(sig[1, 1], 1.0 / beta, rtol=1e-12)
        np.testing.assert_allclose(sig[0, 0], 1.0 / (beta * k * d),
                                   rtol=1e-10)


def test_gamma_zero_obabo_is_velocity_verlet():
    k, h, nstep = 0.9 * 0.9, 0.05, 200
    q0 = np.asarray(jax.random.normal(jax.random.key(1), (4,)))
    force = lambda t, q: -k * q
    ts = jnp.linspace(0.0, h * nstep, nstep + 1)
    q, p = langevin(force, (jnp.asarray(q0, jnp.float64),
                            jnp.zeros(4, jnp.float64)), ts, gamma=0.0,
                    key=0, scheme="obabo", time_axis=0)
    qv, pv = q0.copy(), np.zeros(4)
    for _ in range(nstep):
        pv = pv + 0.5 * h * (-k * qv)
        qv = qv + h * pv
        pv = pv + 0.5 * h * (-k * qv)
    np.testing.assert_allclose(np.asarray(q[-1]), qv, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(p[-1]), pv, rtol=1e-6, atol=1e-9)


def test_gamma_zero_aboba_is_position_verlet():
    k, h, nstep = 0.9 * 0.9, 0.05, 200
    q0 = np.asarray(jax.random.normal(jax.random.key(2), (4,)))
    force = lambda t, q: -k * q
    ts = jnp.linspace(0.0, h * nstep, nstep + 1)
    q, p = langevin(force, (jnp.asarray(q0, jnp.float64),
                            jnp.zeros(4, jnp.float64)), ts, gamma=0.0,
                    key=0, scheme="aboba", time_axis=0)
    qv, pv = q0.copy(), np.zeros(4)
    for _ in range(nstep):
        qv = qv + 0.5 * h * pv
        pv = pv + h * (-k * qv)
        qv = qv + 0.5 * h * pv
    np.testing.assert_allclose(np.asarray(q[-1]), qv, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(p[-1]), pv, rtol=1e-6, atol=1e-9)


def test_mass_matrix_marginals():
    # target law: Var(q) = 1/(beta k) independent of m; Var(p) = m/beta.
    k, gamma, beta, m = 2.0, 1.5, 2.0, 3.0
    for scheme in ("baoab", "obabo", "aboba"):
        sig = _lyapunov(scheme, k, gamma, beta, 1e-4, m=m)
        np.testing.assert_allclose(sig[0, 0], 1.0 / (beta * k), rtol=1e-5,
                                   err_msg=scheme)
        np.testing.assert_allclose(sig[1, 1], m / beta, rtol=1e-5,
                                   err_msg=scheme)
    # the sampler matches the mass-Lyapunov law at a MODERATE h too
    h = 0.2
    q, p = _run_scheme("baoab", k, gamma, beta, h, nstep=4000, n_paths=4096,
                       mass=m, seed=11)
    sigma = _lyapunov("baoab", k, gamma, beta, h, m=m)
    qs = np.asarray(q[2000::20]).ravel()
    ps = np.asarray(p[2000::20]).ravel()
    np.testing.assert_allclose(np.var(qs), sigma[0, 0], rtol=0.04)
    np.testing.assert_allclose(np.var(ps), sigma[1, 1], rtol=0.04)
    # BAOAB's harmonic configurational EXACTNESS survives the mass matrix
    np.testing.assert_allclose(sigma[0, 0], 1.0 / (beta * k), rtol=1e-12)


def test_obabo_reproducible_and_differentiable():
    # the two-draws-per-step path: same key -> same chain; grad matches FD
    gamma, beta, h, nstep = 1.5, 1.0, 0.1, 64
    q0 = jnp.ones((32,), jnp.float64)
    p0 = jnp.zeros((32,), jnp.float64)
    ts = jnp.linspace(0.0, h * nstep, nstep + 1)

    def endpoint(om, seed=3):
        bm = BrownianInterval(0.0, float(h * nstep), size=(32,),
                              key=jax.random.key(seed), dtype=jnp.float64)
        force = lambda t, q: -(om * om) * q
        q, p = langevin(force, (q0, p0), ts, gamma=gamma, beta=beta, bm=bm,
                        scheme="obabo", time_axis=0)
        return jnp.mean(q[-1] ** 2)

    assert float(endpoint(1.1)) == float(endpoint(1.1))
    g = float(jax.grad(endpoint)(jnp.asarray(1.1, jnp.float64)))
    eps = 1e-5
    fd = (endpoint(1.1 + eps) - endpoint(1.1 - eps)) / (2 * eps)
    np.testing.assert_allclose(g, float(fd), rtol=1e-5)


# ---------------------------------------------------------------------------
# Non-diagonal mass preconditioning (mass_ops=(minv, msqrt))
# ---------------------------------------------------------------------------

_K_MAT = np.array([[2.0, 0.5, 0.0],
                   [0.5, 1.5, 0.3],
                   [0.0, 0.3, 1.0]])
_M_MAT = np.array([[1.5, -0.4, 0.2],
                   [-0.4, 1.2, 0.1],
                   [0.2, 0.1, 0.8]])


def _matrix_lyapunov(scheme, K, M, gamma, beta, h):
    """Exact stationary covariance of the D-dim harmonic chain with a full
    mass matrix: state x = (q, p), kick [[I,0],[-sK,I]], drift
    [[I, s M^-1],[0,I]], OU (p <- c1 p + c2 L xi, L L^T = M)."""
    D = K.shape[0]
    eye = np.eye(D)
    Minv = np.linalg.inv(M)
    L = np.linalg.cholesky(M)

    def blk(a, b, c, d):
        return np.block([[a, b], [c, d]])

    def M_B(s):
        return blk(eye, 0 * eye, -s * K, eye)

    def M_A(s):
        return blk(eye, s * Minv, 0 * eye, eye)

    def ou(s):
        c1 = np.exp(-gamma * s)
        c2 = np.sqrt(max(1.0 - c1 * c1, 0.0) / beta)
        T = blk(eye, 0 * eye, 0 * eye, c1 * eye)
        noise = np.vstack([np.zeros((D, D)), c2 * L])
        return T, noise

    half = h / 2.0
    if scheme == "baoab":
        M_O, n = ou(h)
        T = M_B(half) @ M_A(half) @ M_O @ M_A(half) @ M_B(half)
        B = M_B(half) @ M_A(half) @ n
    elif scheme == "obabo":
        M_O, n = ou(half)
        mid = M_B(half) @ M_A(h) @ M_B(half)
        T = M_O @ mid @ M_O
        B = np.hstack([M_O @ mid @ n, n])
    elif scheme == "aboba":
        M_O, n = ou(h)
        T = M_A(half) @ M_B(half) @ M_O @ M_B(half) @ M_A(half)
        B = M_A(half) @ M_B(half) @ n
    else:
        raise ValueError(scheme)
    S = np.linalg.solve(np.eye(4 * D * D) - np.kron(T, T),
                        (B @ B.T).reshape(-1)).reshape(2 * D, 2 * D)
    return S


def test_mass_ops_theory_pins():
    """The normal-mode argument, pinned: with a full SPD mass matrix the
    harmonic superconvergence structure survives — baoab/aboba sample
    Cov(q) = K^-1/beta EXACTLY at every stable h, obabo samples
    Cov(p) = M/beta exactly (all via the matrix Lyapunov solution)."""
    K, M = _K_MAT, _M_MAT
    assert np.linalg.eigvalsh(M).min() > 0 and np.linalg.eigvalsh(K).min() > 0
    # non-commuting (the diagonal-mass tests cannot see this regime)
    assert np.abs(K @ M - M @ K).max() > 0.1
    gamma, beta = 1.5, 1.5
    for h in (0.3, 0.15):
        for scheme in ("baoab", "aboba"):
            S = _matrix_lyapunov(scheme, K, M, gamma, beta, h)
            np.testing.assert_allclose(S[:3, :3], np.linalg.inv(K) / beta,
                                       rtol=1e-10, atol=1e-12,
                                       err_msg=f"{scheme} h={h}")
        S = _matrix_lyapunov("obabo", K, M, gamma, beta, h)
        np.testing.assert_allclose(S[3:, 3:], M / beta, rtol=1e-10,
                                   atol=1e-12, err_msg=f"obabo h={h}")
    # and every scheme's BOTH marginals approach Gibbs as h -> 0
    S = _matrix_lyapunov("baoab", K, M, gamma, beta, 1e-4)
    np.testing.assert_allclose(S[3:, 3:], M / beta, rtol=1e-5)


def test_mass_ops_sampler_matches_matrix_lyapunov():
    K, M = _K_MAT, _M_MAT
    gamma, beta, h, nstep, n_paths = 1.5, 1.5, 0.15, 4000, 2048
    Minv = np.linalg.inv(M)
    L = np.linalg.cholesky(M)
    Kj, Minvj, Lj = (jnp.asarray(a, jnp.float64) for a in (K, Minv, L))
    force = lambda t, q: -(q @ Kj)          # K symmetric
    mass_ops = (lambda p: p @ Minvj,        # M^-1 symmetric
                lambda x: x @ Lj.T)         # (L xi) per row
    ts = jnp.linspace(0.0, h * nstep, nstep + 1)
    bm = BrownianInterval(0.0, float(h * nstep), size=(n_paths, 3),
                          key=jax.random.key(5), dtype=jnp.float64)
    q0 = jnp.zeros((n_paths, 3), jnp.float64)
    q, p = langevin(force, (q0, q0), ts, gamma=gamma, beta=beta,
                    mass_ops=mass_ops, bm=bm, scheme="baoab", time_axis=0)
    S = _matrix_lyapunov("baoab", K, M, gamma, beta, h)
    qs = np.asarray(q[2000::20]).reshape(-1, 3)
    ps = np.asarray(p[2000::20]).reshape(-1, 3)
    cov_q = np.cov(qs.T)
    cov_p = np.cov(ps.T)
    rel_q = np.linalg.norm(cov_q - S[:3, :3]) / np.linalg.norm(S[:3, :3])
    rel_p = np.linalg.norm(cov_p - S[3:, 3:]) / np.linalg.norm(S[3:, 3:])
    assert rel_q < 0.06, (rel_q, cov_q, S[:3, :3])
    assert rel_p < 0.06, (rel_p, cov_p, S[3:, 3:])
    # the configurational marginal is ALSO the exact Gibbs one (theory pin
    # above) — so the sampler's empirical cov matches K^-1/beta directly
    tgt = np.linalg.inv(K) / beta
    assert np.linalg.norm(cov_q - tgt) / np.linalg.norm(tgt) < 0.06


def test_mass_ops_diagonal_equivalence():
    # mass_ops built from a diagonal == the mass= pytree path, same bm.
    # Machine precision, not bitwise: the two paths associate the mass
    # multiplications differently ((s*p)/m vs s*(p/m)), a ULP per step.
    m_diag = jnp.asarray([3.0, 0.5, 1.25], jnp.float64)
    k = 1.7
    force = lambda t, q: -k * q
    h, nstep = 0.1, 50
    ts = jnp.linspace(0.0, h * nstep, nstep + 1)
    q0 = jnp.ones((8, 3), jnp.float64)
    p0 = jnp.zeros((8, 3), jnp.float64)

    def run(**kw):
        bm = BrownianInterval(0.0, float(h * nstep), size=(8, 3),
                              key=jax.random.key(9), dtype=jnp.float64)
        return langevin(force, (q0, p0), ts, gamma=1.2, beta=2.0, bm=bm,
                        scheme="obabo", time_axis=0, **kw)

    qa, pa = run(mass=jnp.broadcast_to(m_diag, (8, 3)))
    qb, pb = run(mass_ops=(lambda p: p / m_diag,
                           lambda x: x * jnp.sqrt(m_diag)))
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qb),
                               rtol=1e-13, atol=1e-14)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=1e-13, atol=1e-14)


def test_mass_ops_validation_and_grads():
    import pytest

    force = lambda t, q: -q
    ts = jnp.linspace(0.0, 1.0, 11)
    y0 = (jnp.ones(4, jnp.float64), jnp.zeros(4, jnp.float64))
    with pytest.raises(ValueError, match="not both"):
        langevin(force, y0, ts, gamma=1.0, mass=2.0,
                 mass_ops=(lambda p: p, lambda x: x), key=0)
    with pytest.raises(ValueError, match="pair of callables"):
        langevin(force, y0, ts, gamma=1.0, mass_ops=(lambda p: p,), key=0)
    # sentinel-default semantics (ADVICE r4): ANY explicitly-passed mass is
    # rejected alongside mass_ops — including the values the old check let
    # through (python 1.0 / True) or spuriously rejected (jnp scalar 1.0)
    for bad_mass in (1.0, True, jnp.asarray(1.0)):
        with pytest.raises(ValueError, match="not both"):
            langevin(force, y0, ts, gamma=1.0, mass=bad_mass,
                     mass_ops=(lambda p: p, lambda x: x), key=0)

    # grads flow through the mass operators (FD pin on a scale parameter)
    def endpoint(a):
        ops = (lambda p: p / a, lambda x: x * jnp.sqrt(a))
        bm = BrownianInterval(0.0, 1.0, size=(4,), key=jax.random.key(2),
                              dtype=jnp.float64)
        q, p = langevin(force, y0, ts, gamma=1.0, beta=1.0, mass_ops=ops,
                        bm=bm, scheme="baoab", time_axis=0)
        return jnp.mean(q[-1] ** 2) + jnp.mean(p[-1] ** 2)

    a0 = jnp.asarray(1.7, jnp.float64)
    g = float(jax.grad(endpoint)(a0))
    eps = 1e-5
    fd = float((endpoint(a0 + eps) - endpoint(a0 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-5)


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
