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


# --- drift-implicit ADDITIVE ladder: implicit_sra1 (1.5) / implicit_foster2
# (~2.0), round-4 candidate #6 (ROADMAP) -----------------------------------


def _ou_oracle_and_err(methods, theta=1.2, sigma=0.7, n_paths=64, seed=5):
    """Near-exact OU reference on the same (W, I10, K) tree path (same
    construction as test_foster2_additive_strong_order): the stochastic
    convolution expands as W - theta*(U - theta*K) + O(theta^3 h^3 W-bar)."""
    y0 = jnp.ones((n_paths,), jnp.float64)
    key = jax.random.key(seed)

    def make_bm():
        return BrownianInterval(0.0, 1.0, size=(n_paths,), key=key,
                                dtype=jnp.float64,
                                levy_area_approximation="space-time-time")

    bm = make_bm()
    ts_ref = np.linspace(0.0, 1.0, 2049)
    dt = ts_ref[1] - ts_ref[0]

    def ref_step(y, t):
        w, u, k = bm(t, t + dt, return_U=True, return_K=True)
        conv = w - theta * (u - theta * k)
        return jnp.exp(-theta * dt) * y + sigma * conv, None

    ref, _ = jax.lax.scan(ref_step, y0, jnp.asarray(ts_ref[:-1]))
    f = lambda t, y: -theta * y
    g = lambda t, y: sigma * jnp.ones_like(y)

    def err(method, n):
        ts = jnp.linspace(0.0, 1.0, n)
        sol = sdeint(f, g, y0, ts, method, bm=make_bm(), time_axis=0)
        return float(jnp.mean(jnp.abs(sol[-1] - ref)))

    return {m: (err(m, 17), err(m, 65)) for m in methods}


def test_implicit_additive_strong_orders():
    """implicit_sra1 ~1.5+ and implicit_foster2 ~1.8+ vs the same-path OU
    oracle; each implicit scheme's error is BELOW its explicit sibling's at
    both grids (measured 5.6x / 7.5x — the SDIRK cores carry smaller error
    constants on this testbed), and implicit_foster2 beats implicit_sra1."""
    errs = _ou_oracle_and_err(
        ["sra1", "implicit_sra1", "foster2", "implicit_foster2"]
    )
    for m, lo in [("implicit_sra1", 1.5), ("implicit_foster2", 1.6)]:
        e_c, e_f = errs[m]
        order = np.log(e_c / e_f) / np.log(4.0)
        assert order > lo, (m, order, e_c, e_f)
    assert errs["implicit_sra1"][0] < errs["sra1"][0]
    assert errs["implicit_sra1"][1] < errs["sra1"][1]
    assert errs["implicit_foster2"][0] < errs["foster2"][0]
    assert errs["implicit_foster2"][1] < errs["foster2"][1]
    assert errs["implicit_foster2"][1] < errs["implicit_sra1"][1]


def test_implicit_additive_stiff_contraction():
    """theta*h = 10: explicit sra1/foster2 moments explode (inf/nan) while
    the drift-implicit additive schemes contract; implicit_foster2's
    stationary second moment lands within ~15% of sigma^2/(2 theta) AT that
    extreme step (implicit_em under-disperses ~6x there, implicit_sra1
    over-disperses — the L-stable ladder shows up in the stationary law)."""
    th, sig, h, nstep = 100.0, 1.0, 0.1, 129
    n_paths = 4096
    ts = jnp.linspace(0.0, h * (nstep - 1), nstep)
    y0 = 5.0 * jnp.ones((n_paths,), jnp.float64)
    f = lambda t, y: -th * y
    g = lambda t, y: sig * jnp.ones_like(y)

    def run(method):
        bm = BrownianInterval(0.0, h * (nstep - 1), size=(n_paths,),
                              key=jax.random.key(3), dtype=jnp.float64,
                              levy_area_approximation="space-time-time")
        sol = sdeint(f, g, y0, ts, method, bm=bm, time_axis=0)
        return float(jnp.mean(sol[-1] ** 2))

    assert not np.isfinite(run("sra1"))
    assert not np.isfinite(run("foster2"))
    target = sig**2 / (2 * th)
    m2_sra = run("implicit_sra1")
    m2_fo = run("implicit_foster2")
    assert np.isfinite(m2_sra) and m2_sra < 1.0, m2_sra
    np.testing.assert_allclose(m2_fo, target, rtol=0.15)


def test_implicit_foster2_constant_g_telescopes():
    """Zero drift, constant g: the SDIRK4 theta-core's degree-3-exact
    quadrature integrates the quadratic q' exactly, so the chain telescopes
    to y0 + g*W(T) — the property an order-2 quadrature core provably loses
    (its per-step O(sqrt(h)) noise error floors at fixed substeps)."""
    y0 = jnp.ones((8,), jnp.float64)
    key = jax.random.key(5)

    def make_bm():
        return BrownianInterval(0.0, 1.0, size=(8,), key=key,
                                dtype=jnp.float64,
                                levy_area_approximation="space-time-time")

    ts = jnp.linspace(0.0, 1.0, 9)
    sol = sdeint(lambda t, y: jnp.zeros_like(y),
                 lambda t, y: 0.7 * jnp.ones_like(y),
                 y0, ts, "implicit_foster2", bm=make_bm(), time_axis=0)
    w = make_bm()(0.0, 1.0)
    np.testing.assert_allclose(np.asarray(sol[-1]), np.asarray(y0 + 0.7 * w),
                               atol=1e-12)


def test_implicit_additive_reverse_retraces():
    """Additive noise: the reversed system stays additive and ReverseBrownian
    supplies the exact reversed (dW~, I10~, K~) algebra — the implicit
    schemes retrace their forward solve like their explicit siblings."""
    theta, sigma = 0.9, 0.5
    y0 = jnp.ones((64,), jnp.float64)
    bm = BrownianInterval(0.0, 1.0, size=(64,), key=jax.random.key(31),
                          dtype=jnp.float64,
                          levy_area_approximation="space-time-time")
    f = lambda t, y: -theta * y
    g = lambda t, y: sigma * jnp.ones_like(y)
    ts = jnp.linspace(0.0, 1.0, 65)
    for method, tol in [("implicit_sra1", 5e-5), ("implicit_foster2", 5e-7)]:
        fwd = sdeint(f, g, y0, ts, method, bm=bm, time_axis=0)
        back = sdeint(f, g, fwd[-1], ts[::-1], method, bm=bm, time_axis=0)
        err = float(jnp.mean(jnp.abs(back[-1] - y0)))
        assert err < tol, (method, err)


def test_implicit_additive_adjoint_exact_vs_direct():
    """Replay adjoint through the Newton-in-move stages == direct backprop
    (the knobs ride in options on both paths)."""
    key = jax.random.key(11)
    y0 = jnp.ones((16,), jnp.float64)
    ts = jnp.linspace(0.0, 1.0, 17)

    def make_bm():
        return BrownianInterval(0.0, 1.0, size=(16,), key=key,
                                dtype=jnp.float64,
                                levy_area_approximation="space-time-time")

    for method in ["implicit_sra1", "implicit_foster2"]:
        def loss(a, run):
            f = lambda t, y: -a * y
            g = lambda t, y: 0.5 * jnp.ones_like(y)
            sol = run(f, g, y0, ts, method, bm=make_bm(), time_axis=0,
                      options={"newton_iters": 10})
            return jnp.sum(sol[-1])

        a = jnp.asarray(1.3, jnp.float64)
        vd, gd = jax.value_and_grad(lambda x: loss(x, sdeint))(a)
        va, ga = jax.value_and_grad(lambda x: loss(x, sdeint_adjoint))(a)
        np.testing.assert_allclose(float(va), float(vd), rtol=1e-12)
        np.testing.assert_allclose(float(ga), float(gd), rtol=1e-9)


def test_implicit_additive_general_matrix_variants():
    """implicit_sra1_general / implicit_foster2_general: slope ~2 on a linear
    matrix-additive system (self-convergence on the same path), and the
    theta knob is rejected loudly on the fully-implicit schemes."""
    rng = np.random.RandomState(0)
    D, M = 6, 3
    G = jnp.asarray(rng.randn(D, M) * 0.4, jnp.float64)
    y0 = jnp.asarray(rng.randn(64, D), jnp.float64)
    A = -0.8 * jnp.eye(D) + 0.1 * jnp.asarray(rng.randn(D, D), jnp.float64)
    f = lambda t, y: y @ A.T
    g = lambda t, y: G

    def make_bm():
        return BrownianInterval(0.0, 1.0, size=(64, M), key=jax.random.key(9),
                                dtype=jnp.float64,
                                levy_area_approximation="space-time-time")

    for method in ["implicit_sra1_general", "implicit_foster2_general"]:
        def final(n):
            ts = jnp.linspace(0.0, 1.0, n)
            return sdeint(f, g, y0, ts, method, bm=make_bm(), noise_dim=M,
                          time_axis=0)[-1]

        ref = final(1025)
        e_c = float(jnp.mean(jnp.abs(final(17) - ref)))
        e_f = float(jnp.mean(jnp.abs(final(65) - ref)))
        slope = np.log(e_c / e_f) / np.log(4.0)
        assert slope > 1.6, (method, slope, e_c, e_f)

    with pytest.raises(ValueError, match="theta"):
        sdeint(f, g, y0, jnp.linspace(0.0, 1.0, 5), "implicit_sra1_general",
               bm=make_bm(), noise_dim=M, time_axis=0,
               options={"theta": 0.5})


def test_implicit_sra1_order_conditions():
    """The derived SDIRK2-core noise-stage coefficients satisfy the additive
    strong-1.5 conditions exactly (the same pair SRA1's published tableau
    satisfies: sum b_i B_i = 1 and sum b_i B_i^2 = 3/2), and the SDIRK4
    theta-core's quadrature is degree-3 exact (b.c^k = 1/(k+1), k <= 3)."""
    from paddlexde_tpu.functional.sde_schemes.implicit import (
        _ISRA1_B1, _ISRA1_B2, _ISRA1_GAMMA, _SDIRK4_A, _SDIRK4_C, _SDIRK4_G,
    )

    b = np.array([1.0 - _ISRA1_GAMMA, _ISRA1_GAMMA])
    B = np.array([_ISRA1_B1, _ISRA1_B2])
    np.testing.assert_allclose(b @ B, 1.0, atol=1e-14)
    np.testing.assert_allclose(b @ B**2, 1.5, atol=1e-14)
    # SRA1's own (alpha, B) pair satisfies the same two conditions
    np.testing.assert_allclose(
        np.array([1 / 3, 2 / 3]) @ np.array([0.0, 1.5]), 1.0, atol=1e-15)
    np.testing.assert_allclose(
        np.array([1 / 3, 2 / 3]) @ np.array([0.0, 1.5]) ** 2, 1.5, atol=1e-15)

    a_mat = np.zeros((5, 5))
    for i, row in enumerate(_SDIRK4_A):
        a_mat[i, : len(row)] = row
    np.fill_diagonal(a_mat, _SDIRK4_G)
    c = np.asarray(_SDIRK4_C)
    np.testing.assert_allclose(a_mat.sum(1), c, atol=1e-14)
    b4 = a_mat[-1]  # stiffly accurate
    for k in range(4):
        np.testing.assert_allclose(b4 @ c**k, 1.0 / (k + 1), atol=1e-14)
    # full order 4: b.A.c = 1/6 etc. (the coupling conditions that kill the
    # h f_y g q''' chain an order-3 core measurably misses)
    np.testing.assert_allclose(b4 @ a_mat @ c, 1.0 / 6.0, atol=1e-14)
    np.testing.assert_allclose(b4 @ (c * (a_mat @ c)), 1.0 / 8.0, atol=1e-14)
    np.testing.assert_allclose(b4 @ a_mat @ c**2, 1.0 / 12.0, atol=1e-14)
    np.testing.assert_allclose(b4 @ a_mat @ a_mat @ c, 1.0 / 24.0, atol=1e-14)


# --- implicit_sra1_damped: stiffly-accurate damped-noise variant (ROADMAP
# round-4 candidate 6 follow-on) --------------------------------------------


def _damped_stationary_ratio(zh):
    """Closed-form discrete stationary m2 of implicit_sra1_damped on
    dy = -theta y dt + sigma dW at theta*h = zh, as a RATIO to the exact
    sigma^2/(2 theta): the step is linear in (y, W, U) — y1 = a(z) y +
    noise(W, U) with z = -zh — so the stationary variance is
    Var(noise)/(1 - a^2) with the exact (W, U) covariance
    [[h, h^2/2], [h^2/2, h^3/3]]."""
    from paddlexde_tpu.functional.sde_schemes.implicit import (
        _ISRA1_GAMMA, _ISRA1D_A1, _ISRA1D_B1,
    )

    g = _ISRA1_GAMMA
    z = -zh
    d = 1.0 - g * z
    a = (1.0 + (1.0 - 2.0 * g) * z) / d**2          # SDIRK2 R(z)
    c_w = ((1.0 - g) * z * _ISRA1D_A1 / d + 1.0) / d  # coeff of sigma*W
    c_u = (1.0 - g) * z * _ISRA1D_B1 / d**2           # coeff of sigma*U/h
    var = c_w**2 + c_u**2 / 3.0 + c_w * c_u           # per sigma^2 h
    return (var / (1.0 - a * a)) / (1.0 / (2.0 * zh)), a


def test_implicit_sra1_damped_strong_order():
    """Same OU-oracle regime as implicit_sra1: strong order ~1.5+ with an
    essentially identical error constant (measured 1.90 for both; the
    stiffly-accurate restructuring costs nothing in the smooth regime)."""
    errs = _ou_oracle_and_err(["implicit_sra1", "implicit_sra1_damped"])
    e_c, e_f = errs["implicit_sra1_damped"]
    order = np.log(e_c / e_f) / np.log(4.0)
    assert order > 1.5, (order, e_c, e_f)
    # error constant comparable to implicit_sra1's (within 2x both ways)
    for i in range(2):
        ratio = errs["implicit_sra1_damped"][i] / errs["implicit_sra1"][i]
        assert 0.5 < ratio < 2.0, (i, ratio, errs)


def test_implicit_sra1_damped_noise_response_closed_form():
    """The design property, pinned from the closed-form linear response:
    the stationary m2 ratio stays within +16% of exact at EVERY theta*h
    (peak ~1.154 near theta*h = 5), sits at ~1.03 at theta*h = 10 where
    implicit_sra1's undamped final noise gives ~7.4x (its z -> -inf noise
    limit is the CONSTANT 0.3695 sigma^2 h: ratio = 0.739*zh, unbounded),
    and damps toward zero as theta*h -> inf; R(-inf) = 0."""
    sweep = [0.01, 0.1, 0.3, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0, 30.0, 100.0,
             1000.0]
    ratios = {zh: _damped_stationary_ratio(zh)[0] for zh in sweep}
    assert max(ratios.values()) < 1.16, ratios
    np.testing.assert_allclose(ratios[5.0], 1.1542, atol=2e-3)
    assert ratios[10.0] < 1.05
    assert ratios[1000.0] < 0.03          # damps, never flat-lines
    np.testing.assert_allclose(ratios[0.01], 1.0, atol=1e-3)  # h->0 exact
    _, a_inf = _damped_stationary_ratio(1e12)
    assert abs(a_inf) < 1e-10             # L-stable core
    # implicit_sra1's z->-inf per-step noise variance: y1 -> sigma(W - B2 U/h)
    from paddlexde_tpu.functional.sde_schemes.implicit import _ISRA1_B2

    lim = 1.0 - _ISRA1_B2 + _ISRA1_B2**2 / 3.0
    np.testing.assert_allclose(lim, 0.3695, atol=1e-4)
    assert lim * 2.0 * 10.0 > 7.0         # the ratio it implies at zh=10


def test_implicit_sra1_damped_stiff_empirical_matches_closed_form():
    """theta*h = 10 chain: the empirical stationary m2 matches the
    closed-form discrete response (ratio ~1.03 of exact) and sits ~7x
    below implicit_sra1's on the same tree."""
    th, sig, h, nstep, n_paths = 100.0, 1.0, 0.1, 129, 4096
    ts = jnp.linspace(0.0, h * (nstep - 1), nstep)
    y0 = 5.0 * jnp.ones((n_paths,), jnp.float64)
    f = lambda t, y: -th * y
    g = lambda t, y: sig * jnp.ones_like(y)

    def run(method):
        bm = BrownianInterval(0.0, h * (nstep - 1), size=(n_paths,),
                              key=jax.random.key(3), dtype=jnp.float64,
                              levy_area_approximation="space-time-time")
        sol = sdeint(f, g, y0, ts, method, bm=bm, time_axis=0)
        return float(jnp.mean(sol[-1] ** 2))

    exact = sig**2 / (2 * th)
    ratio_pred, _ = _damped_stationary_ratio(th * h)
    m2 = run("implicit_sra1_damped")
    np.testing.assert_allclose(m2 / exact, ratio_pred, rtol=0.08)
    m2_sra = run("implicit_sra1")
    assert m2_sra / m2 > 4.0, (m2_sra, m2)


def test_implicit_sra1_damped_linear_sigma_exact():
    """Zero drift, LINEAR sigma(t) = a + b t: the step's noise term
    g(t1)(dW - U/h) + g(t0) U/h equals the exact int sigma(s) dW_s =
    a dW + b (t1 dW - U) per step, so the chain telescopes to the
    whole-span closed form y0 + a W(0,T) + b (T W(0,T) - U(0,T)) to
    machine precision (the structural reason the ~1.9 measured order
    beats the guaranteed 1.5 on near-linear sigma)."""
    a_c, b_c = 0.4, 0.9
    y0 = jnp.ones((8,), jnp.float64)
    key = jax.random.key(13)

    def make_bm():
        return BrownianInterval(0.0, 1.0, size=(8,), key=key,
                                dtype=jnp.float64,
                                levy_area_approximation="space-time-time")

    ts = jnp.linspace(0.0, 1.0, 9)
    sol = sdeint(lambda t, y: jnp.zeros_like(y),
                 lambda t, y: (a_c + b_c * t) * jnp.ones_like(y),
                 y0, ts, "implicit_sra1_damped", bm=make_bm(), time_axis=0)
    w, u = make_bm()(0.0, 1.0, return_U=True)
    expect = y0 + a_c * w + b_c * (1.0 * w - u)
    np.testing.assert_allclose(np.asarray(sol[-1]), np.asarray(expect),
                               atol=1e-12)


def test_implicit_sra1_damped_reverse_and_adjoint():
    """Reverse retraces (the reversed system stays additive; ReverseBrownian
    supplies the exact (dW~, I10~) algebra) and the replay adjoint matches
    direct backprop — the same contracts the other implicit schemes pin."""
    theta, sigma = 0.9, 0.5
    y0 = jnp.ones((32,), jnp.float64)
    bm = BrownianInterval(0.0, 1.0, size=(32,), key=jax.random.key(31),
                          dtype=jnp.float64,
                          levy_area_approximation="space-time-time")
    f = lambda t, y: -theta * y
    g = lambda t, y: sigma * jnp.ones_like(y)
    ts = jnp.linspace(0.0, 1.0, 33)
    fwd = sdeint(f, g, y0, ts, "implicit_sra1_damped", bm=bm, time_axis=0)
    back = sdeint(f, g, fwd[-1], ts[::-1], "implicit_sra1_damped", bm=bm,
                  time_axis=0)
    assert float(jnp.mean(jnp.abs(back[-1] - y0))) < 5e-5

    def make_bm2():
        return BrownianInterval(0.0, 1.0, size=(32,), key=jax.random.key(7),
                                dtype=jnp.float64,
                                levy_area_approximation="space-time-time")

    def loss(a, run):
        fa = lambda t, y: -a * y
        sol = run(fa, g, y0, ts, "implicit_sra1_damped", bm=make_bm2(),
                  time_axis=0, options={"newton_iters": 10})
        return jnp.sum(sol[-1])

    a = jnp.asarray(1.3, jnp.float64)
    vd, gd = jax.value_and_grad(lambda x: loss(x, sdeint))(a)
    va, ga = jax.value_and_grad(lambda x: loss(x, sdeint_adjoint))(a)
    np.testing.assert_allclose(float(va), float(vd), rtol=1e-12)
    np.testing.assert_allclose(float(ga), float(gd), rtol=1e-9)


def test_implicit_sra1_damped_general_constant_g_telescopes():
    """Matrix-additive variant, zero drift, constant G: every stage
    injection cancels through the zero drift and the chain telescopes to
    y0 + G W(0,T) exactly."""
    rng = np.random.RandomState(4)
    D, M = 5, 3
    G = jnp.asarray(rng.randn(D, M) * 0.6, jnp.float64)
    y0 = jnp.asarray(rng.randn(16, D), jnp.float64)
    key = jax.random.key(21)

    def make_bm():
        return BrownianInterval(0.0, 1.0, size=(16, M), key=key,
                                dtype=jnp.float64,
                                levy_area_approximation="space-time-time")

    ts = jnp.linspace(0.0, 1.0, 9)
    sol = sdeint(lambda t, y: jnp.zeros_like(y), lambda t, y: G, y0, ts,
                 "implicit_sra1_damped_general", bm=make_bm(), noise_dim=M,
                 time_axis=0)
    w = make_bm()(0.0, 1.0)
    expect = y0 + jnp.einsum("dm,bm->bd", G, w)
    np.testing.assert_allclose(np.asarray(sol[-1]), np.asarray(expect),
                               atol=1e-12)
