"""Implicit (backward) Euler: A-stability on a stiff problem + order 1."""

import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import odeint


def test_stiff_stability():
    """lambda = -1000, dt = 0.1: implicit stays bounded and accurate at the
    slow manifold; explicit Euler diverges violently (|1+dt*l| = 99)."""
    lam = -1000.0
    f = lambda t, y: lam * (y - jnp.cos(t)) - jnp.sin(t)  # y -> cos(t) fast
    ts = jnp.linspace(0.0, 2.0, 21)
    y_imp = odeint(f, jnp.asarray(1.5), ts, "implicit_euler", time_axis=0)
    assert bool(jnp.all(jnp.isfinite(y_imp)))
    np.testing.assert_allclose(np.asarray(y_imp[-1]), np.cos(2.0), atol=5e-3)

    y_exp = odeint(f, jnp.asarray(1.5), ts, "euler", time_axis=0)
    assert not bool(jnp.all(jnp.abs(y_exp) < 1e3))  # explicit blows up


def test_order_one():
    f = lambda t, y: jnp.cos(t) * y
    exact = float(np.exp(np.sin(2.0)))
    errs = []
    for n in (33, 65, 129):
        y = odeint(f, jnp.ones(()), jnp.linspace(0.0, 2.0, n), "implicit_euler",
                   time_axis=0)
        errs.append(abs(float(y[-1]) - exact))
    order = np.mean([np.log2(errs[i] / errs[i + 1]) for i in range(2)])
    assert abs(order - 1.0) < 0.3, (order, errs)


def test_pytree_state():
    def f(t, y):
        return {"a": -50.0 * y["a"], "b": -0.5 * y["b"]}

    y0 = {"a": jnp.ones((2,)), "b": jnp.full((3,), 2.0)}
    y = odeint(f, y0, jnp.linspace(0.0, 1.0, 11), "implicit_euler", time_axis=0)
    np.testing.assert_allclose(np.asarray(y["b"][-1]), 2 * np.exp(-0.5), rtol=2e-2)
    assert bool(jnp.all(jnp.abs(y["a"]) <= 1.0))


def test_krylov_matches_dense_on_stiff_heat_equation():
    """Matrix-free Newton-Krylov vs the dense-Jacobian solver on a stiff
    method-of-lines heat equation (D = 96 interior points: lambda_max ~
    -4/dx^2 ~ -3.8e4, far beyond explicit stability at dt = 0.02), and both
    against the analytic single-mode decay exp(-pi^2 t) sin(pi x)."""
    import jax

    D = 96
    dx = 1.0 / (D + 1)
    x = jnp.arange(1, D + 1, dtype=jnp.float64) * dx

    def laplacian(t, u):
        u_pad = jnp.pad(u, 1)  # Dirichlet u(0)=u(1)=0
        return (u_pad[2:] - 2.0 * u_pad[1:-1] + u_pad[:-2]) / dx**2

    u0 = jnp.sin(jnp.pi * x)
    ts = jnp.linspace(0.0, 0.1, 6)  # dt = 0.02

    sol_krylov = odeint(laplacian, u0, ts, "implicit_euler_krylov", time_axis=0)
    sol_dense = odeint(laplacian, u0, ts, "implicit_euler", time_axis=0)
    # same Newton iteration, different linear solver: near machine-eps match
    np.testing.assert_allclose(
        np.asarray(sol_krylov), np.asarray(sol_dense), rtol=1e-9, atol=1e-11
    )
    # discrete analytic solution: backward Euler damps the discrete eigenmode
    # sin(pi x) by (1 + dt * mu)^-1 per step, mu = (2 - 2 cos(pi dx)) / dx^2
    mu = (2.0 - 2.0 * np.cos(np.pi * dx)) / dx**2
    decay = (1.0 + 0.02 * mu) ** -5
    np.testing.assert_allclose(
        np.asarray(sol_krylov[-1]), decay * np.asarray(u0), rtol=1e-7, atol=1e-9
    )
    # the whole solve is one compiled program (fixed GMRES work per step)
    jitted = jax.jit(
        lambda u: odeint(laplacian, u, ts, "implicit_euler_krylov", time_axis=0)
    )
    np.testing.assert_allclose(
        np.asarray(jitted(u0)), np.asarray(sol_krylov), rtol=1e-10
    )


def test_krylov_gradients_flow():
    """Parameter gradients through the Newton-Krylov fori_loop/GMRES step
    (all plain lax control flow: direct backprop works) vs finite differences."""
    import jax

    def loss(lam):
        f = lambda t, y: lam * (y - jnp.cos(t)) - jnp.sin(t)
        y = odeint(f, jnp.asarray(1.5), jnp.linspace(0.0, 1.0, 11),
                   "implicit_euler_krylov", time_axis=0)
        return jnp.sum(y**2)

    lam0 = jnp.asarray(-40.0)
    g = jax.grad(loss)(lam0)
    eps = 1e-5
    fd = (loss(lam0 + eps) - loss(lam0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=5e-5)


def test_sdirk2_stiff_accuracy_and_order():
    """Alexander SDIRK2 (L-stable, stiffly accurate): order 2 on a smooth
    problem and far better stiff accuracy than backward Euler at the same dt."""
    lam = -1000.0
    f = lambda t, y: lam * (y - jnp.cos(t)) - jnp.sin(t)
    ts = jnp.linspace(0.0, 2.0, 21)
    y = odeint(f, jnp.asarray(1.5), ts, "sdirk2", time_axis=0)
    assert bool(jnp.all(jnp.isfinite(y)))
    # implicit_euler at this dt lands ~5e-3 off; SDIRK2 ~1e-5
    np.testing.assert_allclose(np.asarray(y[-1]), np.cos(2.0), atol=5e-5)

    g = lambda t, y: jnp.cos(t) * y
    exact = float(np.exp(np.sin(2.0)))
    errs = []
    for n in (33, 65, 129):
        yy = odeint(g, jnp.ones(()), jnp.linspace(0.0, 2.0, n), "sdirk2",
                    time_axis=0)
        errs.append(abs(float(yy[-1]) - exact))
    order = np.mean([np.log2(errs[i] / errs[i + 1]) for i in range(2)])
    assert abs(order - 2.0) < 0.2, (order, errs)


def test_sdirk2_l_stability():
    """One enormous step (lam*dt = -1e8) must damp to ~0: R(-inf) = 0 for
    L-stable SDIRK2, where the A-stable-only trapezoidal rule gives ~ -y0."""
    y = odeint(lambda t, y: -1e8 * y, jnp.ones(()), jnp.asarray([0.0, 1.0]),
               "sdirk2", time_axis=0)
    assert abs(float(y[-1])) < 1e-6


def test_sdirk2_krylov_matches_dense():
    lam = -1000.0
    f = lambda t, y: lam * (y - jnp.cos(t)) - jnp.sin(t)
    ts = jnp.linspace(0.0, 2.0, 21)
    y_d = odeint(f, jnp.asarray(1.5), ts, "sdirk2", time_axis=0)
    y_k = odeint(f, jnp.asarray(1.5), ts, "sdirk2_krylov", time_axis=0)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_d), rtol=1e-10,
                               atol=1e-12)


def test_sdirk2_gradients_vs_fd():
    import jax

    def loss(lam):
        f = lambda t, y: lam * (y - jnp.cos(t)) - jnp.sin(t)
        y = odeint(f, jnp.asarray(1.5), jnp.linspace(0.0, 1.0, 11), "sdirk2",
                   time_axis=0)
        return jnp.sum(y**2)

    lam0 = jnp.asarray(-40.0)
    g = jax.grad(loss)(lam0)
    eps = 1e-5
    fd = (loss(lam0 + eps) - loss(lam0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=5e-5)


def test_sdirk3_order_conditions_and_convergence():
    """Crouzeix 2-stage SDIRK, gamma = 1/2 + sqrt(3)/6: the four order-3
    conditions hold EXACTLY for this gamma (it is the A-stable root of
    g^2 - g + 1/6 = 0), and the measured convergence order is ~3."""
    g = 0.5 + np.sqrt(3.0) / 6.0
    b = np.array([0.5, 0.5])
    c = np.array([g, 1.0 - g])
    A = np.array([[g, 0.0], [1.0 - 2.0 * g, g]])
    assert abs(b.sum() - 1.0) < 1e-15
    assert abs(b @ c - 0.5) < 1e-15
    assert abs(b @ c**2 - 1.0 / 3.0) < 1e-15
    assert abs(b @ A @ c - 1.0 / 6.0) < 1e-15

    f = lambda t, y: jnp.cos(t) * y
    exact = float(np.exp(np.sin(2.0)))
    errs = []
    for n in (17, 33, 65):
        y = odeint(f, jnp.ones(()), jnp.linspace(0.0, 2.0, n), "sdirk3",
                   time_axis=0)
        errs.append(abs(float(y[-1]) - exact))
    order = np.mean([np.log2(errs[i] / errs[i + 1]) for i in range(2)])
    assert abs(order - 3.0) < 0.2, (order, errs)


def test_sdirk3_a_stability():
    """A-stable (not L-stable): lambda = -1000 with dt = 0.1 stays bounded and
    tracks the slow manifold."""
    f = lambda t, y: -1000.0 * (y - jnp.cos(t)) - jnp.sin(t)
    y = odeint(f, jnp.asarray(1.5), jnp.linspace(0.0, 2.0, 21), "sdirk3",
               time_axis=0)
    assert bool(jnp.all(jnp.isfinite(y)))
    np.testing.assert_allclose(np.asarray(y[-1]), np.cos(2.0), atol=2e-3)


def test_implicit_adjoint_composes_and_converges():
    """odeint_adjoint through sdirk2: the continuous adjoint re-integrates the
    augmented system with the same implicit solver, so it stays STABLE where
    an explicit solver's adjoint explodes (rk4 at dt*lambda = -4 returns
    ~1e15), and its O(dt^2) gradient error converges to the exact discrete
    gradient under refinement (measured ratio-err 15 -> 2.4e-4 over 11 -> 641
    points; pinned at the 161-point level here)."""
    import jax

    from paddlexde_tpu import odeint_adjoint

    lam0 = jnp.asarray(-40.0)

    def loss(fn, lam, n):
        f = lambda t, y: lam * (y - jnp.cos(t)) - jnp.sin(t)
        y = fn(f, jnp.asarray(1.5), jnp.linspace(0.0, 1.0, n), "sdirk2",
               time_axis=0)
        return jnp.sum(y[:: (n - 1) // 10] ** 2)

    g_adj = float(jax.grad(lambda l: loss(odeint_adjoint, l, 161))(lam0))
    g_dir = float(jax.grad(lambda l: loss(odeint, l, 161))(lam0))
    assert abs(g_adj - g_dir) / abs(g_dir) < 2e-2, (g_adj, g_dir)


def test_dirichlet_heat_preconditioner_unlocks_f32_stiffness():
    """Spectral (DST) exact inverse of I - nu*dt*Lap as the GMRES M: at
    D=2048/f32 (dt*||J|| ~ 1.7e5, the unpreconditioned f32 envelope edge,
    where plain GMRES leaves ~2e-2 error) the preconditioned solve is
    accurate to f32 roundoff. At D=8192 (measured separately) plain GMRES
    diverges to err ~55 while preconditioned lands at 1.4e-5."""
    from paddlexde_tpu.solver.implicit import make_implicit_euler_krylov_step
    from paddlexde_tpu.utils.preconditioners import (
        dirichlet_heat_preconditioner,
        dst1,
    )
    from paddlexde_tpu.xde.term import ode_term

    # dst1 self-inverse contract
    v = jnp.asarray(np.random.RandomState(0).randn(64).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dst1(dst1(v))) / (2 * 65), np.asarray(v), rtol=1e-5, atol=1e-6
    )

    D = 2048
    dx = 1.0 / (D + 1)

    def lap(t, u):
        up = jnp.pad(u, 1)
        return (up[2:] - 2.0 * up[1:-1] + up[:-2]) / dx**2

    term = ode_term(lap)
    u0 = jnp.sin(jnp.pi * jnp.arange(1, D + 1, dtype=jnp.float32) * dx)
    dt = 0.01
    M = dirichlet_heat_preconditioner(D, dx, dt)
    step = make_implicit_euler_krylov_step(preconditioner=M)
    y = u0
    for i in range(5):
        y, _ = step(term, i * dt, (i + 1) * dt, y)
    mu1 = (2.0 - 2.0 * np.cos(np.pi * dx)) / dx**2
    exact = (1.0 + dt * mu1) ** -5
    err = float(jnp.max(jnp.abs(y - exact * u0)))
    assert err < 1e-4, err  # plain GMRES: ~2e-2 here, ~55 at D=8192


def test_periodic_heat_preconditioner():
    """FFT-diagonalized exact inverse for periodic boundaries: the
    preconditioned Krylov solve of the periodic heat equation at D=4096/f32
    (dt*||J|| ~ 6.7e5, beyond the unpreconditioned f32 envelope) matches the
    discrete-exact single-mode decay."""
    from paddlexde_tpu.solver.implicit import make_implicit_euler_krylov_step
    from paddlexde_tpu.utils.preconditioners import periodic_heat_preconditioner

    D = 4096
    dx = 1.0 / D

    def lap(t, u):
        return (jnp.roll(u, -1) - 2.0 * u + jnp.roll(u, 1)) / dx**2

    x = jnp.arange(D, dtype=jnp.float32) * dx
    u0 = jnp.sin(2 * jnp.pi * x)
    dt = 0.01
    step = make_implicit_euler_krylov_step(
        preconditioner=periodic_heat_preconditioner(D, dx, dt)
    )
    ts = jnp.linspace(0.0, 0.05, 6, dtype=jnp.float32)
    sol = odeint(lap, u0, ts, step, time_axis=0)
    mu1 = (2.0 - 2.0 * np.cos(2 * np.pi / D)) / dx**2
    err = float(jnp.max(jnp.abs(sol[-1] - (1 + dt * mu1) ** -5 * u0)))
    assert err < 1e-4, err


def test_neumann_heat_preconditioner():
    """DCT-II-diagonalized exact inverse for reflecting boundaries: the
    preconditioned Krylov solve of the Neumann heat equation conserves mass
    (the Neumann invariant) and matches the discrete-exact decay of a cosine
    mode at D=4096/f32."""
    from paddlexde_tpu.solver.implicit import make_implicit_euler_krylov_step
    from paddlexde_tpu.utils.preconditioners import neumann_heat_preconditioner

    D = 4096
    dx = 1.0 / D

    def lap(t, u):
        up = jnp.concatenate([u[:1], u, u[-1:]])
        return (up[2:] - 2.0 * up[1:-1] + up[:-2]) / dx**2

    x = (jnp.arange(D, dtype=jnp.float32) + 0.5) * dx
    u0 = 1.0 + jnp.cos(jnp.pi * x)  # DCT mode k=1 on the staggered grid
    dt = 0.01
    step = make_implicit_euler_krylov_step(
        preconditioner=neumann_heat_preconditioner(D, dx, dt)
    )
    ts = jnp.linspace(0.0, 0.05, 6, dtype=jnp.float32)
    sol = odeint(lap, u0, ts, step, time_axis=0)
    mu1 = (2.0 - 2.0 * np.cos(np.pi / D)) / dx**2
    expect = 1.0 + (1 + dt * mu1) ** -5 * jnp.cos(jnp.pi * x)
    err = float(jnp.max(jnp.abs(sol[-1] - expect)))
    assert err < 1e-4, err
    # mass conservation (Neumann invariant) at every output time, to f32
    # roundoff accumulated over 5 Newton solves
    mass = np.asarray(jnp.mean(sol, axis=-1))
    np.testing.assert_allclose(mass, mass[0], rtol=1e-5)


def test_jacobi_preconditioner_rate_spread():
    """General fallback (no structure assumed): per-component rate spread
    1..1e7 with weak off-diagonal coupling. At dt*||J|| = 1e6 (f32), plain
    GMRES is far outside its envelope; the probed-diagonal Jacobi M makes
    backward Euler land on the closed-form-accurate relaxation. Hutchinson
    (probes=k) and exact-diagonal modes must agree for this diagonally
    dominant operator."""
    import jax

    from paddlexde_tpu.solver.implicit import make_implicit_euler_krylov_step
    from paddlexde_tpu.utils.preconditioners import jacobi_preconditioner
    from paddlexde_tpu.xde.term import ode_term

    D = 256
    rng = np.random.RandomState(0)
    rates = jnp.asarray(
        10.0 ** rng.uniform(0, 7, D).astype(np.float32), jnp.float32
    )
    coup = jnp.asarray(rng.randn(D, D).astype(np.float32)) * 0.05
    coup = coup - jnp.diag(jnp.diag(coup))

    def f(t, y):
        return -rates * y + coup @ y

    y0 = jnp.ones((D,), jnp.float32)
    dt = jnp.float32(0.1)  # dt * max_rate = 1e6

    op = lambda v: v - dt * jax.jvp(lambda y: f(0.0, y), (y0,), (v,))[1]
    m_exact = jacobi_preconditioner(op, y0)
    m_hutch = jacobi_preconditioner(op, y0, probes=8, key=3)

    # both estimates act identically on this diagonally dominant operator
    v = jnp.asarray(rng.randn(D).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(m_hutch(v)), np.asarray(m_exact(v)), rtol=0.2
    )

    term = ode_term(f)
    # one backward-Euler step; reference by dense solve of (I - dt J) y1 = y0
    jac = jax.jacfwd(lambda y: f(0.0, y))(y0)
    a_mat = jnp.eye(D) - dt * jac
    ref = jnp.linalg.solve(a_mat.astype(jnp.float64), y0.astype(jnp.float64))

    def endpoint(precond):
        step = make_implicit_euler_krylov_step(preconditioner=precond)
        y1, _ = step(term, jnp.float32(0.0), dt, y0)
        return np.asarray(y1)

    err_plain = np.max(np.abs(endpoint(None) - np.asarray(ref)))
    err_jac = np.max(np.abs(endpoint(m_exact) - np.asarray(ref)))
    err_hutch = np.max(np.abs(endpoint(m_hutch) - np.asarray(ref)))
    assert err_jac < 5e-4, (err_plain, err_jac)
    assert err_hutch < 5e-3, (err_plain, err_hutch)
    assert err_jac < err_plain * 0.01 or err_plain > 1.0, (err_plain, err_jac)


def test_jacobi_preconditioner_guards():
    """probes=0 would make the Hutchinson mean NaN and silently poison the
    solve — must refuse; the zero-operator floor must fall back to identity."""
    from paddlexde_tpu.utils.preconditioners import jacobi_preconditioner

    y0 = jnp.ones((8,))
    op = lambda v: 2.0 * v
    with pytest.raises(ValueError, match="probes"):
        jacobi_preconditioner(op, y0, probes=0)
    z = jacobi_preconditioner(lambda v: jnp.zeros_like(v), y0)
    out = z(jnp.ones((8,)))
    np.testing.assert_allclose(np.asarray(out), np.ones(8))
