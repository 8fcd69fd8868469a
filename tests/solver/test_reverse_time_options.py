"""Reverse-time solves with TIME-VALUED solver options (round-3 bug class).

Decreasing spans are canonicalized at dispatch (t -> -s, reversed term;
``functional/solve.py``), but options that name points in original time —
``grid``, ``grid_constructor``, ``step_t``, ``jump_t`` — used to stay
un-negated, silently producing wrong interpolants (found live by the CNF
example: an explicit decreasing grid returned 0.315 where exp(0.7)=2.014).
Also pinned: the direction-normalized searchsorted in the dense-output
gathers (direct solve_fixed/solve_adams with decreasing grids) and the
adams 'grid' option no longer being silently dropped.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import paddlexde_tpu as pxt

A = 0.7
F = lambda t, y: -A * y


def _exact(t):
    # y(1) = 1 integrated to time t under dy/dt = -A y
    return np.exp(A * (1.0 - np.asarray(t, np.float64)))


def test_reverse_explicit_grid_endpoint_and_interior():
    ts = np.asarray([1.0, 0.6, 0.3, 0.0])
    ys = pxt.odeint(F, jnp.asarray([1.0]), ts, "rk4", time_axis=0,
                    options={"grid": np.linspace(1.0, 0.0, 33)})
    # interior points are LINEAR dense output between h=1/32 nodes: O(h^2)
    np.testing.assert_allclose(np.asarray(ys[:, 0]), _exact(ts), rtol=3e-4)


def test_reverse_explicit_grid_cubic_interp():
    ts = np.asarray([1.0, 0.45, 0.0])
    ys = pxt.odeint(F, jnp.asarray([1.0]), ts, "rk4", time_axis=0,
                    options={"grid": np.linspace(1.0, 0.0, 17),
                             "interp": "cubic"})
    np.testing.assert_allclose(np.asarray(ys[:, 0]), _exact(ts), rtol=1e-5)


def test_reverse_grid_constructor():
    ys = pxt.odeint(
        F, jnp.asarray([1.0]), np.asarray([1.0, 0.0]), "rk4", time_axis=0,
        options={"grid_constructor": lambda ts: jnp.linspace(ts[0], ts[-1], 33)},
    )
    np.testing.assert_allclose(float(ys[-1, 0]), _exact(0.0), rtol=1e-5)


def test_reverse_step_t_adaptive():
    ys, stats = pxt.odeint(
        F, jnp.asarray([1.0]), np.asarray([1.0, 0.0]), "dopri5", time_axis=0,
        options={"step_t": np.asarray([0.5]), "return_stats": True},
    )
    assert int(stats.status) == 0
    np.testing.assert_allclose(float(ys[-1, 0]), _exact(0.0), rtol=1e-6)


def test_adams_explicit_grid_not_dropped():
    """'grid' used to be silently filtered out for adams (kw whitelist): a
    2-node default grid would give a visibly coarser answer. With the 33-node
    grid the error must be at the fine-grid scale, forward and reverse."""
    fine = pxt.odeint(F, jnp.asarray([1.0]), np.asarray([1.0, 0.5, 0.0]),
                      "adams", time_axis=0,
                      options={"grid": np.linspace(1.0, 0.0, 33)})
    np.testing.assert_allclose(
        np.asarray(fine[:, 0]), _exact([1.0, 0.5, 0.0]), rtol=2e-4
    )
    fwd = pxt.odeint(F, jnp.asarray([2.0]), np.asarray([0.0, 1.0]),
                     "adams", time_axis=0,
                     options={"grid": np.linspace(0.0, 1.0, 33)})
    np.testing.assert_allclose(float(fwd[-1, 0]), 2.0 * np.exp(-A), rtol=2e-4)


def test_direct_solve_fixed_decreasing_grid():
    """The engine-level gather itself handles decreasing grids (direction-
    normalized searchsorted) without dispatch canonicalization."""
    from paddlexde_tpu.solver.fixed import solve_fixed
    from paddlexde_tpu.xde.term import ode_term

    term = ode_term(F)
    ts = jnp.asarray([1.0, 0.7, 0.2, 0.0])
    sol = solve_fixed(term, jnp.asarray([1.0]), ts, method="rk4",
                      grid=jnp.linspace(1.0, 0.0, 33))
    np.testing.assert_allclose(  # linear dense output: O(h^2) interior
        np.asarray(sol[:, 0]), _exact(np.asarray(ts)), rtol=3e-4
    )


def test_traced_reverse_span_under_jit():
    """TRACED decreasing spans (t_span as a jit argument) used to be
    'assumed increasing': the adaptive while_loop exited immediately and
    silently returned y0 — wrong values and all-zero gradients (found live:
    a jitted CNF train step learned nothing while eager learned). The
    branchless sign canonicalization must make jit == eager."""
    import jax

    for solver in ("dopri5", "tsit5", "rk4"):
        run = lambda ts: pxt.odeint(F, jnp.asarray([1.0]), ts, solver,
                                    time_axis=0)
        out_j = jax.jit(run)(jnp.asarray([1.0, 0.0]))
        np.testing.assert_allclose(float(out_j[-1, 0]), _exact(0.0),
                                   rtol=1e-3 if solver == "rk4" else 1e-5)
    # dense engine too
    run = lambda ts: pxt.odeint(F, jnp.asarray([1.0]), ts, "dopri5",
                                time_axis=0, options={"max_steps": 64})
    out = jax.jit(run)(jnp.linspace(1.0, 0.0, 5))
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               _exact(np.linspace(1.0, 0.0, 5)), rtol=1e-5)


def test_traced_reverse_adjoint_jit_equals_eager():
    """The CNF failure shape: grad of an adaptive odeint_adjoint over a
    decreasing span must be identical under an outer jit (it was ZERO)."""
    import jax

    w0 = jax.random.normal(jax.random.PRNGKey(0), (2, 2)) * 0.3
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))

    def loss(w):
        ys = pxt.odeint_adjoint(lambda t, z: jnp.tanh(z @ w), x,
                                np.asarray([1.0, 0.0]), "dopri5", time_axis=0)
        return jnp.sum(ys[-1] ** 2)

    g_e = jax.grad(loss)(w0)
    g_j = jax.jit(jax.grad(loss))(w0)
    assert float(jnp.linalg.norm(g_e)) > 0.1
    np.testing.assert_allclose(np.asarray(g_j), np.asarray(g_e), rtol=1e-6)


def test_adjoint_grid_refinement_survives_jit():
    """Review find: jnp.asarray stages even concrete numpy constants to
    tracers under an ambient jit, so the adjoint's backward-grid refinement
    (k_sub) silently disabled under jit — jit(grad(f)) carried the coarse
    one-step-per-interval 0.8%-class gradient error while eager grad(f) was
    refined. jit and eager must now be bit-identical and near-exact."""
    import jax

    def loss(a):
        ys = pxt.odeint_adjoint(
            lambda t, y: a * y, jnp.asarray(1.3), np.asarray([0.0, 1.0]),
            "rk4", time_axis=0, options={"grid": np.linspace(0.0, 1.0, 65)},
        )
        return ys[-1] ** 2

    exact = 2 * 1.3**2 * np.exp(2 * 0.4)
    g_e = float(jax.grad(loss)(jnp.asarray(0.4)))
    g_j = float(jax.jit(jax.grad(loss))(jnp.asarray(0.4)))
    assert g_e == g_j, (g_e, g_j)
    np.testing.assert_allclose(g_j, exact, rtol=2e-5)


def test_reverse_adjoint_with_explicit_grid():
    """The CNF training shape: odeint_adjoint over a decreasing span with an
    explicit grid — value AND gradient vs closed form."""
    import jax

    grid = np.linspace(1.0, 0.0, 33)

    def loss(a):
        ys = pxt.odeint_adjoint(
            lambda t, y: -a * y, jnp.asarray([1.0]), np.asarray([1.0, 0.0]),
            "rk4", time_axis=0, options={"grid": grid},
        )
        return ys[-1, 0]

    val, g = jax.value_and_grad(loss)(jnp.asarray(A))
    np.testing.assert_allclose(float(val), np.exp(A), rtol=1e-5)
    np.testing.assert_allclose(float(g), np.exp(A), rtol=1e-4)
