"""Adaptive SDE stepping (``solver/sde_adaptive.py``; ``sdeint(adaptive=True)``).

No counterpart exists in the reference (its sdeint is a fixed-grid Euler loop,
``paddlexde/functional/sdeint.py:9-37`` in DrownFish19/PaddleXDE). The claims
pinned here:

- tolerance actually controls the pathwise error (same-path closed forms);
- the controller concentrates steps where the local error lives — on a
  noise-burst problem adaptive beats a uniform grid with the SAME step budget;
- reverse-time adaptivity retraces the forward path;
- status flags (MAX_STEPS_EXCEEDED / DT_UNDERFLOW) replace silent hangs;
- the step-doubling estimate is consistent for higher-order schemes
  (tree (W, I10) chaining) and general matrix noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paddlexde_tpu as pxt
from paddlexde_tpu.brownian.api import BrownianInterval
from paddlexde_tpu.solver.adaptive import DT_UNDERFLOW, MAX_STEPS_EXCEEDED


def _gbm_setup(key=7, mu=1.0, sigma=0.8):
    f = lambda t, y: mu * y
    g = lambda t, y: sigma * y
    y0 = jnp.array([1.0], dtype=jnp.float64)
    bm = BrownianInterval(
        0.0, 1.0, size=(1,), key=jax.random.key(key), dtype=jnp.float64
    )

    def closed(tv):
        w = bm(0.0, tv)
        return y0 * jnp.exp((mu - 0.5 * sigma**2) * tv + sigma * w)

    return f, g, y0, bm, closed


def test_tolerance_controls_error():
    """Tighter rtol -> more accepted steps AND less same-path error (GBM,
    milstein); statuses clean."""
    f, g, y0, bm, closed = _gbm_setup()
    t = jnp.linspace(0.0, 1.0, 5)
    errs, accepts = [], []
    for rtol in (1e-2, 1e-4):
        sol, stats = pxt.sdeint(
            f, g, y0, t, solver="milstein", bm=bm, adaptive=True,
            rtol=rtol, atol=rtol * 1e-2,
            options={"return_stats": True}, time_axis=0,
        )
        errs.append(float(jnp.abs(sol[-1] - closed(1.0))[0]))
        accepts.append(int(stats.n_accept))
        assert int(stats.status) == 0
        assert int(stats.nfe) == 3 * (int(stats.n_accept) + int(stats.n_reject))
    assert accepts[1] > 2 * accepts[0]
    assert errs[1] < errs[0] / 3
    assert errs[1] < 5e-3


def test_adaptive_beats_uniform_at_equal_step_budget():
    """Additive noise burst: g(t) spikes in a narrow window. The adaptive
    controller packs steps into the burst; a UNIFORM grid spending the same
    number of steps does measurably worse on the same path."""
    y0 = jnp.array([0.0], dtype=jnp.float64)
    f = lambda t, y: jnp.zeros_like(y)

    def g(t, y):
        burst = 5.0 * jnp.exp(-(((t - 0.5) / 0.03) ** 2))
        return (0.05 + burst) * jnp.ones_like(y)

    bm = BrownianInterval(
        0.0, 1.0, size=(1,), key=jax.random.key(3), dtype=jnp.float64
    )
    t = jnp.array([0.0, 1.0], dtype=jnp.float64)

    # reference: zero drift + additive noise => y(T) = ∫ g(s) dW_s, computed
    # on a 2^13-step fixed grid of the SAME tree path
    t_fine = jnp.linspace(0.0, 1.0, 8193)
    ref = pxt.sdeint(f, g, y0, t_fine, solver="euler", bm=bm, time_axis=0)[-1]

    sol_a, stats = pxt.sdeint(
        f, g, y0, t, solver="euler", bm=bm, adaptive=True,
        rtol=1e-3, atol=1e-5, options={"return_stats": True}, time_axis=0,
    )
    n_adaptive = int(stats.n_accept)
    err_adaptive = float(jnp.abs(sol_a[-1] - ref)[0])

    t_uniform = jnp.linspace(0.0, 1.0, n_adaptive + 1)
    sol_u = pxt.sdeint(f, g, y0, t_uniform, solver="euler", bm=bm, time_axis=0)
    err_uniform = float(jnp.abs(sol_u[-1] - ref)[0])

    assert int(stats.status) == 0
    assert 10 < n_adaptive < 2000
    # the margin is the point: same budget, concentrated where g varies
    assert err_adaptive < 0.5 * err_uniform, (err_adaptive, err_uniform)


def test_adaptive_matches_fine_fixed_grid():
    """At tight tolerance the adaptive solution converges to the fine-grid
    fixed-step solution of the same scheme on the same path."""
    f, g, y0, bm, _ = _gbm_setup(key=11)
    t = jnp.linspace(0.0, 1.0, 3)
    sol = pxt.sdeint(
        f, g, y0, t, solver="milstein", bm=bm, adaptive=True,
        rtol=1e-6, atol=1e-8, time_axis=0,
    )
    t_fine = jnp.linspace(0.0, 1.0, 4097)
    fine = pxt.sdeint(f, g, y0, t_fine, solver="milstein", bm=bm, time_axis=0)
    # both are within ~2e-4 of the closed form at these grids; compare
    # RELATIVE to the state scale (pathwise error accumulates multiplicatively
    # for GBM)
    assert jnp.allclose(sol[-1], fine[-1], rtol=5e-3, atol=1e-4)


def test_reverse_adaptive_retraces():
    """reverse=True + adaptive: integrate forward (fixed fine grid), then
    adaptively back from y(T) — lands near y0 on the same path."""
    f, g, y0, bm, _ = _gbm_setup(key=5, sigma=0.5)
    t_fine = jnp.linspace(0.0, 1.0, 2049)
    y_t = pxt.sdeint(f, g, y0, t_fine, solver="milstein", bm=bm, time_axis=0)[-1]
    t = jnp.linspace(0.0, 1.0, 3)
    back = pxt.sdeint(
        f, g, y_t, t, solver="milstein", bm=bm, adaptive=True, reverse=True,
        rtol=1e-5, atol=1e-7, time_axis=0,
    )
    # reverse output is reported in the given (increasing) span order:
    # row 0 is t=0
    assert jnp.allclose(back[0], y0, atol=2e-2), (back[0], y0)


def test_status_max_steps_exceeded():
    f, g, y0, bm, _ = _gbm_setup()
    t = jnp.linspace(0.0, 1.0, 3)
    sol, stats = pxt.sdeint(
        f, g, y0, t, solver="milstein", bm=bm, adaptive=True,
        rtol=1e-8, atol=1e-10,
        options={"return_stats": True, "max_num_steps": 5}, time_axis=0,
    )
    assert int(stats.status) & MAX_STEPS_EXCEEDED
    assert bool(jnp.all(jnp.isfinite(sol)))  # frozen state, not garbage


def test_status_dt_underflow_at_floor():
    """A min_step floor + unreachable tolerance: steps are force-accepted at
    the floor with DT_UNDERFLOW flagged (no hang, no silent success)."""
    f, g, y0, bm, _ = _gbm_setup()
    t = jnp.linspace(0.0, 1.0, 3)
    sol, stats = pxt.sdeint(
        f, g, y0, t, solver="euler", bm=bm, adaptive=True,
        rtol=1e-12, atol=1e-14,
        options={"return_stats": True, "min_step": 0.05}, time_axis=0,
    )
    assert int(stats.status) & DT_UNDERFLOW
    assert bool(jnp.all(jnp.isfinite(sol)))
    # the floor bounds the work: ~1/0.05 accepted steps per unit time
    assert int(stats.n_accept) <= 30


def test_general_noise_adaptive():
    """Matrix-noise schemes run under the adaptive engine (tree chaining
    keeps the half/full comparison on one path): commutative 2-noise GBM
    vs its closed form."""
    a, b1, b2 = 0.7, 0.3, 0.2
    y0 = jnp.array([[1.0]], dtype=jnp.float64)  # [batch=1, D=1]
    f = lambda t, y: a * y
    G = lambda t, y: jnp.stack([b1 * y, b2 * y], axis=-1)  # [..., 1, 2]
    bm = BrownianInterval(
        0.0, 1.0, size=(1, 2), key=jax.random.key(9), dtype=jnp.float64
    )
    t = jnp.linspace(0.0, 1.0, 3)
    sol, stats = pxt.sdeint(
        f, G, y0, t, solver="milstein_commutative", bm=bm, adaptive=True,
        rtol=1e-4, atol=1e-6, options={"return_stats": True}, time_axis=0,
    )
    w = bm(0.0, 1.0)
    closed = y0 * jnp.exp(
        (a - 0.5 * (b1**2 + b2**2)) + b1 * w[..., 0] + b2 * w[..., 1]
    )
    assert int(stats.status) == 0
    assert jnp.allclose(sol[-1], closed, atol=5e-3), (sol[-1], closed)


def test_duplicate_output_times():
    f, g, y0, bm, _ = _gbm_setup()
    t = jnp.array([0.0, 0.5, 0.5, 1.0], dtype=jnp.float64)
    sol = pxt.sdeint(
        f, g, y0, t, solver="euler", bm=bm, adaptive=True,
        rtol=1e-2, atol=1e-4, time_axis=0,
    )
    assert jnp.array_equal(sol[1], sol[2])
    assert bool(jnp.all(jnp.isfinite(sol)))

    # duplicated FIRST time: first_step defaults from a zero-length interval
    # — must not spin at dt 0 (regression: the controller is multiplicative,
    # a 0 dt could never grow back)
    t2 = jnp.array([0.0, 0.0, 0.5, 1.0], dtype=jnp.float64)
    sol2, stats = pxt.sdeint(
        f, g, y0, t2, solver="euler", bm=bm, adaptive=True,
        rtol=1e-2, atol=1e-4, options={"return_stats": True}, time_axis=0,
    )
    assert int(stats.status) == 0
    assert jnp.array_equal(sol2[0], sol2[1])
    assert bool(jnp.all(jnp.isfinite(sol2)))


def test_unknown_adaptive_option_rejected():
    f, g, y0, bm, _ = _gbm_setup()
    t = jnp.linspace(0.0, 1.0, 3)
    with pytest.raises(ValueError, match="unknown option"):
        pxt.sdeint(
            f, g, y0, t, solver="euler", bm=bm, adaptive=True,
            options={"step_size": 0.1},
        )


def test_adaptive_under_jit():
    f, g, y0, bm, closed = _gbm_setup(key=2)
    t = jnp.linspace(0.0, 1.0, 3)

    @jax.jit
    def solve(y):
        return pxt.sdeint(
            f, g, y, t, solver="milstein", bm=bm, adaptive=True,
            rtol=1e-4, atol=1e-6, time_axis=0,
        )

    sol = solve(y0)
    # closed(1.0) ~ 12.6 on this path: relative comparison (rtol controls
    # RELATIVE pathwise error; measured ~3e-3 rel at this tolerance)
    assert jnp.allclose(sol[-1], closed(1.0), rtol=2e-2)


# ---------------------------------------------------------------------------
# adaptive-grid GRADIENTS: sdeint_adjoint(adaptive=True) — two-pass design
# (grid discovery under stop_gradient, replay adjoint over the recorded grid)
# ---------------------------------------------------------------------------


def _mk_loss(bm, y0, t, solver="milstein", sigma=0.45, grid_buffer=64, **kw):
    def loss(p):
        sol = pxt.sdeint_adjoint(
            lambda tt, y: p * y, lambda tt, y: sigma * y, y0, t,
            solver=solver, adaptive=True, rtol=1e-3, atol=1e-4, bm=bm,
            time_axis=0,
            options=dict(first_step=0.1, grid_buffer=grid_buffer), **kw,
        )
        return jnp.sum(sol[-1]), sol

    return loss


def test_adjoint_adaptive_forward_bit_equal():
    """The replayed forward IS the adaptive solution (the recorded grid keeps
    each accepted attempt's midpoint+endpoint, i.e. the engine's two-half-step
    composition) — bit-equal, both schemes."""
    y0 = jnp.array([1.0, 2.0], dtype=jnp.float64)
    t = jnp.linspace(0.0, 1.0, 5)
    bm = BrownianInterval(0.0, 1.0, size=(2,), dtype=jnp.float64, key=7)
    for solver in ("euler", "milstein"):
        # euler at this tolerance takes ~50 accepted steps per interval
        # (first-order controller): needs a bigger recording buffer
        _, sol_adj = _mk_loss(bm, y0, t, solver=solver, grid_buffer=512)(0.7)
        sol_ref = pxt.sdeint(
            lambda tt, y: 0.7 * y, lambda tt, y: 0.45 * y, y0, t,
            solver=solver, adaptive=True, rtol=1e-3, atol=1e-4, bm=bm,
            time_axis=0, options=dict(first_step=0.1),
        )
        assert jnp.array_equal(sol_adj, sol_ref), solver


def test_adjoint_adaptive_grad_is_exact_fixed_grid_backprop():
    """Gradient == direct backprop through a fixed-grid solve on the recorded
    grid, to machine precision (the discretize-then-optimize contract: the
    grid is data, the discrete map is differentiated exactly). Also pins
    grad-of-jit consistency."""
    import numpy as np

    from paddlexde_tpu.functional.sdeint import make_milstein_term
    from paddlexde_tpu.solver.sde_adaptive import solve_sde_adaptive

    mu, sigma = 0.7, 0.45
    y0 = jnp.array([1.0, 2.0], dtype=jnp.float64)
    t = jnp.linspace(0.0, 1.0, 5)
    bm = BrownianInterval(0.0, 1.0, size=(2,), dtype=jnp.float64, key=7)
    loss = _mk_loss(bm, y0, t)
    g = jax.grad(lambda p: loss(p)[0])(mu)

    term = make_milstein_term(lambda tt, y: mu * y, lambda tt, y: sigma * y, bm)
    _, rows = solve_sde_adaptive(
        term, y0, t, rtol=1e-3, atol=1e-4, first_step=0.1, grid_buffer=64,
        error_order=1.5,
    )
    grid = jnp.asarray(
        np.unique(np.concatenate([np.asarray(t), np.asarray(rows).ravel()]))
    )

    def loss_fixed(p):
        sol = pxt.sdeint(
            lambda tt, y: p * y, lambda tt, y: sigma * y, y0, grid,
            solver="milstein", bm=bm, time_axis=0,
        )
        return jnp.sum(sol[-1])

    g_oracle = jax.grad(loss_fixed)(mu)
    assert abs(float(g - g_oracle)) <= 1e-12 * abs(float(g_oracle))

    g_jit = jax.jit(jax.grad(lambda p: loss(p)[0]))(mu)
    assert abs(float(g_jit - g)) < 1e-12


def test_adjoint_adaptive_reverse():
    """reverse=True: forward bit-equal to sdeint(adaptive=True, reverse=True)
    on the same path; gradient finite and nonzero."""
    y0 = jnp.array([1.5], dtype=jnp.float64)
    t = jnp.linspace(0.0, 1.0, 3)
    bm = BrownianInterval(0.0, 1.0, size=(1,), dtype=jnp.float64, key=3)

    def loss(p):
        sol = pxt.sdeint_adjoint(
            lambda tt, y: p * y, lambda tt, y: 0.3 * y, y0, t,
            solver="milstein", adaptive=True, reverse=True,
            rtol=1e-3, atol=1e-4, bm=bm, time_axis=0,
            options=dict(grid_buffer=64),
        )
        # reverse + increasing span reports in the GIVEN order: sol[-1] is
        # the (constant) initial condition at t=1; the integrated endpoint
        # lives at sol[0]
        return jnp.sum(sol[0]), sol

    _, sol_adj = loss(0.5)
    sol_ref = pxt.sdeint(
        lambda tt, y: 0.5 * y, lambda tt, y: 0.3 * y, y0, t,
        solver="milstein", adaptive=True, reverse=True,
        rtol=1e-3, atol=1e-4, bm=bm, time_axis=0,
    )
    assert jnp.array_equal(sol_adj, sol_ref)
    g = jax.grad(lambda p: loss(p)[0])(0.5)
    assert jnp.isfinite(g) and abs(float(g)) > 1e-8


def test_adjoint_adaptive_general_noise():
    """Matrix noise (euler_general, noise_dim=2): forward bit-equal to the
    non-adjoint adaptive solve; grads finite."""
    y0 = jnp.array([1.0, 2.0], dtype=jnp.float64)
    t = jnp.linspace(0.0, 0.5, 3)
    bm = BrownianInterval(0.0, 0.5, size=(2,), dtype=jnp.float64, key=11)
    G = jnp.array([[0.3, 0.1], [0.0, 0.2]], dtype=jnp.float64)

    def loss(p):
        sol = pxt.sdeint_adjoint(
            lambda tt, y: p * y, lambda tt, y: G * 1.0, y0, t,
            solver="euler_general", adaptive=True, rtol=1e-3, atol=1e-4,
            bm=bm, time_axis=0, options=dict(grid_buffer=64),
        )
        return jnp.sum(sol[-1]), sol

    _, sol_adj = loss(0.4)
    sol_ref = pxt.sdeint(
        lambda tt, y: 0.4 * y, lambda tt, y: G * 1.0, y0, t,
        solver="euler_general", adaptive=True, rtol=1e-3, atol=1e-4,
        bm=bm, time_axis=0,
    )
    assert jnp.array_equal(sol_adj, sol_ref)
    g = jax.grad(lambda p: loss(p)[0])(0.4)
    assert jnp.isfinite(g)


def test_adjoint_adaptive_grid_overflow_is_consistent():
    """A too-small grid_buffer coarsens the interval tail (engine flags
    GRID_OVERFLOW) — but value and gradient stay mutually consistent: the
    gradient is the exact backprop of the value actually returned."""
    y0 = jnp.array([1.0], dtype=jnp.float64)
    t = jnp.linspace(0.0, 1.0, 2)
    bm = BrownianInterval(0.0, 1.0, size=(1,), dtype=jnp.float64, key=5)

    def loss(p, buf):
        sol = pxt.sdeint_adjoint(
            lambda tt, y: p * y, lambda tt, y: 0.4 * y, y0, t,
            solver="milstein", adaptive=True, rtol=1e-5, atol=1e-7, bm=bm,
            time_axis=0, options=dict(grid_buffer=buf),
        )
        return jnp.sum(sol[-1])

    v_small = loss(0.7, 8)
    assert bool(jnp.isfinite(v_small))
    g_small = jax.grad(loss)(0.7, 8)
    assert bool(jnp.isfinite(g_small))
    # value ~= GBM closed form even when coarsened (it is still a valid
    # discrete solution of the same SDE on the same path)
    w = bm(0.0, 1.0)
    closed = float((y0 * jnp.exp((0.7 - 0.5 * 0.4**2) * 1.0 + 0.4 * w))[0])
    assert abs(float(v_small) - closed) / closed < 0.2


def test_adjoint_adaptive_option_validation():
    y0 = jnp.array([1.0], dtype=jnp.float64)
    t = jnp.linspace(0.0, 1.0, 3)
    bm = BrownianInterval(0.0, 1.0, size=(1,), dtype=jnp.float64, key=1)
    f = lambda tt, y: y
    g = lambda tt, y: 0.2 * y
    with pytest.raises(ValueError, match="mutually exclusive"):
        pxt.sdeint_adjoint(
            f, g, y0, t, adaptive=True, bm=bm,
            options={"step_size": 0.1},
        )
    with pytest.raises(ValueError, match="unknown option"):
        pxt.sdeint_adjoint(
            f, g, y0, t, adaptive=True, bm=bm,
            options={"bogus_knob": True},
        )
    # return_stats is SUPPORTED under the adaptive adjoint (round-3 review:
    # the engine's GRID_OVERFLOW/NON_FINITE/MAX_STEPS flags were silently
    # swallowed before) — surfaces the discovery pass's stats
    sol, stats = pxt.sdeint_adjoint(
        f, g, y0, t, adaptive=True, bm=bm, rtol=1e-3, atol=1e-5,
        options={"return_stats": True}, time_axis=0,
    )
    assert int(stats.status) == 0
    assert int(stats.n_accept) > 0
    sol_plain = pxt.sdeint_adjoint(f, g, y0, t, adaptive=True, bm=bm,
                                   rtol=1e-3, atol=1e-5, time_axis=0)
    np.testing.assert_array_equal(np.asarray(sol), np.asarray(sol_plain))
    # ...and the flag that used to be silently swallowed: ODE-tight default
    # tolerances need >grid_buffer accepts per interval -> GRID_OVERFLOW
    from paddlexde_tpu.solver.sde_adaptive import GRID_OVERFLOW

    _, stats_tight = pxt.sdeint_adjoint(
        f, g, y0, t, adaptive=True, bm=bm, rtol=1e-7, atol=1e-9,
        options={"return_stats": True}, time_axis=0,
    )
    assert int(stats_tight.status) & GRID_OVERFLOW
    with pytest.raises(ValueError, match="grid_buffer"):
        pxt.sdeint_adjoint(
            f, g, y0, t, adaptive=True, bm=bm,
            options={"grid_buffer": 1},
        )


def test_adaptive_under_vmap_matches_sequential():
    """vmap over per-lane keys works: the batched while_loop steps finished
    lanes with ZERO-length steps (h = min(dt, t_end−t) = 0, all increments
    zero) so values stay frozen. Exact sequential equality is NOT the
    contract — a borderline accept/reject can flip under the batched
    compilation's different rounding (measured: 1 lane in 5 differs at
    7e-4 relative, both grids valid) — so pin tolerance-level agreement
    with the sequential solves AND with the per-lane closed forms."""
    mu, sigma = 0.8, 0.4
    f = lambda t, y: mu * y
    g = lambda t, y: sigma * y
    y0 = jnp.array([1.0], dtype=jnp.float64)
    ts = jnp.array([0.0, 1.0])
    keys = jax.random.split(jax.random.key(0), 5)

    def solve(k):
        return pxt.sdeint(f, g, y0, ts, "milstein", key=k, adaptive=True,
                          rtol=1e-3, atol=1e-5, time_axis=0)[-1]

    batched = jax.vmap(solve)(keys)
    seq = jnp.stack([solve(k) for k in keys])
    assert bool(jnp.all(jnp.isfinite(batched)))
    np.testing.assert_allclose(np.asarray(batched), np.asarray(seq),
                               rtol=1e-2)

    def closed(k):
        bm = BrownianInterval(0.0, 1.0, size=(1,), key=k, dtype=jnp.float64)
        return y0 * jnp.exp((mu - 0.5 * sigma**2) + sigma * bm(0.0, 1.0))

    exact = jnp.stack([closed(k) for k in keys])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(exact),
                               rtol=2e-2)
