"""sdeint_adjoint jit-interaction pins (the scheme-matrix adjoint tests
live in test_sdeint.py / test_sde_adaptive.py; this file pins the training-
loop usage patterns) + the O(1)-memory reversible adjoint."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import BrownianInterval, sdeint, sdeint_adjoint


def test_traced_key_through_jit_training_step():
    """The latent-SDE training pattern: a FRESH tree key flows through jit
    every step — jit(value_and_grad(f)) with the bm built from a traced key
    must work and match the concrete-key gradient. (The FAILING form is
    value_and_grad(jit(f)): the inner jit bakes the custom_vjp residuals
    against the outer tracer — documented in CLAUDE.md, not pinned here
    because the error type is a JAX internal.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from paddlexde_tpu import BrownianInterval, sdeint_adjoint

    def loss(theta, key):
        f = lambda t, y: theta * y
        g = lambda t, y: 0.3 * y
        y0 = jnp.ones((4,))
        bm = BrownianInterval(0.0, 1.0, size=(4,), key=key,
                              dtype=jnp.float32)
        ts = jnp.linspace(0.0, 1.0, 9)
        return jnp.sum(
            sdeint_adjoint(f, g, y0, ts, "milstein", bm=bm, time_axis=0)[-1]
        )

    key = jax.random.key(3)
    v_j, g_j = jax.jit(jax.value_and_grad(loss))(0.5, key)
    v_e, g_e = jax.value_and_grad(loss)(0.5, key)  # concrete-key eager
    np.testing.assert_allclose(float(v_j), float(v_e), rtol=1e-6)
    np.testing.assert_allclose(float(g_j), float(g_e), rtol=1e-6)


# --- O(1)-memory reversible adjoint (reversible_heun, round 3) --------------


def _rev_heun_setup(n_paths=16, seed=11):
    key = jax.random.key(seed)
    y0 = jnp.ones((n_paths,), jnp.float64)

    def make_bm():
        return BrownianInterval(0.0, 1.0, size=(n_paths,), key=key,
                                dtype=jnp.float64)

    f_of = lambda a: (lambda t, y: -a * y + jnp.sin(y))
    g = lambda t, y: 0.3 + 0.1 * jnp.cos(y)
    return y0, make_bm, f_of, g


def test_reversible_heun_adjoint_matches_direct():
    """The reversible backward (reconstruct + per-step vjp, nothing stored)
    equals direct backprop through the sdeint scan — machine precision on
    this chain length; values bit-equal; jit composes; pair input works."""
    y0, make_bm, f_of, g = _rev_heun_setup()
    ts = jnp.linspace(0.0, 1.0, 9)

    def loss(a, fn):
        sol = fn(f_of(a), g, y0, ts, "reversible_heun", bm=make_bm(),
                 time_axis=0)
        return jnp.sum(sol[-1] ** 2) + jnp.mean(sol[4])

    a = jnp.asarray(1.3, jnp.float64)
    vd, gd = jax.value_and_grad(lambda x: loss(x, sdeint))(a)
    va, ga = jax.value_and_grad(lambda x: loss(x, sdeint_adjoint))(a)
    assert float(vd) == float(va)
    np.testing.assert_allclose(float(ga), float(gd), rtol=1e-12)
    gj = jax.jit(jax.grad(lambda x: loss(x, sdeint_adjoint)))(a)
    np.testing.assert_allclose(float(gj), float(ga), rtol=1e-12)

    def loss_pair(a, fn):
        sol = fn(f_of(a), g, (y0, y0), ts, "reversible_heun", bm=make_bm(),
                 time_axis=0)
        return jnp.sum(sol[0][-1] ** 2)

    gp_d = jax.grad(lambda x: loss_pair(x, sdeint))(a)
    gp_a = jax.grad(lambda x: loss_pair(x, sdeint_adjoint))(a)
    np.testing.assert_allclose(float(gp_a), float(gp_d), rtol=1e-12)


def test_reversible_heun_adjoint_step_size_o1_memory_path():
    """options={'step_size': h}: the internal fine grid is traversed
    backward by exact inversion — NOTHING per-sub-step is stored (the
    custom_vjp residual is the final pair alone) — and the gradient equals
    direct backprop through the explicit fine-grid solve."""
    y0, make_bm, f_of, g = _rev_heun_setup()
    ts = jnp.linspace(0.0, 1.0, 9)
    a = jnp.asarray(1.3, jnp.float64)

    def loss_fine_direct(a):
        ts_f = jnp.linspace(0.0, 1.0, 65)  # 8 sub-steps per output interval
        sol = sdeint(f_of(a), g, y0, ts_f, "reversible_heun", bm=make_bm(),
                     time_axis=0)
        return jnp.sum(sol[-1] ** 2) + jnp.mean(sol[32])

    def loss_adj(a):
        sol = sdeint_adjoint(f_of(a), g, y0, ts, "reversible_heun",
                             bm=make_bm(), time_axis=0,
                             options={"step_size": 1.0 / 64})
        return jnp.sum(sol[-1] ** 2) + jnp.mean(sol[4])

    vd, gd = jax.value_and_grad(loss_fine_direct)(a)
    va, ga = jax.value_and_grad(loss_adj)(a)
    assert float(vd) == float(va)
    np.testing.assert_allclose(float(ga), float(gd), rtol=1e-12)


def test_reversible_heun_adjoint_long_chain_reconstruction():
    """512 f64 steps: the backward's state reconstruction drifts only at
    machine scale, so gradients stay within 1e-8 of direct backprop (the
    scheme's exact-inverse property doing real work at depth)."""
    y0, make_bm, f_of, g = _rev_heun_setup()
    a = jnp.asarray(0.9, jnp.float64)

    def loss(a, fn, ts):
        sol = fn(f_of(a), g, y0, ts, "reversible_heun", bm=make_bm(),
                 time_axis=0)
        return jnp.mean(sol[-1] ** 2)

    ts2 = jnp.linspace(0.0, 1.0, 3)  # 2 outputs, 256 sub-steps each
    ga = jax.grad(lambda x: loss(x, sdeint_adjoint, ts2))(
        a
    ) if False else jax.grad(
        lambda x: jnp.mean(
            sdeint_adjoint(f_of(x), g, y0, ts2, "reversible_heun",
                           bm=make_bm(), time_axis=0,
                           options={"step_size": 1.0 / 512})[-1] ** 2
        )
    )(a)
    ts_f = jnp.linspace(0.0, 1.0, 513)
    gd = jax.grad(lambda x: jnp.mean(
        sdeint(f_of(x), g, y0, ts_f, "reversible_heun", bm=make_bm(),
               time_axis=0)[-1] ** 2
    ))(a)
    np.testing.assert_allclose(float(ga), float(gd), rtol=1e-8)


def test_reversible_heun_adjoint_refusals():
    y0, make_bm, f_of, g = _rev_heun_setup()
    ts = jnp.linspace(0.0, 1.0, 9)
    with pytest.raises(ValueError, match="increasing"):
        sdeint_adjoint(f_of(1.0), g, y0, ts[::-1], "reversible_heun",
                       bm=make_bm())
    # adaptive=True is now SUPPORTED (recorded-grid reversible walk) but
    # excludes step_size, exactly like the replay path
    with pytest.raises(ValueError, match="mutually"):
        sdeint_adjoint(f_of(1.0), g, y0, ts, "reversible_heun",
                       adaptive=True, bm=make_bm(),
                       options={"step_size": 0.1})
    with pytest.raises(ValueError, match="unknown option"):
        sdeint_adjoint(f_of(1.0), g, y0, ts, "reversible_heun",
                       bm=make_bm(), options={"grid": ts})


def test_reversible_heun_adaptive_adjoint():
    """adaptive=True for reversible_heun: phase-1 grid discovery (y-channel
    norm, forward BIT-EQUAL to sdeint's adaptive path — which also pins the
    review-era sdeint bug where the (y, z) pair was sheared into a
    (sol, stats) unpack without return_stats), then the reversible backward
    over the recorded grid. With a forced-uniform accepted grid the
    gradient is machine-equal to direct backprop through the equivalent
    fixed-grid solve (midpoint+endpoint recording => h/2 steps)."""
    y0, make_bm, f_of, g = _rev_heun_setup()
    ts = jnp.array([0.0, 0.5, 1.0], jnp.float64)
    a = jnp.asarray(1.3, jnp.float64)
    kw = dict(rtol=1e-3, atol=1e-5)

    s1 = sdeint(f_of(a), g, y0, ts, "reversible_heun", adaptive=True,
                bm=make_bm(), time_axis=0, **kw)
    assert not isinstance(s1, tuple)  # the sheared-pair bug returned one
    s2 = sdeint_adjoint(f_of(a), g, y0, ts, "reversible_heun",
                        adaptive=True, bm=make_bm(), time_axis=0, **kw)
    assert bool(jnp.all(s1 == s2))

    forced = {"first_step": 0.125, "max_step": 0.125, "ifactor": 1.0}

    def loss_adj(av):
        sol = sdeint_adjoint(f_of(av), g, y0, ts, "reversible_heun",
                             adaptive=True, bm=make_bm(), time_axis=0,
                             rtol=1e3, atol=1e3, options=dict(forced))
        return jnp.mean(sol[-1] ** 2)

    def loss_fix(av):
        ts_f = jnp.linspace(0.0, 1.0, 17)
        sol = sdeint(f_of(av), g, y0, ts_f, "reversible_heun",
                     bm=make_bm(), time_axis=0)
        return jnp.mean(sol[-1] ** 2)

    va, ga = jax.value_and_grad(loss_adj)(a)
    vf, gf = jax.value_and_grad(loss_fix)(a)
    assert float(va) == float(vf)
    np.testing.assert_allclose(float(ga), float(gf), rtol=1e-12)

    # stats surface + jit(grad) on the genuinely adaptive path
    sol_s, stats = sdeint_adjoint(
        f_of(a), g, y0, ts, "reversible_heun", adaptive=True, bm=make_bm(),
        time_axis=0, options={"return_stats": True}, **kw)
    assert int(stats.status) == 0
    assert bool(jnp.all(sol_s == s1))

    def loss_free(av):
        sol = sdeint_adjoint(f_of(av), g, y0, ts, "reversible_heun",
                             adaptive=True, bm=make_bm(), time_axis=0, **kw)
        return jnp.mean(sol[-1] ** 2)

    g_e = float(jax.grad(loss_free)(a))
    g_j = float(jax.jit(jax.grad(loss_free))(a))
    np.testing.assert_allclose(g_j, g_e, rtol=1e-12)
