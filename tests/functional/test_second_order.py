"""Second-order differentiation through the solvers (capability pins).

Hyperparameter optimization, Newton-on-the-loss and meta-learning need
d²/dθ² through the integrator. Supported surface, pinned against the
closed form y(1) = y0·e^a, L = y(1)² (so dL/da = 2y0²e^{2a},
d²L/da² = 4y0²e^{2a}):

- jax.hessian through DIRECT odeint (fixed solvers: scan backprop is
  differentiable at any order);
- jax.grad(jax.grad(...)) through odeint_adjoint (reverse-over-reverse:
  JAX differentiates the custom_vjp's backward, which is itself a solve);
- jax.jvp through direct odeint (forward mode over scan);
- jvp through odeint_adjoint raises (custom_vjp has no forward rule — use
  direct odeint for forward-over-anything), pinned as the documented limit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paddlexde_tpu as pxt

Y0, A = 1.3, 0.4
GRID = np.linspace(0.0, 1.0, 65)


def _loss(odeint_fn):
    def loss(a):
        ys = odeint_fn(
            lambda t, y: a * y, jnp.asarray(Y0), np.asarray([0.0, 1.0]),
            "rk4", time_axis=0, options={"grid": GRID},
        )
        return ys[-1] ** 2

    return loss


def test_hessian_through_direct_odeint():
    h = float(jax.hessian(_loss(pxt.odeint))(jnp.asarray(A)))
    np.testing.assert_allclose(h, 4 * Y0**2 * np.exp(2 * A), rtol=1e-5)


def test_grad_of_grad_through_adjoint():
    h = float(jax.grad(jax.grad(_loss(pxt.odeint_adjoint)))(jnp.asarray(A)))
    np.testing.assert_allclose(h, 4 * Y0**2 * np.exp(2 * A), rtol=1e-5)


def test_jvp_through_direct_odeint():
    _, t = jax.jvp(_loss(pxt.odeint), (jnp.asarray(A),), (jnp.asarray(1.0),))
    np.testing.assert_allclose(float(t), 2 * Y0**2 * np.exp(2 * A), rtol=1e-5)


def test_jvp_through_adjoint_raises():
    with pytest.raises(TypeError, match="custom_vjp"):
        jax.jvp(_loss(pxt.odeint_adjoint), (jnp.asarray(A),),
                (jnp.asarray(1.0),))


def test_hessian_vector_product_neural_field():
    """The practical shape: HVP (grad-of-dot-of-grad) of a small neural ODE
    through the adjoint — finite and symmetric (v^T H u == u^T H v)."""
    w0 = jax.random.normal(jax.random.PRNGKey(0), (2, 2)) * 0.3
    x0 = jnp.asarray([1.0, -0.5])

    def loss(w):
        ys = pxt.odeint_adjoint(
            lambda t, y: jnp.tanh(y @ w), x0, np.asarray([0.0, 1.0]),
            "rk4", time_axis=0, options={"grid": np.linspace(0, 1, 17)},
        )
        return jnp.sum(ys[-1] ** 2)

    u = jax.random.normal(jax.random.PRNGKey(1), (2, 2))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 2))

    def hvp(vec):
        return jax.grad(lambda w: jnp.vdot(jax.grad(loss)(w), vec))(w0)

    hu, hv = hvp(u), hvp(v)
    assert bool(jnp.all(jnp.isfinite(hu)))
    np.testing.assert_allclose(
        float(jnp.vdot(v, hu)), float(jnp.vdot(u, hv)), rtol=1e-4
    )


def test_sde_second_order_grad_of_grad():
    """SDE hessians (round 3): grad-of-grad composes through the replay
    adjoint AND the reversible adjoint, matching direct backprop through
    the scan bit-exactly (reverse-over-reverse differentiates the
    custom_vjp backward; forward-over-reverse raises the documented
    custom_vjp limit — use direct sdeint for jax.hessian/jvp)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from paddlexde_tpu import BrownianInterval, sdeint, sdeint_adjoint

    key = jax.random.key(3)
    y0 = jnp.ones((8,), jnp.float64)
    ts = jnp.linspace(0.0, 1.0, 9)

    def make_bm(levy="none"):
        return BrownianInterval(0.0, 1.0, size=(8,), key=key,
                                dtype=jnp.float64,
                                levy_area_approximation=levy)

    def loss(a, fn, scheme, levy="none"):
        f = lambda t, y: -a * y + 0.3 * jnp.sin(y)
        g = (lambda t, y: 0.2 * y) if scheme == "milstein" else (
            lambda t, y: 0.2 + 0.0 * y)
        return jnp.mean(
            fn(f, g, y0, ts, scheme, bm=make_bm(levy), time_axis=0)[-1] ** 2
        )

    a = jnp.float64(0.8)
    for scheme, levy in [("milstein", "none"), ("sra1", "space-time"),
                         ("implicit_sra1", "space-time"),
                         ("reversible_heun", "none")]:
        h_d = float(jax.grad(jax.grad(
            lambda x: loss(x, sdeint, scheme, levy)))(a))
        h_a = float(jax.grad(jax.grad(
            lambda x: loss(x, sdeint_adjoint, scheme, levy)))(a))
        np.testing.assert_allclose(h_a, h_d, rtol=1e-12, err_msg=scheme)

    # the forward-over-reverse limit is loud, not silent
    with pytest.raises(TypeError, match="custom_vjp"):
        jax.hessian(lambda x: loss(x, sdeint_adjoint, "milstein"))(a)
