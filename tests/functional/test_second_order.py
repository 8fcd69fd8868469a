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
