"""TPU-first capabilities beyond the reference: vmap over solves, gradient
rematerialization, bf16 states, jit composition."""

import jax
import jax.numpy as jnp
import numpy as np

from paddlexde_tpu import odeint


def test_vmap_over_solves():
    """A batch of independent IVPs via one vmap — no Python loop."""
    def solve_one(a):
        return odeint(lambda t, y: a * y, jnp.ones(()), jnp.linspace(0., 1., 9),
                      "rk4", time_axis=0)[-1]

    a_batch = jnp.asarray([0.1, 0.5, -0.3, 1.2])
    out = jax.vmap(solve_one)(a_batch)
    # rk4 truncation at dt=0.125 for the fastest-growing member
    np.testing.assert_allclose(out, np.exp(np.asarray(a_batch)), rtol=1e-5)


def test_vmap_adaptive():
    def solve_one(y0):
        return odeint(lambda t, y: -y, y0, jnp.linspace(0., 1., 5),
                      "dopri5", rtol=1e-6, atol=1e-8, time_axis=0,
                      options={"first_step": 0.1})[-1]

    y0s = jnp.asarray([1.0, 2.0, 3.0])
    out = jax.vmap(solve_one)(y0s)
    np.testing.assert_allclose(out, np.asarray(y0s) * np.exp(-1.0), rtol=1e-5)


def test_checkpoint_option_grads_match():
    """Rematerialized backprop must give identical gradients."""
    def loss(a, ckpt):
        y = odeint(lambda t, y: a * jnp.sin(y), jnp.ones((8,)),
                   jnp.linspace(0., 2., 65), "rk4", time_axis=0,
                   options={"checkpoint": ckpt})
        return jnp.sum(y[-1] ** 2)

    g_plain = jax.grad(loss)(0.7, False)
    g_ckpt = jax.grad(loss)(0.7, True)
    np.testing.assert_allclose(np.asarray(g_ckpt), np.asarray(g_plain), rtol=1e-12)


def test_bfloat16_states():
    """bf16 state with f32 timelike values solves and stays finite."""
    y0 = jnp.ones((16,), jnp.bfloat16)
    y = odeint(lambda t, y: -y, y0, jnp.linspace(0., 1., 17, dtype=jnp.float32),
               "rk4", time_axis=0)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y[-1], np.float32), np.exp(-1.0), rtol=2e-2
    )
