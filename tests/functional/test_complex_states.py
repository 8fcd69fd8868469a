"""Complex-dtype states: the reference DECLARED complex64 in its test sweep
matrix but never ran it (tests/testing_utils.py:74, declared-unused). Here it
actually works: dy/dt = i*w*y (rotation) through fixed and adaptive solvers,
plus gradients through the scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import odeint


@pytest.mark.parametrize("method", ["rk4", "dopri5"])
def test_complex_rotation(method):
    w = 2.0
    y0 = jnp.asarray([1.0 + 0.0j], jnp.complex64)
    ts = jnp.linspace(0.0, 1.0, 33)
    y = odeint(lambda t, y: 1j * w * y, y0, ts, method, rtol=1e-6, atol=1e-8,
               time_axis=0)
    assert jnp.iscomplexobj(y)
    expect = np.exp(1j * w * np.asarray(ts))
    np.testing.assert_allclose(np.asarray(y[:, 0]), expect, rtol=1e-4, atol=1e-5)


def test_complex_gradients():
    def loss(w):
        y = odeint(lambda t, y: 1j * w * y, jnp.asarray([1.0 + 0j], jnp.complex64),
                   jnp.linspace(0.0, 1.0, 17), "rk4", time_axis=0)
        return jnp.abs(y[-1, 0] - jnp.exp(1j * 1.5)) ** 2

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g))
