"""Pallas spline kernel: equality against the jnp/spline reference.

On CPU the kernel path is exercised in interpreter mode implicitly by using
use_pallas=False reference plus a separate interpret check; on TPU (bench
runs) the compiled kernel takes over. Equality is exact-math, tolerance 1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np

from paddlexde_tpu.interpolation import CubicHermiteSpline
from paddlexde_tpu.ops import hermite_gather_eval


def _setup(B=3, N=5, T=128, D=3, L=12, seed=0):
    rng = np.random.RandomState(seed)
    series = jnp.asarray(rng.randn(B, N, T, D).astype(np.float32))
    t = jnp.arange(T, dtype=jnp.float32)
    q = jnp.asarray(np.sort(rng.rand(L)).astype(np.float32) * (T - 1))
    return series, t, q


def test_matches_spline_class():
    series, t, q = _setup()
    ref = CubicHermiteSpline(series, t).evaluate(q)
    out = hermite_gather_eval(series, t, q, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_query_gradients_match_spline():
    series, t, q = _setup()

    g_fused = jax.grad(lambda q_: jnp.sum(hermite_gather_eval(series, t, q_, False) ** 2))(q)

    def loss_ref(q_):
        return jnp.sum(CubicHermiteSpline(series, t).evaluate(q_) ** 2)

    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-6)


def test_pallas_kernel_interpret_mode():
    """Run the actual Pallas kernel in interpreter mode and compare."""
    from jax.experimental.pallas import tpu as pltpu

    from paddlexde_tpu.ops import spline_pallas as sp

    series, t, q = _setup(B=2, N=2, T=64, D=3, L=6)
    ref = sp.hermite_gather_eval(series, t, q, False)
    with pltpu.force_tpu_interpret_mode():
        out = sp.hermite_gather_eval(series, t, q, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
