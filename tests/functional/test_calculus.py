"""Itô ↔ Stratonovich conversion (``functional/calculus.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paddlexde_tpu as pxt
from paddlexde_tpu.brownian.api import BrownianInterval


def test_gbm_conversion_closed_form():
    """Itô GBM converted to Stratonovich and solved with heun_stratonovich
    must reproduce the ITÔ closed form on the same path (the -σ²/2 shift
    moves into the drift); direct heun on the unconverted drift gives the
    Stratonovich solution instead — both pinned."""
    mu, sigma = 0.8, 0.6
    n_paths = 256
    bm = BrownianInterval(0.0, 1.0, size=(n_paths,), key=jax.random.key(3),
                          dtype=jnp.float64)
    y0 = jnp.ones((n_paths,), jnp.float64)
    f = lambda t, y: mu * y
    g = lambda t, y: sigma * y
    w1 = bm(0.0, 1.0)
    ito_exact = jnp.exp((mu - 0.5 * sigma**2) + sigma * w1)
    strat_exact = jnp.exp(mu + sigma * w1)
    ts = jnp.linspace(0.0, 1.0, 257)

    f_strat = pxt.ito_to_stratonovich(f, g)
    sol = pxt.sdeint(f_strat, g, y0, ts, "heun_stratonovich", bm=bm,
                     time_axis=0)
    err_conv = float(jnp.sqrt(jnp.mean((sol[-1] - ito_exact) ** 2)))
    sol_raw = pxt.sdeint(f, g, y0, ts, "heun_stratonovich", bm=bm,
                         time_axis=0)
    err_raw = float(jnp.sqrt(jnp.mean((sol_raw[-1] - strat_exact) ** 2)))
    assert err_conv < 0.05, err_conv
    assert err_raw < 0.05, err_raw
    # and the conversions are inverse maps (machine-exact pointwise)
    f_back = pxt.stratonovich_to_ito(f_strat, g)
    y = jnp.linspace(0.5, 2.0, 7)
    np.testing.assert_allclose(np.asarray(f_back(0.3, y)),
                               np.asarray(f(0.3, y)), rtol=1e-14)


def test_matrix_correction_matches_hand_derivation():
    """General noise G(y)[:, j] = B_j y: the correction is
    ½Σ_j B_j (B_j y) — hand-computable."""
    b1 = jnp.array([[0.1, 0.7], [0.0, 0.2]], jnp.float64)
    b2 = jnp.array([[0.3, 0.0], [-0.4, 0.1]], jnp.float64)
    g = lambda t, y: jnp.stack([y @ b1.T, y @ b2.T], axis=-1)
    f = lambda t, y: jnp.zeros_like(y)
    y = jnp.array([1.0, -0.5], jnp.float64)
    f_strat = pxt.ito_to_stratonovich(f, g, noise="general")
    expect = -0.5 * (b1 @ (b1 @ y) + b2 @ (b2 @ y))
    np.testing.assert_allclose(np.asarray(f_strat(0.0, y)),
                               np.asarray(expect), rtol=1e-14)

    # scalar contract: one channel, coupled g(y) = B y
    gs = lambda t, y: y @ b1.T
    f_s = pxt.ito_to_stratonovich(f, gs, noise="scalar")
    np.testing.assert_allclose(np.asarray(f_s(0.0, y)),
                               np.asarray(-0.5 * (b1 @ (b1 @ y))), rtol=1e-14)

    with pytest.raises(ValueError, match="noise must be"):
        pxt.ito_to_stratonovich(f, g, noise="matrix")
