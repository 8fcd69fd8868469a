"""CNF toolkit: divergence estimators + instantaneous change of variables.

Pins: exact divergence vs a hand-differentiated field, Hutchinson
unbiasedness (mean over probes/keys -> exact), and the FFJORD identity
end-to-end — for a LINEAR flow dz = Az dt the accumulated -div integral is
-tr(A)·T exactly, and the CNF log-likelihood of the pushed-forward samples
matches the closed-form Gaussian log-pdf of N(0, e^{AT} e^{AT}^T).
"""

import jax
import jax.numpy as jnp
import numpy as np

import paddlexde_tpu as pxt
from paddlexde_tpu.utils import (
    cnf_aug_dynamics,
    exact_divergence,
    hutchinson_divergence,
)


def _field(t, y):
    # f = [sin(y1) + 2 y0^2, y0 * y1 + t]; div = 4 y0 + y0
    return jnp.stack([jnp.sin(y[1]) + 2.0 * y[0] ** 2, y[0] * y[1] + t])


def test_exact_divergence_matches_analytic():
    fd = exact_divergence(_field)
    y = jnp.asarray([0.7, -1.3])
    out, div = fd(jnp.asarray(0.5), y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_field(0.5, y)),
                               rtol=1e-6)
    np.testing.assert_allclose(float(div), 5.0 * 0.7, rtol=1e-6)


def test_hutchinson_unbiased():
    fd_h = hutchinson_divergence(_field, probes=1)
    y = jnp.asarray([0.4, 0.9])
    exact = float(exact_divergence(_field)(jnp.asarray(0.0), y)[1])
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)
    ests = jax.vmap(lambda k: fd_h(jnp.asarray(0.0), y, k)[1])(keys)
    # Rademacher: diagonal terms are exact per-probe; the MC noise comes from
    # off-diagonals only, so the tolerance is the measured stderr scale
    np.testing.assert_allclose(float(jnp.mean(ests)), exact, atol=5e-2)
    # many probes in ONE estimate shrink the variance
    fd_many = hutchinson_divergence(_field, probes=64)
    est = float(fd_many(jnp.asarray(0.0), y, jax.random.PRNGKey(1))[1])
    np.testing.assert_allclose(est, exact, atol=0.2)


def test_cnf_linear_flow_closed_form():
    """dz = Az: flow map e^{AT}, logdet = tr(A) T; CNF log-likelihood of the
    pushed samples equals the analytic Gaussian log-pdf."""
    a_mat = jnp.asarray([[0.3, -0.8], [0.5, 0.1]])
    t1 = 1.0
    field = lambda t, y: y @ a_mat.T
    aug = cnf_aug_dynamics(field, "exact")

    key = jax.random.PRNGKey(0)
    z0 = jax.random.normal(key, (64, 2))
    lp0 = jax.vmap(
        lambda z: -0.5 * (z @ z) - jnp.log(2 * jnp.pi)
    )(z0)

    ts = jnp.linspace(0.0, t1, 9)
    ys, lps = pxt.odeint(aug, (z0, lp0), ts, "dopri5", rtol=1e-8, atol=1e-10,
                         time_axis=0)
    x, lp_x = ys[-1], lps[-1]

    import scipy.linalg as sla

    e_at = jnp.asarray(sla.expm(np.asarray(a_mat) * t1))
    np.testing.assert_allclose(np.asarray(x), np.asarray(z0 @ e_at.T),
                               rtol=1e-4, atol=1e-5)
    # logdet identity: lp_x = lp0 - tr(A) * T
    np.testing.assert_allclose(
        np.asarray(lp_x), np.asarray(lp0) - float(jnp.trace(a_mat)) * t1,
        rtol=1e-5, atol=1e-6,
    )
    # density identity vs N(0, e^{AT} e^{AT}^T)
    cov = np.asarray(e_at) @ np.asarray(e_at).T
    cov_i = np.linalg.inv(cov)
    logdet = np.log(np.linalg.det(cov))
    lp_true = np.array([
        -0.5 * xi @ cov_i @ xi - 0.5 * logdet - np.log(2 * np.pi)
        for xi in np.asarray(x)
    ])
    np.testing.assert_allclose(np.asarray(lp_x), lp_true, atol=1e-4)


def test_cnf_hutchinson_through_odeint_with_grads():
    """The Hutchinson variant composes with odeint + grad (FFJORD training
    loop shape); on a linear field every Rademacher probe is EXACT (the
    off-diagonal noise terms cancel in expectation but also enter only via
    off-diagonal J entries; for symmetric-free check we use tolerance)."""
    a_mat = jnp.asarray([[0.2, 0.0], [0.0, -0.4]])  # diagonal: probe-exact
    make_field = cnf_aug_dynamics(lambda t, y: y @ a_mat.T, "hutchinson", 1)
    z0 = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
    keys = jax.random.split(jax.random.PRNGKey(3), 8)

    def neg_lp(scale):
        field = make_field(keys)
        ys, dlp = pxt.odeint(
            field, (z0 * scale, jnp.zeros(8)), jnp.asarray([0.0, 1.0]),
            "rk4", time_axis=0, options={"step_size": 0.125},
        )
        return -jnp.mean(dlp[-1])

    val = neg_lp(jnp.asarray(1.0))
    # diagonal A: Hutchinson is exact => -mean(-tr(A)*T) = tr(A)*T
    np.testing.assert_allclose(float(val), 0.2 - 0.4, rtol=1e-5)
    g = jax.grad(neg_lp)(jnp.asarray(1.0))
    assert np.isfinite(float(g))
