"""Fourier/KL Lévy areas (`levy_area_approximation="fourier"`, round 3).

The construction (virtual_tree.fourier_area) conditions the bridge's cosine
coefficients on the tree's (W, U) — alpha = sum_r a_r = -H exactly — sums
`levy_fourier_terms` Fourier pairs, and replaces the tail with an
antisymmetric Gaussian carrying the tail's EXACT variance. Law pins, all
against closed forms derived from the expansion (and cross-checked against
the classical values):

- total Var(A_ij) = h^2/4 for EVERY n (Davie's is h^2/3 — its documented
  +h^2/12 excess);
- E[A | W, H] = H_i W_j − W_i H_j for every n (regression coefficient 1);
- the mixed moment E[A_ij^2 (H_i^2+H_j^2)] = 3h^3/40 exactly, vs 5h^3/72
  for any constant-conditional-variance construction (n = 0) — the ladder
  n = 0 -> 16 must move from the latter to the former;
- at Delta W = 0 the characteristic function E[cos lambda A] ->
  (lambda h/2)/sinh(lambda h/2) (Levy's formula) as n grows, away from the
  n=0 Gaussian's exp(-lambda^2 h^2/24);
- the non-commutative Levy-triple SDE law test lands at the EXACT 0.5
  (Davie measures 0.5104 in test_sdeint.py's harness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import BrownianInterval, ReverseBrownian, sdeint
from paddlexde_tpu.brownian.virtual_tree import fourier_area

H_SPAN = 1.0


def _sample(n_terms, n_paths, key=0, w_total=None):
    bm = BrownianInterval(
        0.0, H_SPAN, size=(n_paths, 2), key=jax.random.key(key),
        dtype=jnp.float64, levy_area_approximation="fourier",
        levy_fourier_terms=n_terms, W=w_total,
    )
    w, u, a = bm(0.0, H_SPAN, return_U=True, return_A=True)
    h_levy = u / H_SPAN - 0.5 * w
    return np.asarray(w), np.asarray(h_levy), np.asarray(a)


def test_antisymmetric_zero_diagonal():
    _, _, a = _sample(4, 1000)
    np.testing.assert_allclose(a + np.swapaxes(a, -1, -2), 0.0, atol=1e-15)


@pytest.mark.parametrize("n_terms", [0, 4, 16])
def test_total_variance_exact_for_every_n(n_terms):
    """Var(A_01) = h^2/4 (= 0.25) independent of the term count; Davie's
    construction gives h^2/3 (0.333) — the excess the triple test sees."""
    _, _, a = _sample(n_terms, 400_000)
    var = float(np.var(a[:, 0, 1]))
    assert abs(var - 0.25) < 0.004, (n_terms, var)


def test_davie_total_variance_is_excessive():
    """The baseline being improved on: reference-ported Davie = h^2/3."""
    bm = BrownianInterval(0.0, 1.0, size=(400_000, 2), key=jax.random.key(3),
                          dtype=jnp.float64, levy_area_approximation="davie")
    _, _, a = bm(0.0, 1.0, return_U=True, return_A=True)
    var = float(np.var(np.asarray(a)[:, 0, 1]))
    assert abs(var - 1.0 / 3.0) < 0.005, var


@pytest.mark.parametrize("n_terms", [0, 16])
def test_conditional_mean_term(n_terms):
    """E[A | W, H] = H_i W_j - W_i H_j: the regression coefficient of A on
    the mean term is 1 for every n (b-coefficients are zero-mean and
    independent of the conditioning)."""
    w, h, a = _sample(n_terms, 200_000)
    m = h[:, 0] * w[:, 1] - w[:, 0] * h[:, 1]
    coef = float(np.mean(a[:, 0, 1] * m) / np.mean(m * m))
    assert abs(coef - 1.0) < 0.02, (n_terms, coef)


def test_mixed_moment_ladder():
    """M = E[A_01^2 (H_0^2 + H_1^2)]: exactly 3h^3/40 = 0.075 (the
    H-dependent conditional variance h^2/20 + (h/5)(H_i^2+H_j^2) integrated);
    any constant-conditional-variance tail (n=0) gives 5h^3/72 = 0.0694.
    The term count must walk the gap."""
    vals = {}
    for n in (0, 4, 16):
        w, h, a = _sample(n, 400_000, key=7)
        vals[n] = float(np.mean(a[:, 0, 1] ** 2 * (h[:, 0] ** 2 + h[:, 1] ** 2)))
    assert abs(vals[0] - 5.0 / 72.0) < 0.002, vals
    assert abs(vals[16] - 0.075) < 0.002, vals
    assert vals[0] < vals[4] < vals[16], vals


def test_levy_characteristic_function_ladder():
    """Conditional on Delta W = 0 (W= pins the endpoint): E[cos(lambda A)]
    -> (lambda h/2)/sinh(lambda h/2). At lambda h = 6: exact 0.29952; the
    n=0 Gaussian gives exp(-1.5) = 0.22313. Monotone approach in n."""
    lam = 6.0
    exact = (lam / 2.0) / np.sinh(lam / 2.0)
    cfs = {}
    for n in (0, 4, 16, 48):
        _, _, a = _sample(n, 400_000, key=11,
                          w_total=jnp.zeros((400_000, 2), jnp.float64))
        cfs[n] = float(np.mean(np.cos(lam * a[:, 0, 1])))
    assert abs(cfs[0] - np.exp(-1.5)) < 0.005, cfs
    assert abs(cfs[48] - exact) < 0.008, (cfs, exact)
    assert abs(cfs[16] - exact) < abs(cfs[0] - exact) / 3, cfs


def test_levy_triple_sde_law_exact():
    """The harness that measured Davie at 0.5104: with fourier areas the
    non-commutative triple dy3 = y1 dW2 must land at the exact 0.5."""
    n_paths = 32_768
    y0 = jnp.zeros((n_paths, 3))
    f = lambda t, y: jnp.zeros_like(y)

    def g_mat(t, y):
        z = jnp.zeros_like(y[..., 0])
        one = jnp.ones_like(z)
        col1 = jnp.stack([one, z, z], -1)
        col2 = jnp.stack([z, one, y[..., 0]], -1)
        return jnp.stack([col1, col2], axis=-1)

    ts = jnp.linspace(0.0, 1.0, 9)
    bm = BrownianInterval(0.0, 1.0, size=(n_paths, 2), key=jax.random.key(5),
                          dtype=jnp.float64, levy_area_approximation="fourier",
                          levy_fourier_terms=8)
    sol = sdeint(f, g_mat, y0, ts, "milstein_general", bm=bm, time_axis=0)
    var = float(jnp.var(sol[-1][:, 2]))
    assert 0.486 < var < 0.514, var


def test_reverse_wrapper_composes():
    bm = BrownianInterval(0.0, 1.0, size=(64, 2), key=jax.random.key(1),
                          dtype=jnp.float64, levy_area_approximation="fourier")
    rev = ReverseBrownian(bm)
    w, u, a = rev(-1.0, -0.0, return_U=True, return_A=True)
    w0, u0, a0 = bm(0.0, 1.0, return_U=True, return_A=True)
    np.testing.assert_allclose(np.asarray(w), -np.asarray(w0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(a), -np.asarray(a0), atol=1e-12)


def test_default_bm_accepts_fourier():
    """sdeint's default-bm path honors levy_area_approximation='fourier'
    (terms default 8); milstein_general runs end to end."""
    f = lambda t, y: jnp.zeros_like(y)
    g_mat = lambda t, y: jnp.stack([y, 0.5 * y], axis=-1)
    sol = sdeint(f, g_mat, jnp.ones((4, 2)), jnp.linspace(0.0, 1.0, 5),
                 "milstein_general", key=1, noise_dim=2,
                 levy_area_approximation="fourier", time_axis=0)
    assert bool(jnp.all(jnp.isfinite(sol)))


def test_scalar_channel_area_is_zero():
    a = fourier_area(jax.random.key(0), 0.0, 1.0, jnp.ones(()), jnp.ones(()))
    assert float(a) == 0.0
