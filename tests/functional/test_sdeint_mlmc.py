"""sdeint_mlmc: Giles multilevel Monte Carlo (``functional/sdeint_mlmc.py``;
no counterpart in the reference — its sdeint has no expectation tooling).

Claims pinned here:
- the telescoping sum is EXACT in expectation: with the deterministic-
  Euler-mean design (tiny σ ⇒ MC floor orders below the mean structure)
  every level mean matches its closed form ``(1+μh_l)^{N_l} −
  (1+μh_{l-1})^{N_{l-1}}``;
- coupled-level variance decays geometrically (the whole point of MLMC —
  uncoupled levels would hold V_l ≈ 2·Var[φ] flat);
- the auto driver hits its ε target on GBM and its reported stderr/bias
  diagnostics are honest;
- the measured cost beats the single-level cost bound at equal ε by a
  large factor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paddlexde_tpu as pxt

MU = 1.0
EXACT = float(np.exp(MU))


def _gbm(sigma):
    return (lambda t, y: MU * y), (lambda t, y: sigma * y)


def _euler_mean(n_steps):
    return (1.0 + MU / n_steps) ** n_steps


def test_level_means_match_closed_form_telescoping():
    """σ=0.05: the Euler mean is deterministic to MC-floor accuracy, so each
    level's Ê[Δ_l] must equal the closed-form telescoping increment."""
    f, g = _gbm(0.05)
    est = pxt.sdeint_mlmc(
        f, g, jnp.float64(1.0), 1.0, levels=3, n_steps0=4,
        n_per_level=[16384, 8192, 8192, 8192], key=7,
    )
    n0 = 4
    expect = [_euler_mean(n0)]
    for lv in range(1, 4):
        expect.append(_euler_mean(n0 * 2**lv) - _euler_mean(n0 * 2 ** (lv - 1)))
    got = [float(np.asarray(m)) for m in est.mean_per_level]
    np.testing.assert_allclose(got, expect, atol=5e-3)
    # the telescoped value is the fine-grid mean
    assert abs(float(est.value) - _euler_mean(32)) < 5e-3


def test_coupled_variance_decays_geometrically():
    """Var[Δ_l] must fall level over level (tree coupling); an uncoupled
    implementation would plateau at ~2·Var[φ] ≈ 4."""
    f, g = _gbm(0.5)
    est = pxt.sdeint_mlmc(
        f, g, jnp.float64(1.0), 1.0, levels=4, n_steps0=4,
        n_per_level=[4096] * 5, key=3,
    )
    v = est.var_per_level
    assert v[1] > v[2] > v[3] > v[4], v
    assert v[4] < v[1] / 4, v  # ~2x per level for Euler + Lipschitz phi
    assert v[4] < 0.05, v  # far below the uncoupled 2·Var[phi] ≈ 4 plateau


def test_auto_driver_hits_eps_target():
    f, g = _gbm(0.5)
    eps = 0.01
    est = pxt.sdeint_mlmc(f, g, jnp.float64(1.0), 1.0, eps=eps, key=3)
    err = abs(float(est.value) - EXACT)
    # rmse budget: eps (plus a small slack for the probabilistic bound)
    assert err < 3 * eps, (err, est.n_per_level)
    assert float(est.stderr) < eps, float(est.stderr)
    assert float(est.bias_estimate) < eps, float(est.bias_estimate)
    # allocation is decreasing in level (V_l/C_l falls)
    ns = est.n_per_level
    assert ns[0] > ns[1] > ns[2], ns


def test_cost_beats_single_level():
    """At ε=0.01 the measured MLMC cost must undercut the single-level cost
    bound (2·Var[φ]/ε²) paths × (bias-matching steps) by a wide margin."""
    f, g = _gbm(0.5)
    eps = 0.01
    est = pxt.sdeint_mlmc(f, g, jnp.float64(1.0), 1.0, eps=eps, key=3)
    var_phi = (np.exp(2 * MU + 0.25) * (np.exp(0.25) - 1.0))  # Var[Y_1], σ=.5
    # single-level needs h with |bias| ~ e·μ²h/2 ≤ ε/√2 -> n_steps ≥ ~192
    n_steps_single = int(np.ceil(np.e * MU**2 / (2 * eps / np.sqrt(2.0))))
    single_cost = (2.0 * var_phi / eps**2) * n_steps_single
    # measured 8.3x at eps=0.01 (the gap widens as eps shrinks: eps^-2 log^2
    # vs eps^-3); assert the conservative half of it
    assert est.cost_units < single_cost / 5, (est.cost_units, single_cost)


def test_vector_state_and_functional():
    """2-D state, vector φ (both components), milstein coupling."""
    a0 = jnp.array([[0.4, 0.1], [0.0, 0.3]], jnp.float64)
    f = lambda t, y: y @ a0.T
    g = lambda t, y: 0.3 * y
    est = pxt.sdeint_mlmc(
        f, g, jnp.array([1.0, 0.5], jnp.float64), 1.0, solver="milstein",
        levels=3, n_per_level=[8192, 4096, 2048, 1024], key=11,
    )
    from jax.scipy.linalg import expm

    mean_exact = expm(a0) @ jnp.array([1.0, 0.5])
    gap = np.abs(np.asarray(est.value) - np.asarray(mean_exact))
    bound = 4 * np.asarray(est.stderr) + 3 * np.asarray(est.bias_estimate) + 2e-3
    assert (gap < bound).all(), (gap, bound)


def test_mlmc_guards():
    f, g = _gbm(0.3)
    with pytest.raises(ValueError, match="exactly one"):
        pxt.sdeint_mlmc(f, g, 1.0, 1.0)
    with pytest.raises(ValueError, match="exactly one"):
        pxt.sdeint_mlmc(f, g, 1.0, 1.0, eps=0.1, levels=2)
    with pytest.raises(ValueError, match="levels\\+1"):
        pxt.sdeint_mlmc(f, g, 1.0, 1.0, levels=2, n_per_level=[4, 4])


def test_antithetic_mlmc_cuts_level_variance():
    """antithetic=True: level-0 variance (the usual cost driver) drops by
    the antithetic factor (measured 18x on GBM σ=0.5) and the auto driver
    allocates far fewer level-0 paths; the estimate stays within budget.
    Total cost can still rise in bias/pilot-dominated regimes (documented)."""
    f, g = _gbm(0.5)
    eps = 0.01
    est_p = pxt.sdeint_mlmc(f, g, jnp.float64(1.0), 1.0, eps=eps, key=3)
    est_a = pxt.sdeint_mlmc(f, g, jnp.float64(1.0), 1.0, eps=eps, key=3,
                            antithetic=True)
    assert est_a.var_per_level[0] < est_p.var_per_level[0] / 5
    assert est_a.n_per_level[0] < est_p.n_per_level[0] / 3
    assert abs(float(est_a.value) - EXACT) < 3 * eps
