"""sdeint_weak_mc: batched weak-expectation estimation + Talay–Tubaro
extrapolation (``functional/sdeint_weak.py``; no counterpart in the
reference).

Measurement design: for GBM ``dy = μy dt + σy dW`` the EULER mean is exactly
``E[Y^h_N] = y0 (1+μh)^N`` — the mean bias is DETERMINISTIC (independent of
σ), so with a small σ the Monte-Carlo noise floor sits orders below the bias
and the Richardson cancellation is directly measurable: coarse bias
``e^μ − (1+μh)^N`` ~ h, extrapolated ``2(1+μh/2)^{2N} − (1+μh)^N − e^μ`` ~ h².
"""

import jax.numpy as jnp
import pytest

import paddlexde_tpu as pxt

MU, SIGMA = 1.0, 0.05
EXACT = float(jnp.exp(jnp.asarray(MU, jnp.float64)))  # E[Y_1], y0 = 1


def _gbm():
    f = lambda t, y: MU * y
    g = lambda t, y: SIGMA * y
    y0 = jnp.array([1.0], dtype=jnp.float64)
    return f, g, y0


def _euler_mean(n):
    """Closed-form Euler mean (1 + mu/n)^n."""
    return float((1.0 + MU / n) ** n)


def test_euler_richardson_cancels_leading_bias():
    f, g, y0 = _gbm()
    est = pxt.sdeint_weak_mc(
        f, g, y0, 1.0, solver="euler", n_paths=16384, n_steps=8, key=0,
    )
    coarse_bias = abs(float(est.mean_coarse[0]) - EXACT)  # ~0.153
    extra_bias = abs(float(est.mean[0]) - EXACT)  # ~7e-3 + MC noise
    # the estimator matches its own closed-form mean (MC noise only)
    assert abs(float(est.mean_coarse[0]) - _euler_mean(8)) < 5e-3
    assert abs(float(est.mean_fine[0]) - _euler_mean(16)) < 5e-3
    assert extra_bias < coarse_bias / 8, (extra_bias, coarse_bias)
    # stderr is honest: the true error is within ~4 sigma of it
    assert extra_bias < abs(2 * _euler_mean(16) - _euler_mean(8) - EXACT) + 4 * float(est.stderr[0])


def test_euler_richardson_order_two_slope():
    """Extrapolated bias falls ~4x per halving (order 2); plain Euler ~2x
    (order 1). Deterministic-bias design keeps MC noise far below both."""
    f, g, y0 = _gbm()
    biases_plain, biases_extra = [], []
    for n in (4, 8):
        est = pxt.sdeint_weak_mc(
            f, g, y0, 1.0, solver="euler", n_paths=16384, n_steps=n, key=0,
        )
        biases_plain.append(abs(float(est.mean_coarse[0]) - EXACT))
        biases_extra.append(abs(float(est.mean[0]) - EXACT))
    slope_plain = float(jnp.log2(jnp.asarray(biases_plain[0] / biases_plain[1])))
    slope_extra = float(jnp.log2(jnp.asarray(biases_extra[0] / biases_extra[1])))
    assert 0.7 < slope_plain < 1.3, slope_plain
    assert 1.6 < slope_extra < 2.6, slope_extra


def test_weak2_extrapolation_improves_at_fixed_h():
    f, g, y0 = _gbm()
    est = pxt.sdeint_weak_mc(
        f, g, y0, 1.0, solver="weak2", n_paths=16384, n_steps=8, key=1,
    )
    coarse_bias = abs(float(est.mean_coarse[0]) - EXACT)
    extra_bias = abs(float(est.mean[0]) - EXACT)
    # weak2's own bias is already ~1e-3 at h=1/8; the combination must not
    # make it worse and typically lands near the MC floor
    assert extra_bias < max(coarse_bias, 4 * float(est.stderr[0]))


def test_vector_functional_and_per_path_y0():
    f, g, y0 = _gbm()
    y0_paths = jnp.ones((512, 1), dtype=jnp.float64)

    def phi(y):  # [n, 1] -> [n, 2]: mean and second moment jointly
        return jnp.concatenate([y, y * y], axis=-1)

    est = pxt.sdeint_weak_mc(
        f, g, y0_paths, 1.0, phi, solver="weak2", n_paths=512, n_steps=8,
        key=2,
    )
    assert est.mean.shape == (2,)
    assert est.stderr.shape == (2,)
    assert abs(float(est.mean[0]) - EXACT) < 0.2
    # E[Y^2] = exp(2 mu + sigma^2)
    m2 = float(jnp.exp(jnp.asarray(2 * MU + SIGMA**2, jnp.float64)))
    assert abs(float(est.mean[1]) - m2) < 0.5

    with pytest.raises(ValueError, match="n_paths"):
        pxt.sdeint_weak_mc(
            f, g, jnp.ones((100, 1)), 1.0, solver="euler", n_paths=512,
            n_steps=4,
        )


def test_general_noise_weak_mc():
    """weak2_general under the MC driver (2 non-commuting-ish channels)."""
    a, b1, b2 = 0.5, 0.04, 0.03
    f = lambda t, y: a * y
    G = lambda t, y: jnp.stack([b1 * y, b2 * y], axis=-1)
    y0 = jnp.array([1.0], dtype=jnp.float64)
    est = pxt.sdeint_weak_mc(
        f, G, y0, 1.0, solver="weak2_general", n_paths=4096, n_steps=8,
        key=3, noise_dim=2,
    )
    exact = float(jnp.exp(jnp.asarray(a, jnp.float64)))
    assert abs(float(est.mean[0]) - exact) < 0.02


def test_no_richardson_path():
    f, g, y0 = _gbm()
    est = pxt.sdeint_weak_mc(
        f, g, y0, 1.0, solver="euler", n_paths=2048, n_steps=8, key=0,
        richardson=False,
    )
    assert est.mean_fine is None
    assert abs(float(est.mean[0]) - _euler_mean(8)) < 2e-2


def test_unknown_solver_weak_order():
    f, g, y0 = _gbm()
    with pytest.raises(ValueError, match="weak order"):
        pxt.sdeint_weak_mc(
            f, g, y0, 1.0, solver="not_a_scheme", n_paths=64, n_steps=4,
        )


def test_antithetic_brownian_algebra():
    """AntitheticBrownian is the pathwise negation: (−W, −U, −K, +A) per
    query, exactly (pure linear/bilinear algebra on the base tree)."""
    import jax

    from paddlexde_tpu.brownian.api import AntitheticBrownian, BrownianInterval

    bm = BrownianInterval(0.0, 1.0, size=(4, 3), key=jax.random.key(2),
                          dtype=jnp.float64, levy_area_approximation="davie")
    anti = AntitheticBrownian(bm)
    w, u, a = bm(0.1, 0.7, return_U=True, return_A=True)
    wn, un, an = anti(0.1, 0.7, return_U=True, return_A=True)
    assert jnp.array_equal(wn, -w) and jnp.array_equal(un, -u)
    assert jnp.array_equal(an, a)

    bm_k = BrownianInterval(0.0, 1.0, size=(4,), key=jax.random.key(2),
                            dtype=jnp.float64,
                            levy_area_approximation="space-time-time")
    anti_k = AntitheticBrownian(bm_k)
    w, u, k = bm_k(0.0, 0.5, return_K=True)
    wn, un, kn = anti_k(0.0, 0.5, return_K=True)
    assert jnp.array_equal(wn, -w) and jnp.array_equal(un, -u)
    assert jnp.array_equal(kn, -k)
    assert jnp.array_equal(anti_k(0.0, 0.5), -bm_k(0.0, 0.5))


def test_antithetic_variance_reduction_and_unbiasedness():
    """Antithetic pairing at the SAME n_paths must cut the GBM-mean stderr
    by well over 2x (measured 13.3x variance = 3.6x stderr at σ=0.4) and
    stay within its own error bars of the truth."""
    import jax

    sigma = 0.4
    f = lambda t, y: MU * y
    g = lambda t, y: sigma * y
    y0 = jnp.array([1.0], dtype=jnp.float64)
    kw = dict(solver="weak2", n_paths=4096, n_steps=8, key=jax.random.key(4))
    est_p = pxt.sdeint_weak_mc(f, g, y0, 1.0, **kw)
    est_a = pxt.sdeint_weak_mc(f, g, y0, 1.0, antithetic=True, **kw)
    assert float(est_a.stderr[0]) < 0.5 * float(est_p.stderr[0]), (
        float(est_a.stderr[0]), float(est_p.stderr[0]))
    # unbiased: truth within 4 sigma + the (tiny) weak-2+Richardson bias
    assert abs(float(est_a.mean[0]) - EXACT) < 4 * float(est_a.stderr[0]) + 1e-3


def test_antithetic_general_noise_and_explicit_bm():
    """Antithetic composes with matrix noise (wraps the general-noise tree)
    and with a caller-provided bm."""
    import jax

    from paddlexde_tpu.brownian.api import BrownianInterval

    b1 = jnp.array([[0.0, 0.3], [0.0, 0.0]], jnp.float64)
    b2 = jnp.array([[0.0, 0.0], [0.2, 0.0]], jnp.float64)
    a0 = jnp.array([[0.3, 0.1], [-0.1, 0.2]], jnp.float64)
    f = lambda t, y: y @ a0.T
    g = lambda t, y: jnp.stack([y @ b1.T, y @ b2.T], axis=-1)
    y0 = jnp.array([1.0, 0.5], jnp.float64)
    n_paths = 2048
    est = pxt.sdeint_weak_mc(
        f, g, y0, 1.0, solver="weak2_general", n_paths=n_paths, n_steps=8,
        noise_dim=2, key=jax.random.key(7), antithetic=True,
    )
    from jax.scipy.linalg import expm

    mean_exact = expm(a0) @ y0
    gap = jnp.abs(est.mean - mean_exact)
    assert bool(jnp.all(gap < 4 * est.stderr + 2e-3)), (gap, est.stderr)

    bm = BrownianInterval(0.0, 1.0, size=(n_paths, 2), key=jax.random.key(9),
                          dtype=jnp.float64,
                          levy_area_approximation="davie")
    est2 = pxt.sdeint_weak_mc(
        f, g, y0, 1.0, solver="milstein_general", n_paths=n_paths, n_steps=8,
        noise_dim=2, bm=bm, antithetic=True,
    )
    assert bool(jnp.all(jnp.isfinite(est2.mean)))


def test_taylor15_is_weak_order_two():
    """The strong-1.5 scalar Itô–Taylor scheme contains every length-≤2
    multi-index with exact integrals, so it is WEAK order 2: its GBM mean
    follows (1+μh+μ²h²/2)^N exactly (noise terms are conditionally
    mean-zero), the bias slope is ~2 (measured 2.3e-2 → 1.4e-3 over
    n=4..16), and the p=2 Richardson combination cancels the leading term
    instead of doubling it (the round-3 review caught p=1 in the table)."""
    f, g, y0 = _gbm()  # sigma=0.05: MC floor far below deterministic bias
    est = pxt.sdeint_weak_mc(
        f, g, y0, 1.0, solver="taylor15",
        n_paths=16384, n_steps=4, key=0,
    )
    mu = MU

    def t15_mean(n):
        h = 1.0 / n
        return (1.0 + mu * h + 0.5 * (mu * h) ** 2) ** n

    assert abs(float(est.mean_coarse[0]) - t15_mean(4)) < 5e-3
    assert abs(float(est.mean_fine[0]) - t15_mean(8)) < 5e-3
    coarse_bias = abs(t15_mean(4) - EXACT)
    extra_closed = abs((4 * t15_mean(8) - t15_mean(4)) / 3.0 - EXACT)
    assert extra_closed < coarse_bias / 8  # p=2 cancellation in closed form
    assert abs(float(est.mean[0]) - EXACT) < extra_closed + 4 * float(est.stderr[0])


def test_weak_mc_implicit_schemes():
    """The theta methods carry their textbook weak order 1.0 in the table
    (Richardson at p=1). Round 5 MEASURED the implicit-additive rungs
    (tools/measure_weak_orders.py, test_weak_order_implicit.py), so
    implicit_sra1 is now accepted with the registry's order 2.0; the
    refusal discipline survives at the registry level (an unmeasured
    weak_order=None still raises — pinned via a synthetic spec)."""
    f = lambda t, y: -2.0 * y
    g = lambda t, y: 0.5 * jnp.ones_like(y)
    est = pxt.sdeint_weak_mc(f, g, jnp.ones((1,), jnp.float64), 1.0,
                             lambda y: y[..., 0], solver="implicit_em",
                             n_paths=512, n_steps=16, key=0)
    import numpy as np

    assert np.isfinite(float(est.mean))
    est2 = pxt.sdeint_weak_mc(f, g, jnp.ones((1,), jnp.float64), 1.0,
                              lambda y: y[..., 0], solver="implicit_sra1",
                              n_paths=64, n_steps=8, key=0)
    assert np.isfinite(float(est2.mean))

    # the refusal machinery itself is still live for unmeasured schemes
    import dataclasses
    from unittest import mock

    from paddlexde_tpu.functional.sde_schemes import registry

    spec = dataclasses.replace(registry.SDE_SCHEMES["implicit_sra1"],
                               weak_order=None)
    with mock.patch.dict(registry.SDE_SCHEMES, {"implicit_sra1": spec}):
        with pytest.raises(ValueError, match="order"):
            pxt.sdeint_weak_mc(f, g, jnp.ones((1,), jnp.float64), 1.0,
                               lambda y: y[..., 0], solver="implicit_sra1",
                               n_paths=64, n_steps=8, key=0)
