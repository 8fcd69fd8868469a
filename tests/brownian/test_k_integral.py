"""The (W, U, V) triple descent — space-time-time integral K (round 3).

Validation discipline mirrors the (W, ∫W) joint-descent tests: measured
distributional laws against the closed-form covariance, exact composition
identities, and the reversal algebra pinned as a LAW (covariance of the
reversed functionals), not by re-implementing the formulas.

Closed forms (interval of length δ, standardized by δ^{1/2}, δ^{3/2}, δ^{5/2}):

    Σ = [[1, 1/2, 1/6], [1/2, 1/3, 1/8], [1/6, 1/8, 1/20]]

with w = ΔW, u = ∫(W−W_a), k = ∫∫(W−W_a) — verified against Monte-Carlo
fine-path statistics during derivation (see virtual_tree.brownian_value_levy_k).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu.brownian import BrownianInterval, ReverseBrownian
from paddlexde_tpu.brownian.virtual_tree import brownian_triple

S_STD = np.array([[1, 1 / 2, 1 / 6], [1 / 2, 1 / 3, 1 / 8], [1 / 6, 1 / 8, 1 / 20]])

N_KEYS = 60000


def _cov(ta, tb, t0=0.0, t1=1.0):
    keys = jax.random.split(jax.random.key(0), N_KEYS)
    trip = jax.jit(jax.vmap(lambda kk: jnp.stack(
        brownian_triple(kk, t0, t1, ta, tb, (), jnp.float64, 16)
    )))
    return np.cov(np.asarray(trip(keys)).T)


def _scaled(d):
    D = np.diag([d**0.5, d**1.5, d**2.5])
    return D @ S_STD @ D


@pytest.mark.parametrize("ta,tb", [(0.0, 1.0), (0.0, 0.5), (0.5, 1.0),
                                   (0.25, 0.75)])
def test_triple_covariance_matches_law(ta, tb):
    emp = _cov(ta, tb)
    want = _scaled(tb - ta)
    assert np.max(np.abs(emp - want) / np.abs(want)) < 0.04


def test_triple_chaining_exact():
    """w/u/k of [0,1] decompose EXACTLY into any two sub-queries
    (k = k₁ + η u₁ + (η²/2) w₁ + k₂), dyadic or not."""
    key = jax.random.key(7)
    q = lambda ta, tb: [float(x) for x in
                        brownian_triple(key, 0.0, 1.0, ta, tb, (), jnp.float64, 20)]
    w, u, k = q(0.0, 1.0)
    for mid in (0.5, 0.31, 0.875):
        w1, u1, k1 = q(0.0, mid)
        w2, u2, k2 = q(mid, 1.0)
        eta = 1.0 - mid
        np.testing.assert_allclose(w, w1 + w2, atol=1e-12)
        np.testing.assert_allclose(u, u1 + eta * w1 + u2, atol=1e-12)
        np.testing.assert_allclose(
            k, k1 + eta * u1 + eta * eta / 2 * w1 + k2, atol=1e-12
        )


def test_disjoint_intervals_independent():
    keys = jax.random.split(jax.random.key(3), N_KEYS)

    def both(kk):
        a = jnp.stack(brownian_triple(kk, 0.0, 1.0, 0.0, 0.5, (), jnp.float64, 14))
        b = jnp.stack(brownian_triple(kk, 0.0, 1.0, 0.5, 1.0, (), jnp.float64, 14))
        return jnp.concatenate([a, b])

    X = np.asarray(jax.jit(jax.vmap(both))(keys))
    cross = np.cov(X.T)[:3, 3:]
    assert np.max(np.abs(cross)) < 0.004, cross


def test_brownian_interval_k_mode():
    bm = BrownianInterval(0.0, 1.0, size=(8,), entropy=11, dtype=jnp.float64,
                          levy_area_approximation="space-time-time")
    w, u, k = bm(0.2, 0.9, return_U=True, return_K=True)
    assert w.shape == u.shape == k.shape == (8,)
    # W identical across query modes (all routed through the triple descent)
    np.testing.assert_array_equal(np.asarray(bm(0.2, 0.9)), np.asarray(w))
    # return_K without the K tree is a loud error
    bm2 = BrownianInterval(0.0, 1.0, size=(8,), entropy=11)
    with pytest.raises(ValueError, match="space-time-time"):
        bm2(0.2, 0.9, return_K=True)
    with pytest.raises(ValueError, match="davie|foster"):
        bm(0.2, 0.9, return_A=True)


def test_reverse_k_law():
    """The REVERSED path's (w̃, ũ, k̃) must be a valid Brownian triple: same
    closed-form covariance law as a forward one (pins the reversal algebra
    k̃ = h·u − k − h²w/2 as a law, signs included)."""
    def rev_triple(kk):
        bm = BrownianInterval(-1.0, 0.0, size=(), key=kk, dtype=jnp.float64,
                              levy_area_approximation="space-time-time")
        rb = ReverseBrownian(bm)
        return jnp.stack(rb(0.25, 0.75, return_U=True, return_K=True))

    keys = jax.random.split(jax.random.key(5), N_KEYS)
    emp = np.cov(np.asarray(jax.jit(jax.vmap(rev_triple))(keys)).T)
    want = _scaled(0.5)
    assert np.max(np.abs(emp - want) / np.abs(want)) < 0.04

    # and reversal composes: k̃ identity against the forward query
    bm = BrownianInterval(-1.0, 0.0, size=(), entropy=2, dtype=jnp.float64,
                          levy_area_approximation="space-time-time")
    rb = ReverseBrownian(bm)
    w_r, u_r, k_r = (float(x) for x in rb(0.25, 0.75, return_U=True, return_K=True))
    w_f, u_f, k_f = (float(x) for x in bm(-0.75, -0.25, return_U=True, return_K=True))
    h = 0.5
    np.testing.assert_allclose(w_r, -w_f, atol=1e-12)
    np.testing.assert_allclose(u_r, u_f - h * w_f, atol=1e-12)
    np.testing.assert_allclose(k_r, h * u_f - k_f - h * h / 2 * w_f, atol=1e-12)
