"""Brownian subsystem tests: statistics, consistency, reproducibility.

The reference shipped ZERO Brownian tests (SURVEY §4 coverage gaps) and its
seeding is silently broken (§2.11-9). These tests pin: increment distribution
(mean/var), additivity/consistency across overlapping queries, bridge
conditionals, bit-reproducibility under the same key, independence under
different keys, Lévy-area statistics, and ReverseBrownian algebra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import (
    BrownianInterval,
    BrownianPath,
    BrownianTree,
    ReverseBrownian,
    brownian_interval_like,
)
from paddlexde_tpu.brownian import brownian_value


def test_increment_statistics():
    """W(ta,tb) ~ N(0, tb-ta) across many independent keys."""
    n = 4096
    bm = BrownianInterval(0.0, 1.0, size=(n,), dtype=jnp.float32, entropy=7)
    w = np.asarray(bm(0.2, 0.7))
    assert abs(w.mean()) < 4 * np.sqrt(0.5 / n)
    np.testing.assert_allclose(w.var(), 0.5, rtol=0.15)


def test_additivity_and_consistency():
    """W(a,c) == W(a,b) + W(b,c) exactly (stateless-tree invariant)."""
    bm = BrownianInterval(0.0, 2.0, size=(16,), dtype=jnp.float64, entropy=3)
    w_ac = bm(0.3, 1.7)
    w_ab = bm(0.3, 0.9)
    w_bc = bm(0.9, 1.7)
    np.testing.assert_allclose(w_ac, w_ab + w_bc, rtol=1e-12)


def test_query_order_independence():
    """Same key + same query -> same sample, regardless of other queries."""
    bm1 = BrownianInterval(0.0, 1.0, size=(8,), entropy=11)
    a = np.asarray(bm1(0.25, 0.5))
    _ = bm1(0.1, 0.9)
    _ = bm1(0.5, 0.75)
    b = np.asarray(bm1(0.25, 0.5))
    np.testing.assert_array_equal(a, b)

    bm2 = BrownianInterval(0.0, 1.0, size=(8,), entropy=11)
    _ = bm2(0.6, 0.8)  # different query order
    c = np.asarray(bm2(0.25, 0.5))
    np.testing.assert_array_equal(a, c)


def test_different_keys_differ():
    a = np.asarray(BrownianInterval(0.0, 1.0, size=(8,), entropy=1)(0.2, 0.8))
    b = np.asarray(BrownianInterval(0.0, 1.0, size=(8,), entropy=2)(0.2, 0.8))
    assert np.all(a != b)


def test_bridge_conditional_variance():
    """Var[W(m) | W(T)] = m(T-m)/T for the bridge at m given endpoints."""
    n = 4096
    key = jax.random.key(0)
    w_total = jnp.zeros((n,))  # pin W(1) = 0 -> pure bridge
    w_mid = np.asarray(
        brownian_value(key, 0.0, 1.0, 0.5, shape=(n,), dtype=jnp.float32, w_total=w_total)
    )
    np.testing.assert_allclose(w_mid.var(), 0.25, rtol=0.15)
    assert abs(w_mid.mean()) < 4 * np.sqrt(0.25 / n)


def test_w_pinning():
    """ctor W= pins the total increment exactly."""
    w_tot = jnp.full((4,), 1.234)
    bm = BrownianInterval(0.0, 1.0, size=(4,), entropy=0, W=w_tot)
    np.testing.assert_allclose(bm(0.0, 1.0), w_tot, rtol=1e-6)


def test_jit_and_vmap_safe():
    bm = BrownianInterval(0.0, 1.0, size=(4,), entropy=5)

    @jax.jit
    def f(ta, tb):
        return bm(ta, tb)

    w1 = f(jnp.asarray(0.1), jnp.asarray(0.4))
    w2 = bm(0.1, 0.4)
    np.testing.assert_allclose(w1, w2, rtol=1e-6)


def test_levy_space_time_stats():
    n = 4096
    bm = BrownianInterval(
        0.0, 1.0, size=(n,), entropy=9, levy_area_approximation="space-time"
    )
    w, u = bm(0.1, 0.6, return_U=True)
    h = 0.5
    # U = h(W/2 + H), H ~ N(0, h/12) indep of W => Var U = h^2 Var(W)/4 + h^3/12
    expect_var = h**2 * h / 4 + h**3 / 12
    np.testing.assert_allclose(np.asarray(u).var(), expect_var, rtol=0.2)


def test_levy_area_skew_symmetric():
    bm = BrownianInterval(
        0.0, 1.0, size=(64, 3), entropy=4, levy_area_approximation="davie"
    )
    w, a = bm(0.2, 0.9, return_A=True)
    assert a.shape == (64, 3, 3)
    np.testing.assert_allclose(np.asarray(a), -np.swapaxes(np.asarray(a), -1, -2), atol=1e-6)


def test_levy_errors_when_not_configured():
    bm = BrownianInterval(0.0, 1.0, size=(4,), entropy=0)
    with pytest.raises(ValueError):
        bm(0.1, 0.2, return_U=True)
    with pytest.raises(ValueError):
        bm(0.1, 0.2, return_A=True)


def test_reverse_brownian():
    base = BrownianInterval(-1.0, 0.0, size=(8,), entropy=6)
    rev = ReverseBrownian(base)
    np.testing.assert_allclose(rev(0.2, 0.5), -base(-0.5, -0.2), rtol=1e-6)


def test_derived_classes_and_like():
    path = BrownianPath(0.0, w0=jnp.zeros(3), t1=1.0)
    assert path(0.0, 0.5).shape == (3,)
    tree = BrownianTree(0.0, w0=jnp.zeros(3), t1=1.0, entropy=2, tol=2**-10)
    assert tree(0.1, 0.9).shape == (3,)
    y = jnp.ones((5, 2))
    bm = brownian_interval_like(y, 0.0, 2.0, entropy=1)
    assert bm(0.5, 1.5).shape == (5, 2)


def test_levy_tree_consistency():
    """Tree-carried (W, U): the composition identity
    U_{s,u} = U_{s,t} + U_{t,u} + (u-t)(W(t)-W(s)) holds EXACTLY — the
    property the reference's cache algebra aimed for (SURVEY §2.5)."""
    bm = BrownianInterval(0.0, 2.0, size=(16,), entropy=8, dtype=jnp.float64,
                          levy_area_approximation="space-time")
    s, t, u = 0.3, 0.9, 1.7
    w_su, u_su = bm(s, u, return_U=True)
    w_st, u_st = bm(s, t, return_U=True)
    w_tu, u_tu = bm(t, u, return_U=True)
    np.testing.assert_allclose(w_su, w_st + w_tu, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(u_su), np.asarray(u_st + u_tu + (u - t) * w_st), rtol=1e-9
    )


def test_levy_tree_statistics():
    """H = U/h - W/2 over an interval: Var(H) = h/12, independent of W."""
    n = 8192
    bm = BrownianInterval(0.0, 1.0, size=(n,), entropy=13,
                          levy_area_approximation="space-time")
    w, u = bm(0.2, 0.8, return_U=True)
    h = 0.6
    h_levy = np.asarray(u) / h - 0.5 * np.asarray(w)
    np.testing.assert_allclose(h_levy.var(), h / 12.0, rtol=0.15)
    corr = np.corrcoef(h_levy, np.asarray(w))[0, 1]
    assert abs(corr) < 0.06, corr
    # U itself: Var(U) = h^2 Var(W)/4 + h^3/12 (W and H independent)
    expect_u_var = h**2 * h / 4 + h**3 / 12
    np.testing.assert_allclose(np.asarray(u).var(), expect_u_var, rtol=0.15)


def test_query_key_f64_no_collision():
    """float64 query times closer than f32 resolution must map to DISTINCT
    per-query keys (a plain f32 downcast collided them, duplicating the
    per-query Levy-area noise across neighbouring fine steps)."""
    from paddlexde_tpu.brownian.virtual_tree import _query_key, space_time_levy_area

    key = jax.random.key(7)
    eps = 1e-12  # far below f32 resolution at 1.0
    ta1, tb1 = jnp.float64(1.0), jnp.float64(1.0 + eps)
    ta2, tb2 = jnp.float64(1.0 + eps), jnp.float64(1.0 + 2 * eps)
    k1 = jax.random.key_data(_query_key(key, ta1, tb1))
    k2 = jax.random.key_data(_query_key(key, ta2, tb2))
    assert not bool(jnp.all(k1 == k2))
    h1 = space_time_levy_area(key, ta1, tb1, None, (8,), jnp.float64)
    h2 = space_time_levy_area(key, ta2, tb2, None, (8,), jnp.float64)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))
    # determinism per (key, ta, tb) is preserved in both dtypes
    k1b = jax.random.key_data(_query_key(key, ta1, tb1))
    assert bool(jnp.all(k1 == k1b))
    k32 = jax.random.key_data(_query_key(key, jnp.float32(0.25), jnp.float32(0.5)))
    k32b = jax.random.key_data(_query_key(key, jnp.float32(0.25), jnp.float32(0.5)))
    assert bool(jnp.all(k32 == k32b))
