"""Chen-composed triple iterated integrals (round-4 candidate #3).

``_chen_levels`` composes level-<=3 Stratonovich signatures over k
tree-consistent sub-intervals (Chen's identity). The k=1 construction zeroes
the level-3 Lie component (documented limitation of taylor15_general); the
composition BUILDS it from the cross terms of sub-(dW, A), with law error
shrinking as O(1/k). Pinned here:

- k=1 reproduces the zero-Lie construction bit-exactly (J3) / to fp dust (A);
- shuffle identity J(a).J(bc) = sum of shuffles holds EXACTLY at every k
  (Chen products of group-likes are group-like);
- LAW: E[I3(w)^2] = h^3/6 for every length-3 word (iterated Ito isometry).
  The k=1 zero-Lie value for the middle word (0,1,0) sits at ~0.53 of truth;
  k=4 restores it within MC tolerance. Davie areas' composed excess follows
  the exact 1 + 1/(3k) law; fourier areas are variance-exact at every k;
- scheme plumbing: sdeint/sdeint_adjoint accept options={'triple_substeps'}
  for taylor15_general; k=1 bit-matches the default path; adjoint == direct.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import BrownianInterval, sdeint, sdeint_adjoint
from paddlexde_tpu.functional.sdeint import (
    _chen_levels,
    _levy_triple_integrals,
    _strat_sig23,
)

H = 0.25


def _bm(levy, n=1 << 14, m=2, key=7):
    return BrownianInterval(0.0, H, size=(n, m), key=jax.random.key(key),
                            dtype=jnp.float64, levy_area_approximation=levy)


def test_chen_k1_reproduces_zero_lie_construction():
    bm = _bm("davie", n=256)
    w1, a1, j31 = _chen_levels(bm, 0.0, H, 1)
    w0, u0, a0 = bm(0.0, H, return_U=True, return_A=True)
    _, j30 = _strat_sig23(w0, a0)
    assert bool(jnp.all(w1 == w0))
    assert bool(jnp.all(j31 == j30))
    # a is reconstructed as S2 - 0.5 W (x) W: equal to fp dust only
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=1e-15)


def test_chen_shuffle_identity_every_k():
    """J(0)*J(1,0) = J(0,1,0) + 2 J(1,0,0): group-likeness survives the
    composition exactly (the area/Lie samples are approximate in LAW, never
    in algebra)."""
    bm = _bm("davie", n=512)
    for k in (1, 3, 8):
        w, a, j3 = _chen_levels(bm, 0.0, H, k)
        s2 = 0.5 * w[..., :, None] * w[..., None, :] + a
        lhs = w[..., 0] * s2[..., 1, 0]
        rhs = j3[..., 0, 1, 0] + 2.0 * j3[..., 1, 0, 0]
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=1e-13)


def test_chen_law_moments_converge():
    """Iterated Ito isometry: E[I(w)^2] = h^3/6 for every length-3 word.
    The k=1 zero-Lie construction misses the middle word (0,1,0) by ~2x
    (its Lie deficiency); Chen composition restores it. Davie's composed
    area excess follows the derived 1 + 1/(3k); fourier is exact at all k."""
    tgt = H**3 / 6.0

    def moments(levy, k):
        bm = _bm(levy)
        w, a, j3 = _chen_levels(bm, 0.0, H, k)
        _, u = bm(0.0, H, return_U=True)
        i3 = _levy_triple_integrals(w, u, a, jnp.float64(H),
                                    j3 if k > 1 else None)
        m010 = float(jnp.mean(i3[..., 0, 1, 0] ** 2)) / tgt
        var_a = float(jnp.var(a[..., 0, 1])) / (H * H / 4.0)
        return m010, var_a

    m010_1, var_1 = moments("davie", 1)
    m010_4, var_4 = moments("davie", 4)
    # zero-Lie middle-word deficiency (exact value ~0.53 of truth)
    assert m010_1 < 0.65, m010_1
    assert 0.9 < m010_4 < 1.15, m010_4
    # davie excess: 4/3 at k=1, 1+1/12 at k=4 (each within MC tolerance)
    np.testing.assert_allclose(var_1, 4.0 / 3.0, rtol=0.05)
    np.testing.assert_allclose(var_4, 1.0 + 1.0 / 12.0, rtol=0.05)
    # fourier: variance-exact at every k, middle word restored by k=4
    m010_f1, var_f1 = moments("fourier", 1)
    m010_f4, var_f4 = moments("fourier", 4)
    assert m010_f1 < 0.65, m010_f1
    assert 0.9 < m010_f4 < 1.1, m010_f4
    np.testing.assert_allclose(var_f1, 1.0, rtol=0.05)
    np.testing.assert_allclose(var_f4, 1.0, rtol=0.05)


def _noncommuting_setup():
    rng = np.random.RandomState(1)
    D, M = 4, 2
    # strongly non-commuting constant-coefficient multiplicative fields
    B1 = jnp.asarray(rng.randn(D, D) * 0.4, jnp.float64)
    B2 = jnp.asarray(rng.randn(D, D) * 0.4, jnp.float64)
    f = lambda t, y: -0.3 * y
    g = lambda t, y: jnp.stack([y @ B1.T, y @ B2.T], axis=-1)
    y0 = jnp.asarray(rng.randn(128, D), jnp.float64)
    return f, g, y0, M


def test_taylor15_general_triple_substeps_plumbing():
    """options={'triple_substeps': 1} bit-matches the default path through
    sdeint; k>1 runs and differs; sdeint_adjoint takes the knob and its
    gradient matches direct backprop."""
    f, g, y0, M = _noncommuting_setup()
    ts = jnp.linspace(0.0, 0.5, 9)

    def run(fn, **opts):
        bm = BrownianInterval(0.0, 0.5, size=(128, M),
                              key=jax.random.key(3), dtype=jnp.float64,
                              levy_area_approximation="fourier")
        return fn(f, g, y0, ts, "taylor15_general", bm=bm, noise_dim=M,
                  time_axis=0, options=opts or None)

    base = run(sdeint)
    k1 = run(sdeint, triple_substeps=1)
    k4 = run(sdeint, triple_substeps=4)
    assert bool(jnp.all(base == k1))
    assert float(jnp.max(jnp.abs(k4 - base))) > 0.0

    def loss(scale, fn, **opts):
        bm = BrownianInterval(0.0, 0.5, size=(128, M),
                              key=jax.random.key(3), dtype=jnp.float64,
                              levy_area_approximation="fourier")
        gs = lambda t, y: scale * g(t, y)
        sol = fn(f, gs, y0, ts, "taylor15_general", bm=bm, noise_dim=M,
                 time_axis=0, options=dict(opts))
        return jnp.mean(sol[-1] ** 2)

    s = jnp.asarray(0.8, jnp.float64)
    gd = jax.grad(lambda x: loss(x, sdeint, triple_substeps=3))(s)
    ga = jax.grad(lambda x: loss(x, sdeint_adjoint, triple_substeps=3))(s)
    np.testing.assert_allclose(float(ga), float(gd), rtol=1e-9)
