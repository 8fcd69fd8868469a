"""Joint (ΔW, U, A, J3) sampler — the exact level-≤3 signature of the
truncated-KL bridge path (round-4 VERDICT item 3; no reference counterpart:
``paddlexde/utils/brownian/brownian_interval.py:81-107`` in
DrownFish19/PaddleXDE stops at Davie/Foster level-2 pairs).

Pinned here, from first principles (never transcription trust):

- the closed-form resonance tensors (brownian/trig_poly.py) against fine
  numerical quadrature of the basis integrals;
- the sampled (A, J3) against direct iterated-integral quadrature along the
  RECONSTRUCTED smooth path (end-to-end: coefficients -> tensors -> exp
  rebuild all consistent with one actual path);
- shuffle identities machine-exact (the exp-rebuild makes J3 group-like by
  construction) and sym(J3) = ΔW⊗³/6;
- path consistency: the sampled path's time integral IS the tree's U;
- law ladder: E[I3(0,1,0)²] -> h³/6 as n_terms grows (the middle-word Lie
  moment the zero-Lie k=1 construction caps at ~0.53);
- reverse_triple is the signature group inverse (Chen-composes to identity);
- API: return_J3 contract on BrownianInterval / Antithetic / Reverse.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import BrownianInterval
from paddlexde_tpu.brownian.api import AntitheticBrownian, ReverseBrownian
from paddlexde_tpu.brownian.trig_poly import signature_tensors
from paddlexde_tpu.brownian.virtual_tree import (
    brownian_pair,
    fourier_path_coeffs,
    fourier_triple,
    reverse_triple,
)

H = 0.25


# ---------------------------------------------------------------- helpers
def _basis_on_grid(n, x):
    """(Phi [K, G], phi [K, G]) numeric basis: ramp + (cos-1)/sin modes."""
    k_dim = 2 * n + 1
    phis = np.zeros((k_dim, x.size))
    dphis = np.zeros((k_dim, x.size))
    phis[0] = x
    dphis[0] = 1.0
    for r in range(1, n + 1):
        phis[r] = np.cos(2 * np.pi * r * x) - 1.0
        dphis[r] = -2 * np.pi * r * np.sin(2 * np.pi * r * x)
        phis[n + r] = np.sin(2 * np.pi * r * x)
        dphis[n + r] = 2 * np.pi * r * np.cos(2 * np.pi * r * x)
    return phis, dphis


def _cumtrapz(y, x):
    out = np.zeros_like(y)
    out[..., 1:] = np.cumsum(0.5 * (y[..., 1:] + y[..., :-1]) * np.diff(x), -1)
    return out


def test_signature_tensors_vs_quadrature():
    """T2[i,j] = ∫Φ_i φ_j and T3[i,j,k] = ∫(∫Φ_i φ_j)φ_k: the closed-form
    symbolic integrals against fine trapezoid quadrature, every entry."""
    n = 2
    t2, t3 = signature_tensors(n)
    x = np.linspace(0.0, 1.0, 200_001)
    phis, dphis = _basis_on_grid(n, x)
    k_dim = 2 * n + 1
    for i in range(k_dim):
        for j in range(k_dim):
            prod = phis[i] * dphis[j]
            inner = _cumtrapz(prod, x)
            np.testing.assert_allclose(t2[i, j], inner[-1], atol=5e-9,
                                       err_msg=f"T2[{i},{j}]")
            for k in range(k_dim):
                val = _cumtrapz(inner * dphis[k], x)[-1]
                np.testing.assert_allclose(t3[i, j, k], val, atol=5e-8,
                                           err_msg=f"T3[{i},{j},{k}]")


def test_triple_matches_path_quadrature():
    """End-to-end: reconstruct the sampled KL path on a fine grid, quadrature
    its level-2/3 iterated Stratonovich integrals, compare with the returned
    (A, J3). Iterated integrals are reparametrization-invariant so the [0,1]
    grid stands for [ta, tb]."""
    key = jax.random.key(42)
    n_terms, m, batch = 3, 2, 4
    w = jax.random.normal(jax.random.key(7), (batch, m), jnp.float64) * np.sqrt(H)
    h_levy = jax.random.normal(jax.random.key(8), (batch, m), jnp.float64) * np.sqrt(H / 12)
    xi = np.asarray(fourier_path_coeffs(key, 0.0, H, w, h_levy, n_terms=n_terms))
    a_mat, j3 = fourier_triple(key, 0.0, H, w, h_levy, n_terms=n_terms)

    x = np.linspace(0.0, 1.0, 100_001)
    phis, dphis = _basis_on_grid(n_terms, x)
    # path [batch, M, G] and its derivative
    path = np.einsum("bkm,kg->bmg", xi, phis)
    dpath = np.einsum("bkm,kg->bmg", xi, dphis)
    np.testing.assert_allclose(path[..., -1], np.asarray(w), atol=1e-10)

    j2 = np.empty((batch, m, m))
    j3_quad = np.empty((batch, m, m, m))
    for a in range(m):
        for b in range(m):
            inner_ab = _cumtrapz(path[:, a, :] * dpath[:, b, :], x)  # [batch, G]
            j2[:, a, b] = inner_ab[..., -1]
            for c in range(m):
                j3_quad[:, a, b, c] = _cumtrapz(inner_ab * dpath[:, c, :], x)[..., -1]

    a_quad = 0.5 * (j2 - np.swapaxes(j2, -1, -2))
    np.testing.assert_allclose(np.asarray(a_mat), a_quad, atol=2e-8)
    np.testing.assert_allclose(np.asarray(j3), j3_quad, atol=2e-7)


def test_shuffle_identities_machine_exact():
    """Group-likeness by construction: W_a·J2[b,c] equals the 3-term shuffle
    sum, the 6-perm sum equals W_aW_bW_c, and sym(J3) = ΔW⊗³/6."""
    key = jax.random.key(0)
    m, batch = 3, 256
    w = jax.random.normal(jax.random.key(1), (batch, m), jnp.float64) * np.sqrt(H)
    h_levy = jax.random.normal(jax.random.key(2), (batch, m), jnp.float64) * np.sqrt(H / 12)
    a_mat, j3 = fourier_triple(key, 0.0, H, w, h_levy, n_terms=4)
    j3 = np.asarray(j3)
    wn = np.asarray(w)
    j2 = 0.5 * wn[:, :, None] * wn[:, None, :] + np.asarray(a_mat)
    for a in range(m):
        for b in range(m):
            for c in range(m):
                lhs = wn[:, a] * j2[:, b, c]
                rhs = j3[:, a, b, c] + j3[:, b, a, c] + j3[:, b, c, a]
                np.testing.assert_allclose(lhs, rhs, atol=1e-13)
                six = (j3[:, a, b, c] + j3[:, a, c, b] + j3[:, b, a, c]
                       + j3[:, b, c, a] + j3[:, c, a, b] + j3[:, c, b, a])
                np.testing.assert_allclose(
                    six, wn[:, a] * wn[:, b] * wn[:, c], atol=1e-13)
    sym = np.zeros_like(j3)
    for perm in ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)):
        sym += np.transpose(j3, (0,) + tuple(1 + p for p in perm))
    cube = wn[:, :, None, None] * wn[:, None, :, None] * wn[:, None, None, :]
    np.testing.assert_allclose(sym / 6.0, cube / 6.0, atol=1e-13)


def test_path_time_integral_is_tree_u():
    """The conditioning Σa_r = −H makes ∫₀ʰ B dt of the sampled path equal
    the tree's U exactly: (W, U, A, J3) are functionals of ONE path."""
    w, u, a_mat, j3 = brownian_pair(
        jax.random.key(3), 0.0, H, 0.0, H, shape=(64, 2),
        dtype=jnp.float64, levy="fourier", fourier_terms=4, triple=True,
    )
    xi = np.asarray(fourier_path_coeffs(
        jax.random.key(3), 0.0, H, w, u / H - 0.5 * w, n_terms=4))
    # ∫₀¹ of the basis: ramp 1/2, (cos−1) modes −1, sin modes 0, so
    # ∫₀ʰ B dt = h·(ΔW/2 − Σ_r a_r)
    integral = H * (0.5 * xi[:, 0] - xi[:, 1:5].sum(1))
    np.testing.assert_allclose(integral, np.asarray(u), atol=1e-12)


def test_lie_moment_ladder():
    """E[I3(0,1,0)²] → h³/6 as n_terms grows — the middle-word moment the
    zero-Lie construction caps at ~0.53 of truth (test_chen_triple.py).
    Itô conversion: I3 = J3 − ½δ_ab·I(0,c) − ½δ_bc·I(a,0) — for the word
    (0,1,0) both δ terms vanish, so I3(010) = J3[0,1,0]. Measured ladder
    (b = 2^15): 0.928 (n=2) → 0.959 (n=8) → 0.979 (n=16) — already near
    truth at tiny n, the KL path's sampled Lie component carrying most of
    the moment. Var(A)/(h²/4) walks its O(1/n) under-dispersion up:
    0.967 → 0.978 → 0.995."""
    tgt = H**3 / 6.0
    vals, avars = {}, {}
    for n in (2, 8, 16):
        bm = BrownianInterval(0.0, H, size=(1 << 15, 2),
                              key=jax.random.key(5), dtype=jnp.float64,
                              levy_area_approximation="fourier",
                              levy_fourier_terms=n)
        _w, _u, a, j3 = bm(0.0, H, return_U=True, return_A=True,
                           return_J3=True)
        vals[n] = float(jnp.mean(j3[..., 0, 1, 0] ** 2)) / tgt
        avars[n] = float(jnp.var(a[..., 0, 1])) / (H * H / 4.0)
    assert 0.88 < vals[2] < vals[16] < 1.05, vals
    assert 0.93 < vals[16], vals
    assert 0.93 < avars[2] < avars[16] < 1.03, avars
    assert 0.97 < avars[16], avars


def test_reverse_triple_is_group_inverse():
    """signature(path) ⊗ signature(reversed path) = identity: Chen-compose
    the forward (W, A, J3) with reverse_triple's output; levels 1–3 vanish."""
    key = jax.random.key(9)
    m, batch = 2, 128
    w = jax.random.normal(jax.random.key(10), (batch, m), jnp.float64) * np.sqrt(H)
    h_levy = jax.random.normal(jax.random.key(11), (batch, m), jnp.float64) * np.sqrt(H / 12)
    a_f, j3_f = fourier_triple(key, 0.0, H, w, h_levy, n_terms=4)
    a_r, j3_r = reverse_triple(w, a_f, j3_f)
    w_r = -w

    def s2(w_, a_):
        return 0.5 * w_[..., :, None] * w_[..., None, :] + a_

    s2_f, s2_r = s2(w, a_f), s2(w_r, a_r)
    lvl1 = w + w_r
    lvl2 = s2_f + w[..., :, None] * w_r[..., None, :] + s2_r
    lvl3 = (j3_f
            + s2_f[..., :, :, None] * w_r[..., None, None, :]
            + w[..., :, None, None] * s2_r[..., None, :, :]
            + j3_r)
    np.testing.assert_allclose(np.asarray(lvl1), 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(lvl2), 0.0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(lvl3), 0.0, atol=1e-13)


def test_interval_api_contract():
    """return_J3: happy-path shapes; davie mode raises; partial flags raise;
    Antithetic negates J3 (odd degree); Reverse returns the group inverse."""
    bm = BrownianInterval(0.0, H, size=(8, 2), key=jax.random.key(1),
                          dtype=jnp.float64,
                          levy_area_approximation="fourier",
                          levy_fourier_terms=4)
    w, u, a, j3 = bm(0.0, H, return_U=True, return_A=True, return_J3=True)
    assert w.shape == (8, 2) and a.shape == (8, 2, 2) and j3.shape == (8, 2, 2, 2)

    with pytest.raises(ValueError, match="return_U"):
        bm(0.0, H, return_J3=True)

    bm_davie = BrownianInterval(0.0, H, size=(8, 2), key=jax.random.key(1),
                                dtype=jnp.float64,
                                levy_area_approximation="davie")
    with pytest.raises(ValueError, match="fourier"):
        bm_davie(0.0, H, return_U=True, return_A=True, return_J3=True)

    anti = AntitheticBrownian(bm)
    wa, ua, aa, j3a = anti(0.0, H, return_U=True, return_A=True,
                           return_J3=True)
    np.testing.assert_allclose(np.asarray(wa), -np.asarray(w), atol=0)
    np.testing.assert_allclose(np.asarray(j3a), -np.asarray(j3), atol=0)
    np.testing.assert_allclose(np.asarray(aa), np.asarray(a), atol=0)

    rev = ReverseBrownian(bm)
    wr, ur, ar, j3r = rev(-H, 0.0, return_U=True, return_A=True,
                          return_J3=True)
    a_exp, j3_exp = reverse_triple(w, a, j3)
    np.testing.assert_allclose(np.asarray(wr), -np.asarray(w), atol=1e-14)
    np.testing.assert_allclose(np.asarray(ar), np.asarray(a_exp), atol=1e-14)
    np.testing.assert_allclose(np.asarray(j3r), np.asarray(j3_exp), atol=1e-14)
