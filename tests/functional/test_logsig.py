"""Log-signature CDE machinery (``functional/logsig.py``).

The reference's CDE is vaporware (``paddlexde/xde/base_cde.py:20-35``); this
pins the torchcde-parity extension: closed-form depth-2 log-signatures of
piecewise-linear controls, the windowing data transform, and the explicit
log-ODE solver with autodiff Lie brackets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paddlexde_tpu as pxt
from paddlexde_tpu.interpolation.interpolate import LinearInterpolation


def _random_path(n, c, key=0, scale=0.1):
    rng = np.random.default_rng(key)
    return jnp.asarray(rng.normal(size=(n, c)).cumsum(0) * scale)


def test_piecewise_logsignature_matches_brute_force():
    """The cumsum cross-product area equals a fine Riemann–Stieltjes
    integral of the linear path (exactness, not approximation)."""
    knots = _random_path(9, 3, key=0, scale=1.0)
    inc, area = pxt.piecewise_logsignature(knots)
    np.testing.assert_allclose(np.asarray(inc),
                               np.asarray(knots[-1] - knots[0]), atol=1e-14)
    tt = np.linspace(0, 8, 8 * 2000 + 1)
    fine = np.stack(
        [np.interp(tt, np.arange(9), np.asarray(knots)[:, c]) for c in range(3)],
        -1,
    )
    d = np.diff(fine, axis=0)
    pref = fine[:-1] - fine[0]
    cross = pref.T @ d
    bf = 0.5 * (cross - cross.T)
    np.testing.assert_allclose(np.asarray(area), bf, atol=1e-12)
    # batched leading axes work
    inc_b, area_b = pxt.piecewise_logsignature(
        jnp.stack([knots, 2.0 * knots]))
    np.testing.assert_allclose(np.asarray(inc_b[1]), 2 * np.asarray(inc),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(area_b[1]), 4 * bf, atol=1e-12)


def test_logsignature_windows_chen_consistency():
    """Window increments telescope (level 1) and the windowed areas +
    increment cross terms reassemble the whole-path area (Chen's relation)
    — the transform loses exactly the within-window fine structure and
    nothing else."""
    x = _random_path(33, 2, key=1)
    t = jnp.linspace(0.0, 1.0, 33)
    ls, tw = pxt.logsignature_windows(x, t, knots_per_window=8)
    assert ls.shape == (5, 3) and tw.shape == (5,)
    # level 1: cumulative increments hit the endpoints of each window
    np.testing.assert_allclose(np.asarray(ls[-1, :2]),
                               np.asarray(x[-1] - x[0]), atol=1e-13)
    # Chen: total area = sum of window areas + cross term of increments
    _, area_total = pxt.piecewise_logsignature(x)
    incs = jnp.diff(ls[:, :2], axis=0)  # per-window increments
    areas = jnp.diff(ls[:, 2], axis=0)  # per-window vec-area (C=2: one)
    prefix = jnp.cumsum(incs, axis=0) - incs
    cross = jnp.einsum("si,sj->ij", prefix, incs)
    reassembled = jnp.sum(areas) + 0.5 * (cross[0, 1] - cross[1, 0])
    np.testing.assert_allclose(float(reassembled),
                               float(area_total[0, 1]), atol=1e-13)
    with pytest.raises(ValueError, match="exactly one"):
        pxt.logsignature_windows(x, t)


def test_logode_commuting_fields_depth1_exact():
    """Commuting (diagonal) linear fields: the flow only sees the total
    increment — ONE coarse window reproduces the matrix-exponential closed
    form, and the depth-2 bracket term vanishes identically."""
    b1 = jnp.asarray([[0.2, 0.0], [0.0, -0.3]])
    b2 = jnp.asarray([[0.1, 0.0], [0.0, 0.4]])
    f = lambda t, y: jnp.stack([y @ b1.T, y @ b2.T], axis=-1)
    x = _random_path(33, 2, key=2, scale=0.2)
    tx = jnp.linspace(0.0, 1.0, 33)
    y0 = jnp.asarray([1.0, 0.5])
    from jax.scipy.linalg import expm

    dx = x[-1] - x[0]
    exact = expm(b1 * dx[0] + b2 * dx[1]) @ y0
    for depth in (1, 2):
        sol = pxt.cdeint_logode(f, y0, jnp.linspace(0.0, 1.0, 3), (x, tx),
                                depth=depth, substeps=16, time_axis=0)
        assert float(jnp.max(jnp.abs(sol[-1] - exact))) < 1e-8


def test_logode_noncommuting_depth2_beats_depth1():
    """NON-commuting fields on a rough control: depth 1 sits on the
    area-loss floor (it cannot converge until windows resolve single
    segments) while depth 2 converges — measured 24x better at 32 windows
    vs a tight-tolerance fine cdeint oracle."""
    b1 = jnp.asarray([[0.0, 1.0], [0.0, 0.0]]) * 0.8
    b2 = jnp.asarray([[0.0, 0.0], [1.0, 0.0]]) * 0.8
    f = lambda t, y: jnp.stack([y @ b1.T, y @ b2.T], axis=-1)
    x = _random_path(257, 2, key=1)
    tx = jnp.linspace(0.0, 1.0, 257)
    y0 = jnp.asarray([1.0, 0.5])
    oracle = pxt.cdeint(f, y0, jnp.array([0.0, 1.0]),
                        LinearInterpolation(x, tx), "dopri5",
                        rtol=1e-11, atol=1e-13, time_axis=0)[-1]

    def err(depth, n_win):
        ts = jnp.linspace(0.0, 1.0, n_win + 1)
        sol = pxt.cdeint_logode(f, y0, ts, (x, tx), depth=depth, substeps=8,
                                time_axis=0)
        return float(jnp.max(jnp.abs(sol[-1] - oracle)))

    e2_8, e2_32 = err(2, 8), err(2, 32)
    e1_32 = err(1, 32)
    assert e2_32 < e2_8 / 3, (e2_8, e2_32)  # depth 2 converges
    assert e2_32 < e1_32 / 10, (e2_32, e1_32)  # depth 1 is area-blind
    assert e1_32 > 0.05, e1_32  # ...and measurably so


def test_logode_equals_cde_on_logsig_channels():
    """The data-transform route is the same math: cdeint over the
    logsignature_windows series with the Lie-extended vector field on the
    logsig channels == cdeint_logode with matched substeps (both integrate
    the identical autonomous field per window). Euler on both sides: a
    multi-stage solver's END-of-step stage lands exactly on window
    boundaries, where the linear interpolation's derivative resolves to
    the NEXT window's slope — an O(h) stage inconsistency that would blur
    the identity (measured 1e-2 with rk4 at 4 steps/window)."""
    b1 = jnp.asarray([[0.0, 1.0], [0.0, 0.0]]) * 0.8
    b2 = jnp.asarray([[0.0, 0.0], [1.0, 0.0]]) * 0.8
    br = b2 @ b1 - b1 @ b2  # [f1, f2] for linear fields f_i = B_i y
    f = lambda t, y: jnp.stack([y @ b1.T, y @ b2.T], axis=-1)
    x = _random_path(65, 2, key=3)
    tx = jnp.linspace(0.0, 1.0, 65)
    y0 = jnp.asarray([1.0, 0.5])
    n_win = 8
    ts = jnp.linspace(0.0, 1.0, n_win + 1)
    sol_logode = pxt.cdeint_logode(f, y0, ts, (x, tx), depth=2, substeps=16,
                                   solver="euler", time_axis=0)
    ls, tw = pxt.logsignature_windows(x, tx, knots_per_window=8)
    f_hat = lambda t, y: jnp.stack(
        [y @ b1.T, y @ b2.T, y @ br.T], axis=-1
    )
    sol_cde = pxt.cdeint(f_hat, y0, ts, LinearInterpolation(ls, tw), "euler",
                         options={"step_size": float(ts[1] - ts[0]) / 16},
                         time_axis=0)
    np.testing.assert_allclose(np.asarray(sol_logode), np.asarray(sol_cde),
                               rtol=1e-9, atol=1e-11)


def test_logode_grads_and_guards():
    b1 = jnp.asarray([[0.0, 1.0], [0.0, 0.0]]) * 0.5
    b2 = jnp.asarray([[0.0, 0.0], [1.0, 0.0]]) * 0.5
    x = _random_path(33, 2, key=4)
    tx = jnp.linspace(0.0, 1.0, 33)
    y0 = jnp.asarray([1.0, 0.5])
    ts = jnp.linspace(0.0, 1.0, 5)

    def loss(params):
        f = lambda t, y: jnp.stack(
            [y @ params["b1"].T, y @ params["b2"].T], axis=-1
        )
        return jnp.sum(
            pxt.cdeint_logode(f, y0, ts, (x, tx), depth=2, substeps=4,
                              time_axis=0)[-1]
        )

    p0 = {"b1": b1, "b2": b2}
    g = jax.grad(loss)(p0)
    # FD check on one entry
    eps = 1e-6
    pp = {"b1": b1.at[0, 1].add(eps), "b2": b2}
    pm = {"b1": b1.at[0, 1].add(-eps), "b2": b2}
    fd = (loss(pp) - loss(pm)) / (2 * eps)
    np.testing.assert_allclose(float(g["b1"][0, 1]), float(fd), rtol=1e-5)

    with pytest.raises(ValueError, match="depth"):
        pxt.cdeint_logode(lambda t, y: y[..., None], y0, ts, (x, tx), depth=4)


def test_signature3_identities_and_brute_force():
    """Depth-3 closed form: level-3 shuffle identity machine-exact, the
    log's level-3 component is a genuine Lie element (symmetrizes to zero),
    ℓ2 matches the depth-2 area, and a midpoint-quadrature brute force
    converges to S3 (2.1e-7 at 2000 samples/segment — its own O(1/n²))."""
    from paddlexde_tpu.functional.logsig import (
        piecewise_logsignature3, piecewise_signature3)

    knots = _random_path(9, 3, key=0, scale=1.0)
    s1, s2, s3 = piecewise_signature3(knots)
    np.testing.assert_allclose(np.asarray(s2 + s2.T),
                               np.asarray(jnp.outer(s1, s1)), atol=1e-12)
    lhs = jnp.einsum("i,jk->ijk", s1, s2)
    rhs = s3 + jnp.transpose(s3, (1, 0, 2)) + jnp.transpose(s3, (2, 0, 1))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-13)

    l1, l2, l3 = piecewise_logsignature3(knots)
    _, area = pxt.piecewise_logsignature(knots)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(area), atol=1e-13)
    perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]
    sym = sum(jnp.transpose(l3, p) for p in perms)
    assert float(jnp.max(jnp.abs(sym))) < 1e-13

    n = 2000
    tt = np.linspace(0, 8, 8 * n + 1)
    fine = np.stack(
        [np.interp(tt, np.arange(9), np.asarray(knots)[:, c]) for c in range(3)],
        -1,
    )
    d = np.diff(fine, axis=0)
    s1f = np.cumsum(d, 0)
    p1m = np.vstack([np.zeros(3), s1f[:-1]]) + 0.5 * d
    s2f = np.cumsum(p1m[:, :, None] * d[:, None, :], 0)
    p2m = (np.vstack([np.zeros((1, 3, 3)), s2f[:-1]])
           + 0.5 * (p1m[:, :, None] * d[:, None, :]))
    s3f = np.sum(p2m[:, :, :, None] * d[:, None, None, :], 0)
    assert np.abs(np.asarray(s3) - s3f).max() < 1e-5


def test_logode_depth3_expm_identity():
    """For linear fields f_i = B_i·y the depth-3 flow must equal
    expm(Σℓ1·B + ½Σℓ2·[f,f] + ⅓Σℓ3·[f,[f,f]]) — pins every bracket sign
    and the Dynkin 1/3 exactly (measured 3.3e-11)."""
    rng = np.random.default_rng(2)
    bs = [jnp.asarray(rng.normal(size=(3, 3)) * 0.4) for _ in range(3)]
    f = lambda t, y: jnp.stack([y @ b.T for b in bs], axis=-1)
    x = jnp.asarray(rng.normal(size=(17, 3)).cumsum(0) * 0.3)
    tx = jnp.linspace(0.0, 1.0, 17)
    y0 = jnp.asarray([1.0, 0.5, -0.3])
    from paddlexde_tpu.functional.logsig import piecewise_logsignature3

    l1, l2, l3 = piecewise_logsignature3(x)

    def vb(i, j):  # [f_i, f_j] for linear fields: (B_j B_i − B_i B_j)·y
        return bs[j] @ bs[i] - bs[i] @ bs[j]

    m = sum(float(l1[i]) * bs[i] for i in range(3))
    m = m + 0.5 * sum(float(l2[i, j]) * vb(i, j)
                      for i in range(3) for j in range(3))
    m = m + sum(float(l3[i, j, k]) * (vb(j, k) @ bs[i] - bs[i] @ vb(j, k))
                for i in range(3) for j in range(3) for k in range(3)) / 3.0
    from jax.scipy.linalg import expm

    expected = expm(m) @ y0
    sol = pxt.cdeint_logode(f, y0, jnp.array([0.0, 1.0]), (x, tx), depth=3,
                            substeps=256, time_axis=0)
    np.testing.assert_allclose(np.asarray(sol[-1]), np.asarray(expected),
                               atol=1e-9)


def test_logode_depth3_beats_depth2():
    """Smooth non-commuting control: measured d1≈2.6e-2, d2≈1.3e-4,
    d3≈6.6e-5 at 16 windows — each depth strictly better."""
    b1 = jnp.asarray([[0.0, 1.0], [0.0, 0.0]]) * 0.8
    b2 = jnp.asarray([[0.0, 0.0], [1.0, 0.0]]) * 0.8
    f = lambda t, y: jnp.stack([y @ b1.T, y @ b2.T], axis=-1)
    tx = jnp.linspace(0.0, 1.0, 513)
    x = jnp.stack([jnp.sin(7.0 * tx) + tx, jnp.cos(5.0 * tx) - 0.5 * tx], -1)
    y0 = jnp.asarray([1.0, 0.5])
    oracle = pxt.cdeint(f, y0, jnp.array([0.0, 1.0]),
                        LinearInterpolation(x, tx), "dopri5",
                        rtol=1e-12, atol=1e-14, time_axis=0)[-1]

    def err(depth, n_win):
        ts = jnp.linspace(0.0, 1.0, n_win + 1)
        sol = pxt.cdeint_logode(f, y0, ts, (x, tx), depth=depth, substeps=16,
                                time_axis=0)
        return float(jnp.max(jnp.abs(sol[-1] - oracle)))

    e1, e2, e3 = err(1, 16), err(2, 16), err(3, 16)
    assert e3 < e2 < e1 / 10, (e1, e2, e3)
    assert err(3, 8) > e3  # still converging in the window count
