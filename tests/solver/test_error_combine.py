"""Anchored embedded-error combination (solver/adaptive.py _error_combine).

VERDICT r3 next-step 6 (sdirk4's f32 noise floor), resolved by ANALYSIS +
mechanism change rather than b̂ recalibration: the order-3 conditions pin
the error weights e = b − b̂ to a ONE-dimensional nullspace, so re-deriving
b̂ only rescales the estimator — it cannot change the cancellation
signal-to-noise of Σ e_i k_i in f32 (sdirk4's forced ±4 entries cancel O(1)
stage values to read an O(h⁴) signal). The fix: Σ e_i = 0 for EVERY
embedded pair, so Σ e_i k_i == Σ e_i (k_i − k_0) exactly — and the anchored
form only ever multiplies stage DIFFERENCES (O(h·y″)), lifting the floor by
~1/h.

MEASURED (Robertson [0,100], f32, sdirk4, CPU, 2-min sweep recorded in the
commit message): raw combine floors at rtol 3e-8 — status 4 (MAX_STEPS)
after 60k attempts, 75% rejections, solution 73% wrong; anchored runs clean
through rtol 1e-8 (status 0, relerr ~5e-5 = the f32 stage-arithmetic
saturation, estimator-independent). Here: the zero-sum identity for every
tableau, f64 estimator equivalence, a CONTROLLED numpy-f32 SNR simulation
(XLA may upcast small CPU dots, so the rounding model is exercised in
numpy), and a fast Robertson f32 end-to-end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu import odeint
from paddlexde_tpu.solver.adaptive import _combine, _error_combine
from paddlexde_tpu.solver.tableaus import TABLEAUS


@pytest.mark.parametrize("name", sorted(TABLEAUS))
def test_every_embedded_pair_sums_to_zero(name):
    # the identity the anchored form relies on: Σ(b − b̂) = 0
    c = np.asarray(TABLEAUS[name].c_error, np.float64)
    assert abs(c.sum()) < 1e-12, name


def test_anchored_equals_raw_in_f64():
    # same estimator in exact arithmetic; f64 agreement to roundoff
    rng = np.random.RandomState(0)
    for name in ("sdirk4", "dopri5"):
        tab = TABLEAUS[name]
        k = jnp.asarray(rng.randn(tab.n_stages, 7), jnp.float64)
        raw = np.asarray(_combine(k, tab.c_error, 0.37))
        anc = np.asarray(_error_combine(k, tab.c_error, 0.37))
        np.testing.assert_allclose(anc, raw, rtol=0, atol=1e-13)


def test_f32_rounding_model_numpy():
    # controlled f32 arithmetic (numpy rounds every op; XLA CPU may fuse or
    # upcast small dots, hiding the effect): smooth stages k_i = f(t+c_i h),
    # h small -> raw products cancel O(1) values, anchored products are
    # O(h). Truth in f64.
    tab = TABLEAUS["sdirk4"]
    h = 1e-3
    c_abs = np.concatenate([[0.25], np.asarray(tab.alpha)])
    rng = np.random.RandomState(1)
    phase = rng.rand(512) * 2
    k64 = np.sin(1.3 + phase[None, :] + c_abs[:, None] * h) + 2.0  # [S, N]
    e64 = np.asarray(tab.c_error, np.float64)
    k32 = k64.astype(np.float32)
    # truth = EXACT arithmetic on the f32 stage values: the estimator's job
    # is to not add noise beyond what the stages carry (their own f32
    # representation error is the solver's, not the combination's)
    truth = h * np.einsum("s,sn->n", e64, k32.astype(np.float64))
    e32 = e64.astype(np.float32)
    h32 = np.float32(h)
    # raw: sequential f32 products + sum
    raw = np.zeros(512, np.float32)
    for i in range(len(e32)):
        raw = np.float32(raw + np.float32(e32[i] * k32[i]))
    raw = np.float32(h32 * raw)
    # anchored: f32 differences first
    anc = np.zeros(512, np.float32)
    for i in range(len(e32)):
        anc = np.float32(anc + np.float32(e32[i] * np.float32(k32[i] - k32[0])))
    anc = np.float32(h32 * anc)

    err_raw = np.max(np.abs(raw.astype(np.float64) - truth))
    err_anc = np.max(np.abs(anc.astype(np.float64) - truth))
    # raw rounds products of magnitude |e||k| ~ 4*3 -> noise ~ eps*12;
    # anchored rounds |e||dk| ~ 4*h -> ~1/h smaller. Demand >=50x.
    assert err_anc * 50 < err_raw, (err_anc, err_raw)


def test_robertson_f32_sdirk4_moderate_tolerance():
    # end-to-end: the stiff classic in f32 at rtol 1e-6 converges cleanly
    # (status 0) and lands near the literature values
    def robertson(t, y):
        y1, y2, y3 = y[0], y[1], y[2]
        d1 = -0.04 * y1 + 1e4 * y2 * y3
        d3 = 3e7 * y2 * y2
        return jnp.stack([d1, -d1 - d3, d3])

    y0 = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    ts = jnp.array([0.0, 100.0], jnp.float32)
    sol, stats = odeint(
        robertson, y0, ts, "sdirk4", rtol=1e-6, atol=1e-8, time_axis=0,
        options={"return_stats": True, "max_num_steps": 2000,
                 "direct_grad": False},
    )
    assert int(stats.status) == 0
    ref = np.array([0.617235, 6.1535e-6, 0.382759])
    err = np.max(np.abs(np.asarray(sol[-1]) - ref)
                 / np.maximum(np.abs(ref), 1e-8))
    assert err < 2e-3, err
