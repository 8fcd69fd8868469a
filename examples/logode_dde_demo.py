"""Rough-path and true-DDE demo: two round-3 capabilities side by side.

1. LOG-ODE for a long rough control: a neural-CDE-style linear system
   driven by a 4096-knot random walk is solved with 16 coarse windows —
   depth 1 (area-blind) vs depth 2 vs depth 3 against a fine dopri5 CDE
   oracle. The depth-2/3 windows carry the control's Lévy area / level-3
   Lie terms, so 16 fat steps replace thousands of fine ones (the trade a
   TPU wants: fewer, larger dense ops).

2. TRUE method-of-steps DDE: the delayed logistic (Hutchinson) equation
   y' = r·y(t)·(1 − y(t−1)) — oscillations exist ONLY because the delayed
   value re-enters the computed solution; the reference's fixed-history
   DDE semantics cannot produce them (both are run for contrast).

Run: python examples/logode_dde_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from paddlexde_tpu import cdeint, cdeint_logode, ddeint, ddeint_mos
from paddlexde_tpu.interpolation import LinearInterpolation


def logode_part():
    rng = np.random.default_rng(1)
    b1 = jnp.asarray([[0.0, 1.0], [0.0, 0.0]]) * 0.8
    b2 = jnp.asarray([[0.0, 0.0], [1.0, 0.0]]) * 0.8
    f = lambda t, y: jnp.stack([y @ b1.T, y @ b2.T], axis=-1)
    n_knots = 4096
    x = jnp.asarray(rng.normal(size=(n_knots + 1, 2)).cumsum(0) * 0.016)
    tx = jnp.linspace(0.0, 1.0, n_knots + 1)
    y0 = jnp.asarray([1.0, 0.5])

    # oracle: rk4 at the KNOT spacing — an adaptive solver would take steps
    # larger than a segment and alias the rough derivative
    oracle = cdeint(f, y0, jnp.array([0.0, 1.0]), LinearInterpolation(x, tx),
                    "rk4", options={"step_size": 1.0 / n_knots},
                    time_axis=0)[-1]
    print(f"fine CDE oracle over {n_knots} knots: {np.asarray(oracle)}")
    ts = jnp.linspace(0.0, 1.0, 17)
    for depth in (1, 2, 3):
        sol = cdeint_logode(f, y0, ts, (x, tx), depth=depth, substeps=8,
                            time_axis=0)
        err = float(jnp.max(jnp.abs(sol[-1] - oracle)))
        print(f"  log-ODE depth {depth}, 16 windows x 8 substeps: "
              f"err {err:.2e}")


def dde_part():
    r = 1.8  # above the Hopf threshold pi/2: sustained oscillations
    his_span = jnp.linspace(-1.0, 0.0, 5)
    his = jnp.full((5, 1), 0.5)
    y0 = jnp.array([0.5])
    ts = jnp.linspace(0.0, 30.0, 301)

    f_mos = lambda t, y, y_lags: r * y * (1.0 - y_lags[..., 0, :])
    sol = ddeint_mos(f_mos, y0, ts, [1.0], his, his_span, solver="rk4",
                     step_size=0.05, time_axis=0)
    tail = np.asarray(sol[200:, 0])
    print(f"\ndelayed logistic (true DDE, r={r}): tail min/max = "
          f"{tail.min():.3f} / {tail.max():.3f}  (sustained oscillation)")

    def f_ref(y_lags, y):
        return r * y * (1.0 - y_lags[..., 0:1, :])

    ts_short = jnp.linspace(0.0, 8.0, 81)
    sol_ref, _ = ddeint(f_ref, jnp.full((1, 1, 1), 0.5), ts_short,
                        jnp.array([1.0]), jnp.full((1, 5, 1), 0.5),
                        his_span, solver="rk4")
    traj = np.asarray(sol_ref[0, 0, :, 0])
    print(f"fixed-history semantics (reference design, t<=8): monotone "
          f"exponential {traj[0]:.2f} -> {traj[-1]:.1f} — the delayed brake "
          f"never sees the computed solution, so no oscillation can exist")


if __name__ == "__main__":
    logode_part()
    dde_part()
