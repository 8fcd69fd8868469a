"""Measure the WEAK convergence order of the implicit additive SDE rungs.

VERDICT r4 next-step 4: six registry rows shipped with ``weak_order=None``
("—(pass order=)" in PARITY): ``implicit_sra1[_damped][_general]`` and
``implicit_foster2[_general]``. This tool measures them with the repo's
coupled-estimator discipline (CLAUDE.md: plain MC noise swamps h² at
practical N — weak order must come from COUPLED estimators):

- **oracle**: Ornstein–Uhlenbeck with TIME-DEPENDENT additive noise
  (``dy = A y dt + G(t) dW``). Mean is ``expm(AT) y0`` exactly; the second
  moment solves the Lyapunov ODE ``dV/dt = AV + VAᵀ + GGᵀ`` — integrated
  here by the repo's own ``odeint(..., "dopri5")`` at rtol 1e-12 (a
  deterministic moment-ODE oracle, no MC noise). Time-dependent G is
  deliberate: constant-g tests cannot see a misplaced noise-stage weight
  (the sra1 g(t1)-vs-g(t0) regression, CLAUDE.md solver notes).
- **estimator**: for each resolution pair (n, 2n) on ONE Brownian tree,
  the pathwise difference ``D_φ(n) = mean[φ(y_T^{(n)}) − φ(y_T^{(2n)})]``.
  Both solves consume the SAME tree intervals (W/U/K chain exactly across
  bisection for additive schemes — no cross-resolution Lévy-area caveat,
  which only bites order>1 MATRIX-noise claims), so Var(D) ~ strong-err²
  and the weak bias slope is measurable far below the plain-MC floor.
  If the weak error is C·hᵖ + o(hᵖ), then D(n) = C·hᵖ(1 − 2⁻ᵖ) + o(hᵖ) and
  ``p̂ = log2(D(n)/D(2n))``.
- **consistency check**: the telescoped sum Σ D(n) must reproduce
  E[φ(y^(coarsest))] − E[φ(y^(finest))], and the finest estimate must sit
  within a few stderr of the exact oracle value (validates both the oracle
  and the coupling).

φ ranges over the states' first and second moments (the weak order is the
min over smooth test functions; for linear-affine systems polynomials of
degree ≤ 2 are the binding class — E[φ(y)] for any smooth φ is determined
by the Gaussian law, i.e. by (mean, covariance)).

Run: ``JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/measure_weak_orders.py``
Reference match: exceeds /root/reference/paddlexde/functional/sdeint.py:9-37
(the reference has no weak-order machinery at all).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def _require_x64():
    """Enable f64 for the measurement runtime.

    Called from main()/measure(), NOT at import: a module-level
    ``jax.config.update("jax_enable_x64", True)`` here fired during PYTEST
    COLLECTION of the on-chip suite (test_weak_order_implicit imports this
    module) and flipped x64 on for the whole TPU-mode session — under which
    Mosaic's _convert_element_type lowering helper infinitely recurses on
    the int64 converts x64 introduces (jax lowering.py _convert_helper
    re-emits the same unsupported cast). Every on-chip kernel test then
    died with RecursionError while single-file runs passed; two rounds of
    recursion-limit raises were chasing this exact import-time side effect.
    Import-time global config mutation is the bug class; never reintroduce.
    """
    jax.config.update("jax_enable_x64", True)

from paddlexde_tpu import odeint, sdeint
from paddlexde_tpu.brownian.api import BrownianInterval

Y0 = 1.3
T1 = 1.0
# module-level constants stay NUMPY so importing this file needs no jax
# config (see _require_x64); jnp converts them under the x64 runtime at use
Y02 = np.array([1.3, -0.7], np.float64)

# Two oracle regimes. "gentle" resolves the sra1 family's h^2 bias cleanly.
# The foster2 family's bias constant on the gentle oracle sits BELOW the
# coupling-noise floor even at h=1/4 (measured: |D| < se at 8k paths), so it
# gets the "stiff" regime (theta*h up to 1.5), where its m2 bias emerges —
# and decays at slope ~3.2-3.4, i.e. BETTER than the order 2.0 we register.
REGIMES = {
    "gentle": {
        "TH": 1.5,
        "A2": np.array([[-1.5, 0.8], [0.0, -0.9]], np.float64),
        "amp": 0.5,
    },
    "stiff": {
        "TH": 6.0,
        "A2": np.array([[-6.0, 1.6], [0.0, -4.0]], np.float64),
        "amp": 1.0,
    },
}


def make_problem(regime):
    p = REGIMES[regime]
    sig = lambda t: p["amp"] * (1.0 + 0.3 * jnp.sin(2.0 * t))
    g2 = lambda t: jnp.array([[1.0, 0.4], [0.0, 0.8]], jnp.float64) * sig(t)
    return p["TH"], p["A2"], sig, g2


def exact_moments_diag(TH, sig):
    m = Y0 * np.exp(-TH * T1)
    # V(T) = ∫ e^{-2θ(T-s)} σ(s)² ds by the repo's own dopri5 at 1e-12
    v = odeint(lambda t, v: -2.0 * TH * v + sig(t) ** 2,
               jnp.zeros(()), jnp.array([0.0, T1]), "dopri5",
               rtol=1e-12, atol=1e-14, time_axis=0)[-1]
    return float(m), float(v)


def exact_moments_general(A2, g2):
    from jax.scipy.linalg import expm

    m = expm(A2 * T1) @ Y02
    v = odeint(lambda t, V: A2 @ V + V @ A2.T + g2(t) @ g2(t).T,
               jnp.zeros((2, 2), jnp.float64), jnp.array([0.0, T1]),
               "dopri5", rtol=1e-12, atol=1e-14, time_axis=0)[-1]
    return np.asarray(m), np.asarray(v)


def phis_diag(y):
    # E[y], E[y²] — the full Gaussian law for scalar OU
    return jnp.stack([y, y * y], axis=0)


def phis_general(y):
    # means + the 3 distinct second moments
    return jnp.stack([y[..., 0], y[..., 1],
                      y[..., 0] ** 2, y[..., 1] ** 2,
                      y[..., 0] * y[..., 1]], axis=0)


def run_scheme(scheme, general, levy, n_list, n_paths, seed, TH, A2, sig,
               g2):
    size = (n_paths, 2) if general else (n_paths,)
    bm = BrownianInterval(0.0, T1, size=size, key=jax.random.key(seed),
                          dtype=jnp.float64,
                          levy_area_approximation=levy)
    if general:
        f = lambda t, y: y @ A2.T
        g = lambda t, y: jnp.broadcast_to(g2(t), y.shape[:-1] + (2, 2))
        y0 = jnp.broadcast_to(Y02, (n_paths, 2))
        kw = {"noise_dim": 2}
        phis = phis_general
    else:
        f = lambda t, y: -TH * y
        g = lambda t, y: sig(t) * jnp.ones_like(y)
        y0 = jnp.full((n_paths,), Y0, jnp.float64)
        kw = {}
        phis = phis_diag

    @jax.jit
    def endpoint(n_steps_ts):
        sol = sdeint(f, g, y0, n_steps_ts, scheme, bm=bm, time_axis=0, **kw)
        return phis(sol[-1])

    vals = {}
    for n in n_list:
        ts = jnp.linspace(0.0, T1, n + 1)
        vals[n] = endpoint(ts)
    return vals


def measure(scheme, general=False, levy="space-time", regime="gentle",
            n_list=(4, 8, 16, 32, 64), n_paths=16384, seed=11,
            gate_sigmas=5.0):
    _require_x64()
    TH, A2, sig, g2 = make_problem(regime)
    vals = run_scheme(scheme, general, levy, n_list, n_paths, seed, TH, A2,
                      sig, g2)
    if general:
        m, v = exact_moments_general(A2, g2)
        # v is the COVARIANCE (V(0)=0 Lyapunov); φ are raw second moments
        exact = np.array([m[0], m[1], v[0, 0] + m[0] ** 2,
                          v[1, 1] + m[1] ** 2, v[0, 1] + m[0] * m[1]])
    else:
        m, v = exact_moments_diag(TH, sig)
        exact = np.array([m, v + m * m])

    rows = []
    for a, b in zip(n_list[:-1], n_list[1:]):
        diff = np.asarray(vals[a] - vals[b])  # [n_phi, n_paths]
        d = diff.mean(axis=1)
        se = diff.std(axis=1) / np.sqrt(diff.shape[1])
        rows.append((a, d, se))

    # slope per φ between successive coupled differences, keeping only
    # resolution pairs where BOTH differences clear 5x their stderr
    orders = []
    for k in range(exact.size):
        ps = []
        for (na, da, sa), (nb, db, sb) in zip(rows[:-1], rows[1:]):
            if (abs(da[k]) > gate_sigmas * sa[k]
                    and abs(db[k]) > gate_sigmas * sb[k]):
                ps.append(np.log2(abs(da[k]) / abs(db[k])))
        orders.append(ps)

    # consistency: finest-vs-oracle gap in stderr units (plain MC floor)
    fin = np.asarray(vals[n_list[-1]])
    gap = fin.mean(axis=1) - exact
    gap_se = fin.std(axis=1) / np.sqrt(fin.shape[1])
    return {
        "scheme": scheme,
        "diffs": [
            {"n": int(a), "d": [float(x) for x in d],
             "se": [float(x) for x in s]} for a, d, s in rows
        ],
        "orders_per_phi": [[round(float(p), 3) for p in ps] for ps in orders],
        "finest_gap_sigmas": [round(float(gp / se), 2)
                              for gp, se in zip(gap, gap_se)],
    }


SCHEMES = [
    ("implicit_sra1", False, "space-time", "gentle"),
    ("implicit_sra1_damped", False, "space-time", "gentle"),
    ("implicit_foster2", False, "space-time-time", "stiff"),
    ("implicit_sra1_general", True, "space-time", "gentle"),
    ("implicit_sra1_damped_general", True, "space-time", "gentle"),
    ("implicit_foster2_general", True, "space-time-time", "stiff"),
]


def main():
    _require_x64()
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_paths", type=int, default=16384)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    out = []
    for scheme, general, levy, regime in SCHEMES:
        if args.only and args.only not in scheme:
            continue
        npth = args.n_paths * (2 if regime == "stiff" else 1)
        r = measure(scheme, general=general, levy=levy, regime=regime,
                    n_paths=npth)
        r["regime"] = regime
        out.append(r)
        print(json.dumps(r))
    # summary: min measured order per scheme across φ (weak order is a min)
    for r in out:
        flat = [p for ps in r["orders_per_phi"] for p in ps]
        print(f"# {r['scheme']}: orders {sorted(round(p, 2) for p in flat)}"
              f" | finest gap (sigmas) {r['finest_gap_sigmas']}")


if __name__ == "__main__":
    main()
