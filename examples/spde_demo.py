"""Stochastic heat equation — stiff SPDE via drift-implicit Euler–Maruyama.

    du = nu * u_xx dt + sigma dW(t, x),   u(0) = u(1) = 0  (Dirichlet)

Finite differences on D interior points make this a D-dimensional additive-
noise SDE whose drift Jacobian has eigenvalues down to ~ -4 nu D^2: the
explicit-EM stability bound is dt < h_x^2 / (2 nu) while the physics moves
on an O(1) clock — the textbook stiff-SDE regime. `implicit_em` (stochastic
theta method, theta=1) steps at the PHYSICS scale; its Newton solve is
matrix-free (GMRES on the jvp) so nothing D x D is ever materialized, and
the whole march is one `lax.scan` on device.

Checks printed (space-time white noise, sigma constant):
- explicit EM at the same dt blows up (max |u| overflows),
- the implicit march stays bounded and its equilibrium spatial covariance
  tracks the exact stationary law  Cov = sigma^2/2 * (-L)^{-1}  (for the
  discrete Laplacian L: a closed form via the DST eigenbasis) — compared
  mode-by-mode for the 5 slowest modes,
- step count: dt_implicit / dt_explicit-limit speedup factor.

No reference counterpart (its sdeint is broken explicit EM and nothing in
`example/` touches SPDEs). Run: python examples/spde_demo.py [--d 256]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from paddlexde_tpu import BrownianInterval, sdeint

NU, SIGMA, T1 = 0.05, 1.0, 4.0


def laplacian(u, hx):
    upad = jnp.pad(u, ((0, 0), (1, 1)))  # Dirichlet walls
    return (upad[:, 2:] - 2 * u + upad[:, :-2]) / hx**2


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--paths", type=int, default=64)
    ap.add_argument("--dt", type=float, default=0.02)
    args = ap.parse_args(argv)
    d, hx = args.d, 1.0 / (args.d + 1)

    # space-time white noise, discretized: dW_i / sqrt(hx) per cell
    f = lambda t, u: NU * laplacian(u, hx)
    g = lambda t, u: (SIGMA / np.sqrt(hx)) * jnp.ones_like(u)

    nstep = int(T1 / args.dt) + 1
    ts = jnp.linspace(0.0, T1, nstep)
    bm = BrownianInterval(0.0, T1, size=(args.paths, d),
                          key=jax.random.key(0))
    u0 = jnp.zeros((args.paths, d))

    dt_explicit_limit = hx**2 / (2 * NU)
    print(f"D={d}: stiffness |lambda_max| ~ {4*NU/(hx**2):.0f}; explicit-EM "
          f"stability needs dt < {dt_explicit_limit:.2e}; stepping at "
          f"dt={args.dt} ({args.dt/dt_explicit_limit:.0f}x past the limit)")

    u_exp = sdeint(f, g, u0, ts[: min(nstep, 9)], "euler", bm=bm, time_axis=0)
    print(f"explicit EM after {min(nstep, 9)-1} steps: max|u| = "
          f"{float(jnp.max(jnp.abs(u_exp[-1]))):.3e}  (diverging)")

    u = sdeint(f, g, u0, ts, "implicit_em", bm=bm, time_axis=0)
    print(f"implicit_em after {nstep-1} steps:  max|u| = "
          f"{float(jnp.max(jnp.abs(u[-1]))):.3f}  (bounded)")

    # stationary spatial law: Cov = sigma^2/2 (-L)^{-1}; in the DST basis the
    # k-th mode variance is sigma^2 / (2 nu mu_k), mu_k = (2-2cos(k pi hx))/hx^2
    # (exact for the DISCRETE operator). The implicit chain at finite dt is
    # slightly underdispersed: a' = (a + eta)/(1+c) with c = nu mu dt has
    # stationary V = q/(c(2+c)) = V_cont/(1 + c/2) — fold the exact chain
    # law in so the comparison isolates sampling noise, not the dt bias.
    x = np.arange(1, d + 1) * hx
    modes = np.stack([np.sin(k * np.pi * x) * np.sqrt(2 * hx)
                      for k in range(1, 6)])
    # use the SECOND half of the trajectory (t >= 2 >> relaxation of slow
    # modes ~ 1/(nu mu_1) ~ 2) pooled over paths
    tail = np.asarray(u[nstep // 2:])  # [T2, P, D]
    coeffs = np.einsum("kd,tpd->ktp", modes, tail) / np.sqrt(hx) * hx
    got = coeffs.reshape(5, -1).var(axis=1)
    mu = (2 - 2 * np.cos(np.arange(1, 6) * np.pi * hx)) / hx**2
    theory = SIGMA**2 / (2 * NU * mu)
    chain = theory / (1 + 0.5 * NU * mu * args.dt)  # exact finite-dt chain law
    print("mode variances (slowest 5):")
    for k in range(5):
        print(f"  k={k+1}: measured {got[k]:.4f}  chain-exact {chain[k]:.4f}"
              f"  continuum {theory[k]:.4f}")
    rel = np.abs(got - chain) / chain
    print(f"max rel deviation vs chain-exact law: {rel.max():.3f}")

    # --- the stiff-additive ladder at the same big dt (round 3) ---------
    # implicit_em (strong 1.0-additive) -> implicit_sra1 (1.5, L-stable
    # SDIRK2 core) -> implicit_foster2 (~2.0, SDIRK4 on the cubic path).
    # Path error vs a FINE implicit_foster2 reference on the SAME tree.
    d2 = min(d, 64)
    hx2 = 1.0 / (d2 + 1)
    f2 = lambda t, u: NU * laplacian(u, hx2)
    g2 = lambda t, u: (SIGMA / np.sqrt(hx2)) * jnp.ones_like(u)
    t_end, dt2 = 1.0, 0.05
    n2 = int(t_end / dt2) + 1
    ts2 = jnp.linspace(0.0, t_end, n2)

    def bm2():
        return BrownianInterval(0.0, t_end, size=(32, d2),
                                key=jax.random.key(7),
                                levy_area_approximation="space-time-time")

    u02 = jnp.zeros((32, d2))
    ts_ref = jnp.linspace(0.0, t_end, (n2 - 1) * 8 + 1)
    ref = sdeint(f2, g2, u02, ts_ref, "implicit_foster2", bm=bm2(),
                 time_axis=0)[-1]
    print(f"\nstiff-additive ladder at dt={dt2} "
          f"({dt2/(hx2**2/(2*NU)):.0f}x past the explicit limit, D={d2}; "
          f"error vs a dt/8 reference on the same noise):")
    errs = {}
    for scheme in ("implicit_em", "implicit_sra1", "implicit_sra1_damped",
                   "implicit_foster2"):
        sol = sdeint(f2, g2, u02, ts2, scheme, bm=bm2(), time_axis=0)
        errs[scheme] = float(jnp.mean(jnp.abs(sol[-1] - ref)))
        print(f"  {scheme:22s} mean|err| = {errs[scheme]:.2e}")
    # Honest reading (measured): implicit_foster2 wins outright — its
    # SDIRK4-on-the-cubic-path step keeps a near-exact noise response at
    # ANY lambda*dt. implicit_sra1's strong-1.5 advantage is an h->0
    # statement: at lambda*dt ~ 40 on the FAST modes its noise-in-stage
    # response OVERdisperses (the same 6x-at-theta*h=10 stationary
    # overshoot the unit test pins), so on white-in-space noise it can
    # trail even implicit_em, whose theta=1 step underdisperses (damps)
    # fast modes. implicit_sra1_damped (round 4) closes exactly that gap:
    # its stiffly-accurate step passes ALL noise through the damped stages
    # (stationary overshoot bounded at +16% at every theta*h), so it beats
    # implicit_sra1 here while keeping the same strong ~1.9 in the smooth
    # regime. For strongly stiff SPDEs prefer implicit_foster2 (best
    # stationary law) or implicit_sra1_damped (single SDIRK2-core step,
    # never overdisperses); implicit_em when only boundedness matters.
    assert errs["implicit_foster2"] < errs["implicit_em"]
    assert errs["implicit_foster2"] < errs["implicit_sra1"]
    # The damped-vs-plain ordering is what the unit tests pin (stationary
    # m2 +16% vs ~6x at theta*h=10); here it's a single-seed stochastic
    # comparison, so warn rather than hard-fail on a seed flip (ADVICE r4).
    if not errs["implicit_sra1_damped"] < errs["implicit_sra1"]:
        import warnings

        warnings.warn(
            "implicit_sra1_damped did not beat implicit_sra1 on this seed "
            f"({errs['implicit_sra1_damped']:.3g} vs "
            f"{errs['implicit_sra1']:.3g}); the ordering is pinned by "
            "tests/functional/test_sdeint_implicit.py on closed-form "
            "stationary moments", stacklevel=2)
    return float(rel.max())


if __name__ == "__main__":
    main()
