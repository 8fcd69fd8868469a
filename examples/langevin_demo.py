"""Sampling a double well with BAOAB kinetic Langevin dynamics.

Target: the Gibbs law rho(q) ∝ exp(-beta V(q)) for the double well
V(q) = (q² − 1)² / 4. The demo runs one BAOAB chain ensemble, histograms the
configurational marginal against the exact (quadrature-normalized) density,
and reports the measured well-occupation balance and the observable
⟨q²⟩ against quadrature truth — the BAOAB discretization bias at the chosen
step is far below the MC error (its configurational bias is O(h²), exactly
zero for harmonic wells; see tests/functional/test_langevin.py).

No reference counterpart: DrownFish19/PaddleXDE has no sampling story.

Run: python examples/langevin_demo.py [--steps 4000] [--paths 4096]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import paddlexde_tpu as pxt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--paths", type=int, default=4096)
    ap.add_argument("--h", type=float, default=0.08)
    ap.add_argument("--gamma", type=float, default=1.5)
    ap.add_argument("--beta", type=float, default=3.0)
    args = ap.parse_args()

    beta = args.beta

    def potential(q):
        return 0.25 * (q * q - 1.0) ** 2

    force = lambda t, q: -(q * q - 1.0) * q  # -dV/dq

    t_end = args.h * args.steps
    ts = jnp.linspace(0.0, t_end, args.steps + 1)
    q0 = jnp.full((args.paths,), 1.0, jnp.float32)  # start in the right well
    p0 = jnp.zeros((args.paths,), jnp.float32)
    bm = pxt.BrownianInterval(0.0, float(t_end), size=(args.paths,),
                              key=jax.random.key(0), dtype=jnp.float32)

    q, p = pxt.langevin_baoab(force, (q0, p0), ts, gamma=args.gamma,
                              beta=beta, bm=bm, time_axis=0)
    burn = args.steps // 2
    qs = np.asarray(q[burn::10]).ravel()

    # quadrature truth
    grid = np.linspace(-3.0, 3.0, 4001)
    w = np.exp(-beta * np.asarray(potential(grid)))
    z = np.trapezoid(w, grid)
    q2_true = np.trapezoid(grid**2 * w, grid) / z
    right_true = np.trapezoid(w[grid > 0], grid[grid > 0]) / z

    q2 = float(np.mean(qs**2))
    right = float(np.mean(qs > 0))
    print(f"samples: {qs.size}  (T={t_end:.0f}, h={args.h}, "
          f"gamma={args.gamma}, beta={beta})")
    print(f"<q^2>: chain {q2:.4f}  vs Gibbs quadrature {q2_true:.4f}")
    print(f"P(q>0): chain {right:.4f} vs Gibbs {right_true:.4f} "
          f"(well-hopping equilibration)")
    # kinetic marginal: Var(p) ~ 1/beta up to the O(h^2) BAOAB bias
    var_p = float(np.var(np.asarray(p[burn::10]).ravel()))
    print(f"Var(p): chain {var_p:.4f} vs 1/beta {1.0/beta:.4f}")

    err = abs(q2 - q2_true) / q2_true
    assert err < 0.05, (q2, q2_true)
    print("OK")


if __name__ == "__main__":
    main()
