"""Weak-scheme demo: Monte-Carlo option pricing with Platen's weak2.

No reference counterpart (the reference's sdeint is broken Euler–Maruyama,
``paddlexde/functional/sdeint.py:9-37``, and it ships no weak schemes): this
demo shows the use case weak schemes exist for — estimating EXPECTATIONS,
where pathwise (strong) accuracy is wasted effort. A European call under
Black–Scholes has the closed-form price; the demo prices it by MC with
Euler–Maruyama and with ``solver="weak2"`` at the same step count and prints
the discretization bias of each (the MC noise is shared: same Brownian tree).

weak2 is weak order 2.0, so its bias shrinks ~16x when steps go 4x — EM's
only ~4x. At coarse steps weak2's bias is already below the MC noise floor,
i.e. the step budget can be cut ~N^(1/2)x for the same total error.

Run: python examples/sde_weak_demo.py [--paths 131072] [--steps 8]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from paddlexde_tpu import BrownianInterval, sdeint, sdeint_weak_mc


def black_scholes_call(s0, k, r, sigma, t):
    d1 = (math.log(s0 / k) + (r + 0.5 * sigma**2) * t) / (sigma * math.sqrt(t))
    d2 = d1 - sigma * math.sqrt(t)
    n = lambda x: 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
    return s0 * n(d1) - k * math.exp(-r * t) * n(d2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--paths", type=int, default=1 << 17)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--key", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="run on CPU in f64 (this box's sitecustomize ignores "
                        "JAX_PLATFORMS; in-process config works)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    s0, k, r, sigma, t1 = 100.0, 105.0, 0.05, 0.3, 1.0
    exact = black_scholes_call(s0, k, r, sigma, t1)

    bm = BrownianInterval(0.0, t1, size=(args.paths,),
                          key=jax.random.key(args.key), dtype=dtype)
    y0 = jnp.full((args.paths,), s0, dtype)
    drift = lambda t, y: r * y
    diffusion = lambda t, y: sigma * y
    disc = math.exp(-r * t1)

    # per-path exact terminal (same tree) isolates the discretization bias
    # from the shared MC noise
    s_exact = y0 * jnp.exp((r - 0.5 * sigma**2) * t1 + sigma * bm(0.0, t1))
    payoff = lambda s: disc * jnp.maximum(s - k, 0.0)
    mc_exact = float(jnp.mean(payoff(s_exact)))

    print(f"Black-Scholes closed form : {exact:.4f}")
    print(f"MC on exact paths         : {mc_exact:.4f}  "
          f"(MC noise ~{float(jnp.std(payoff(s_exact))) / args.paths**0.5:.4f})")
    for steps in (args.steps, 4 * args.steps):
        ts = jnp.linspace(0.0, t1, steps + 1)
        for solver in ("euler", "weak2"):
            s_t = sdeint(drift, diffusion, y0, ts, solver, bm=bm,
                         time_axis=0)[-1]
            price = float(jnp.mean(payoff(s_t)))
            print(f"{solver:>6} {steps:3d} steps: price {price:.4f}  "
                  f"discretization bias {price - mc_exact:+.5f}")

    # Talay-Tubaro Richardson extrapolation: one call runs the h and h/2
    # grids on the SAME paths and combines per path (weak order p+1)
    est = sdeint_weak_mc(
        drift, diffusion, jnp.asarray(s0, dtype), t1, payoff,
        solver="euler", n_paths=args.paths, n_steps=args.steps, bm=bm,
    )
    print(f" euler {args.steps:3d} steps + Richardson: price "
          f"{float(est.mean):.4f}  bias {float(est.mean) - mc_exact:+.5f}  "
          f"(stderr {float(est.stderr):.4f})")


if __name__ == "__main__":
    main()
