"""Matrix-noise SDE demo: correlated two-asset GBM, fit the mixing matrix.

Capability demo for the GENERAL (matrix) noise schemes — no analogue in the
reference (its SDE surface is diagonal-only, ``paddlexde/xde/base_sde.py:55-58``
in DrownFish19/PaddleXDE):

    dS = mu (.) S dt + diag(S) L dW      (L = Cholesky factor of the asset
                                          correlation; M = 2 driving motions)

1. Simulate "market" paths with ``milstein_general`` (Davie Lévy areas).
2. Recover L from the paths by training through ``sdeint_adjoint`` with the
   same matrix-noise scheme — pathwise gradients on the replayed Brownian
   tree — matching terminal log-return covariance.

Run: python examples/sde_general_demo.py [--steps 200]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlexde_tpu import sdeint, sdeint_adjoint


def make_diffusion(l_params):
    """G(t, S) = diag(S) @ L with L lower-triangular, positive diagonal."""

    def build_l(p):
        return jnp.asarray(
            [[jax.nn.softplus(p[0]), 0.0], [p[1], jax.nn.softplus(p[2])]]
        )

    def g(t, s):
        l_mat = build_l(l_params)
        return s[..., :, None] * l_mat  # [..., D=2, M=2]

    return g, build_l


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--paths", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=0.05)
    args = ap.parse_args()

    mu = jnp.asarray([0.05, 0.03])
    l_true = np.array([[0.30, 0.0], [0.12, 0.25]], np.float32)
    ts = jnp.linspace(0.0, 1.0, 65)
    s0 = jnp.ones((args.paths, 2))

    g_true = lambda t, s: s[..., :, None] * jnp.asarray(l_true)
    market = sdeint(
        lambda t, s: mu * s, g_true, s0, ts, "milstein_general", key=42,
        noise_dim=2, time_axis=0, levy_area_approximation="davie",
    )
    log_r = jnp.log(market[-1])  # terminal log returns
    cov_target = jnp.cov(log_r.T)
    print("target log-return covariance (from L_true @ L_true^T * T):")
    print(np.asarray(cov_target).round(4))

    # --- fit L by matching the terminal covariance through the adjoint ------
    p0 = jnp.asarray([0.05, 0.0, 0.05])  # softplus-parametrized guess

    def loss_fn(p, step):
        g_fit, _ = make_diffusion(p)
        sol = sdeint_adjoint(
            lambda t, s: mu * s, g_fit, s0[:256], ts, "milstein_commutative",
            key=jax.random.fold_in(jax.random.key(7), step), noise_dim=2,
            time_axis=0,
        )
        lr_sim = jnp.log(jnp.clip(sol[-1], 1e-6))
        cov = jnp.cov(lr_sim.T)
        return jnp.sum((cov - cov_target) ** 2)

    opt = optax.adam(args.lr)
    p, opt_state = p0, opt.init(p0)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for step in range(1, args.steps + 1):
        loss, grads = grad_fn(p, step)
        updates, opt_state = opt.update(grads, opt_state)
        p = optax.apply_updates(p, updates)
        if step % 40 == 0:
            print(f"step {step:04d} | cov-mse {float(loss):.3e}")

    _, build_l = make_diffusion(p)
    l_fit = np.asarray(build_l(p))
    print("L_true:\n", l_true.round(3))
    print("L_fit:\n", l_fit.round(3))
    cov_err = np.abs(l_fit @ l_fit.T - l_true @ l_true.T).max()
    print(f"max |LL^T - L_true L_true^T| = {cov_err:.4f}")


if __name__ == "__main__":
    main()
