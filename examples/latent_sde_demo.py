"""Latent (variational) neural SDE — the "Scalable Gradients for SDEs"
application (Li et al. 2020; torchsde's flagship example), on this stack.

Generative model: a latent Itô SDE prior  dz = f_prior(z)·dt + g·dW  with a
Gaussian observation model; approximate posterior: a second drift
f_post(z, t) sharing the prior's diffusion. The ELBO's KL between the two
path measures is the Girsanov integral

    KL = E_q ∫ ½ u(z, t)² dt,      u = (f_post − f_prior) / g,

which rides along as ONE extra state component with zero diffusion, so the
whole objective is a single `sdeint_adjoint` call over the augmented state
(z, kl) — O(T_out)-memory discrete-exact gradients for drift, diffusion and
the KL accumulator at once (the reference has no SDE training story at all;
its sdeint is broken Euler–Maruyama). This demo builds the augmentation by
hand to show the mechanics; `paddlexde_tpu.sdeint_logqp` packages exactly
this pattern (posterior drift, prior drift, shared diffusion → (path, kl))
with the same adjoint option.

Data: an Ornstein–Uhlenbeck process (θ, μ, σ known to us, not the model).
After training, the learned PRIOR should reproduce the data's stationary
statistics — printed at the end, together with the ELBO trace.

Run: python examples/latent_sde_demo.py [--steps 400]
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

from paddlexde_tpu import BrownianInterval, sdeint, sdeint_adjoint

THETA, MU, SIGMA = 1.5, 0.8, 0.5  # the data's OU parameters (hidden truth)
T1, N_OBS = 2.0, 17
N_TRAJ = 256


def make_data(key):
    """OU trajectories observed on a uniform grid (exact transition law)."""
    ts = np.linspace(0.0, T1, N_OBS)
    dt = ts[1] - ts[0]
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    x = np.zeros((N_TRAJ, N_OBS))
    x[:, 0] = rng.normal(MU, SIGMA / np.sqrt(2 * THETA), N_TRAJ)
    a = np.exp(-THETA * dt)
    s = SIGMA * np.sqrt((1 - a * a) / (2 * THETA))
    for k in range(1, N_OBS):
        x[:, k] = MU + a * (x[:, k - 1] - MU) + s * rng.normal(size=N_TRAJ)
    return jnp.asarray(ts), jnp.asarray(x)


def mlp_init(key, sizes):
    params = []
    for kin, kout in zip(sizes[:-1], sizes[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        params.append({
            "w": jax.random.normal(k1, (kin, kout)) * (1.0 / np.sqrt(kin)),
            "b": jnp.zeros((kout,)),
        })
    return params


def mlp_apply(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jnp.tanh(x)
    return x


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--lr", type=float, default=2e-2)
    p.add_argument("--n_sub", type=int, default=4)  # SDE steps per obs gap
    args = p.parse_args()

    key = jax.random.key(0)
    ts, data = make_data(jax.random.key(42))
    t_grid = jnp.linspace(0.0, T1, (N_OBS - 1) * args.n_sub + 1)
    obs_idx = jnp.arange(0, len(t_grid), args.n_sub)

    key, k1, k2 = jax.random.split(key, 3)
    params = {
        # prior drift: linear-in-z with learnable pull/level (the model
        # CLASS contains the truth; training should find it)
        "prior_a": jnp.zeros(()),
        "prior_b": jnp.zeros(()),
        # posterior drift: small MLP over (z, t) — path-dependent control
        "post": mlp_init(k1, (2, 32, 1)),
        "log_g": jnp.asarray(-1.0),  # shared diffusion
        "log_obs": jnp.asarray(-2.0),  # observation noise
        "z0_mean": jnp.zeros(()),
        "z0_logstd": jnp.zeros(()),
    }

    def elbo(params, key):
        g = jax.nn.softplus(params["log_g"]) + 1e-3
        obs_std = jax.nn.softplus(params["log_obs"]) + 1e-3

        def f_prior(z):
            return params["prior_a"] * z + params["prior_b"]

        def f_post(t, z):
            inp = jnp.stack([z, jnp.broadcast_to(t, z.shape)], axis=-1)
            return mlp_apply(params["post"], inp)[..., 0]

        def drift(t, y):
            z, _ = y[..., 0], y[..., 1]
            u = (f_post(t, z) - f_prior(z)) / g
            return jnp.stack([f_post(t, z), 0.5 * u * u], axis=-1)

        def diffusion(t, y):
            return jnp.stack(
                [jnp.full_like(y[..., 0], g), jnp.zeros_like(y[..., 1])],
                axis=-1,
            )

        key_z0, key_bm = jax.random.split(key)
        eps = jax.random.normal(key_z0, (N_TRAJ,))
        z0 = params["z0_mean"] + jnp.exp(params["z0_logstd"]) * eps
        y0 = jnp.stack([z0, jnp.zeros_like(z0)], axis=-1)
        bm = BrownianInterval(0.0, T1, size=(N_TRAJ, 2), key=key_bm,
                              dtype=jnp.float32)
        # the O(T_out)-memory replay adjoint, with a FRESH tree key flowing
        # through jit every step. One sharp edge: differentiate the UNJITTED
        # function under one outer jit — grad-of-inner-jit bakes the
        # custom_vjp residuals against the outer tracer ("No constant
        # handler for DynamicJaxprTracer")
        sol = sdeint_adjoint(drift, diffusion, y0, t_grid, "euler", bm=bm,
                             time_axis=0)
        z_path = sol[obs_idx, :, 0]  # [N_OBS, N_TRAJ]
        kl_path = sol[-1, :, 1]  # Girsanov integral per trajectory

        log_lik = jnp.sum(
            -0.5 * ((data.T - z_path) / obs_std) ** 2
            - jnp.log(obs_std) - 0.5 * jnp.log(2 * jnp.pi),
            axis=0,
        )
        # z0 KL against the prior's stationary Gaussian (mean −b/a, var g²/(−2a))
        a = params["prior_a"] - 1e-3  # keep the stationary var defined
        st_mean = -params["prior_b"] / a
        st_var = g * g / (-2.0 * a) + 1e-6
        q_mean, q_var = params["z0_mean"], jnp.exp(2 * params["z0_logstd"])
        kl_z0 = 0.5 * (jnp.log(st_var / q_var) - 1.0
                       + (q_var + (q_mean - st_mean) ** 2) / st_var)
        return jnp.mean(log_lik - kl_path) - kl_z0

    # NOTE: no inner jit here — value_and_grad(jit(f)) over the replay
    # adjoint fails with a traced bm key (custom_vjp residuals captured as
    # inner-jit constants); one outer jit around value_and_grad is the form
    loss_fn = lambda p_, k_: -elbo(p_, k_)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
        if it % 50 == 0 or it == args.steps - 1:
            print(f"step {it:4d}  -ELBO/traj {loss:10.3f}")

    # the learned PRIOR alone should reproduce the data's law: simulate it
    g = float(jax.nn.softplus(params["log_g"]) + 1e-3)
    a, b = float(params["prior_a"]), float(params["prior_b"])
    f_prior = lambda t, z: a * z + b
    g_fn = lambda t, z: jnp.full_like(z, g)
    z0 = (params["z0_mean"]
          + jnp.exp(params["z0_logstd"]) * jax.random.normal(key, (4096,)))
    zT = sdeint(f_prior, g_fn, z0, jnp.linspace(0.0, T1, 65), "euler",
                key=7, time_axis=0)[-1]
    print(f"\nlearned prior: dz = ({a:.3f} z + {b:.3f}) dt + {g:.3f} dW"
          f"   [truth: dz = -{THETA}(z - {MU}) dt + {SIGMA} dW"
          f" = ({-THETA} z + {THETA * MU:.2f}) dt + {SIGMA} dW]")
    print(f"prior z(T): mean {float(jnp.mean(zT)):.3f} / std "
          f"{float(jnp.std(zT)):.3f}   [data stationary: mean {MU} / std "
          f"{SIGMA / np.sqrt(2 * THETA):.3f}]")
    print(f"ELBO improved: {losses[0]:.1f} -> {losses[-1]:.1f}"
          f"  ({'yes' if losses[-1] < losses[0] - 1 else 'NO'})")


if __name__ == "__main__":
    main()
