"""Hamiltonian neural network (HNN) + symplectic integration.

Greydanus et al. 2019: instead of regressing an unstructured vector field
f(q, p) -> (dq, dp), learn scalar potentials T(p), V(q) and take the field
FROM Hamilton's equations (dq = dT/dp, dp = -dV/dq, one jax.grad each) — the
learned dynamics are then exactly Hamiltonian with separable H = T + V,
which is precisely the contract of this stack's symplectic solvers
(`solver/symplectic.py`: leapfrog / velocity_verlet / yoshida4, (q, p) pair
state). No reference counterpart (its zoo has no symplectic scheme and its
applications no mechanics demo).

System: the pendulum H = p²/2 + (1 − cos q). Train on derivative matching
(the standard HNN loss), then roll the LEARNED system out over T=1000 at
h=0.25 and measure energy drift two ways (measured on CPU, seed 0):

- LEARNED-H drift (the exact invariant of the learned flow — isolates the
  integrator): yoshida4 3.4e-4 BOUNDED vs rk4 1.1e-2 growing (31x),
- TRUE-H drift (integrator + model): HNN+yoshida4 0.012 vs the
  unstructured-MLP baseline 0.93 (80x) — structure, not fit quality,
  carries the long-horizon behavior (the MLP fits the derivatives to 2e-3).

Run: python examples/hnn_demo.py [--steps 600]
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

from paddlexde_tpu import odeint

Q0, P0 = 1.5, 0.0
T_LONG, H_STEP = 1000.0, 0.25


def true_h(q, p):
    return 0.5 * p**2 + (1.0 - jnp.cos(q))


def init_mlp(key, n_in, width=48, n_out=1):
    ks = jax.random.split(key, 3)
    g = lambda k, i, o: jax.random.normal(k, (i, o)) * jnp.sqrt(2.0 / (i + o))
    return {"w1": g(ks[0], n_in, width), "b1": jnp.zeros(width),
            "w2": g(ks[1], width, width), "b2": jnp.zeros(width),
            "w3": g(ks[2], width, n_out), "b3": jnp.zeros(n_out)}


def mlp(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    h = jnp.tanh(h @ params["w2"] + params["b2"])
    return h @ params["w3"] + params["b3"]


def hnn_field(params):
    """Separable Hamiltonian field from learned scalars T(p), V(q)."""
    t_scalar = lambda p: mlp(params["T"], p.reshape(1, 1))[0, 0]
    v_scalar = lambda q: mlp(params["V"], q.reshape(1, 1))[0, 0]

    def f(t, state):
        q, p = state
        dq = jax.vmap(jax.grad(t_scalar))(p)  # dT/dp
        dp = -jax.vmap(jax.grad(v_scalar))(q)  # -dV/dq
        return dq, dp

    return f


def mlp_field(params):
    def f(t, state):
        q, p = state
        out = mlp(params, jnp.stack([q, p], -1))
        return out[:, 0], out[:, 1]

    return f


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    key = jax.random.PRNGKey(args.seed)

    # derivative-matching data: (q, p) samples + Hamilton labels
    kq, kp = jax.random.split(jax.random.fold_in(key, 1))
    q = jax.random.uniform(kq, (4096,), minval=-2.5, maxval=2.5)
    p = jax.random.uniform(kp, (4096,), minval=-2.0, maxval=2.0)
    dq_lab, dp_lab = p, -jnp.sin(q)

    hnn_params = {"T": init_mlp(jax.random.fold_in(key, 2), 1),
                  "V": init_mlp(jax.random.fold_in(key, 3), 1)}
    mlp_params = init_mlp(jax.random.fold_in(key, 4), 2, n_out=2)
    opt = optax.adam(3e-3)

    def train(params, field_of, label):
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            def loss(params):
                dq, dp = field_of(params)(0.0, (q, p))
                return jnp.mean((dq - dq_lab) ** 2 + (dp - dp_lab) ** 2)

            l, grads = jax.value_and_grad(loss)(params)
            upd, state_ = opt.update(grads, state)
            return optax.apply_updates(params, upd), state_, l

        l0 = None
        for i in range(args.steps):
            params, state, l = step(params, state)
            l0 = float(l) if l0 is None else l0
        print(f"{label}: derivative loss {l0:.4f} -> {float(l):.6f}")
        return params

    hnn_params = train(hnn_params, hnn_field, "HNN (T,V scalars)")
    mlp_params = train(mlp_params, mlp_field, "MLP baseline     ")

    # long-horizon rollouts of the LEARNED dynamics
    ts = np.arange(0.0, T_LONG + H_STEP / 2, H_STEP)
    y0 = (jnp.asarray([Q0]), jnp.asarray([P0]))

    def learned_h(q, p):
        return (mlp(hnn_params["T"], p[:, None])[:, 0]
                + mlp(hnn_params["V"], q[:, None])[:, 0])

    def drift(field, solver, h_fn):
        qs, ps = odeint(field, y0, jnp.asarray(ts), solver, time_axis=0)
        e = np.asarray(h_fn(qs[:, 0], ps[:, 0]))
        return float(np.abs(e - e[0]).max())

    # LEARNED-H drift isolates the integrator property (the learned H is the
    # exact invariant of the learned flow); TRUE-H drift adds model error
    hf = hnn_field(hnn_params)
    d_sympl = drift(hf, "yoshida4", learned_h)
    d_rk4 = drift(hf, "rk4", learned_h)
    print(f"learned-H max drift over T={T_LONG:.0f} (h={H_STEP}): "
          f"yoshida4 {d_sympl:.2e}  rk4 {d_rk4:.2e}")
    t_sympl = drift(hf, "yoshida4", true_h)
    t_mlp = drift(mlp_field(mlp_params), "rk4", true_h)
    print(f"true-H max drift: HNN+yoshida4 {t_sympl:.4f}  MLP+rk4 {t_mlp:.4f}")
    return d_sympl, d_rk4, t_sympl, t_mlp


if __name__ == "__main__":
    main()
