"""Spiral Neural-ODE demo (the torchdiffeq classic).

Rebuild of ``example/ode_demo.py`` (DrownFish19/PaddleXDE): true data from
``dy = mm(y^3, A)``, model = MLP 2->50(tanh)->2 on y^3, trained on sliding
[B, T, D] windows; ``--adjoint`` switches to O(1)-memory adjoint gradients.

Run: python examples/ode_demo.py [--solver rk4] [--adjoint] [--viz]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from examples.demo_utils import (
    RunningAverageMeter,
    Timer,
    WindowDataset,
    demo_args,
    make_spiral,
    maybe_visualize,
)
from paddlexde_tpu import odeint, odeint_adjoint


def init_params(rng):
    return {
        "w1": jnp.asarray(rng.randn(2, 50) * 0.1, jnp.float32),
        "b1": jnp.zeros(50, jnp.float32),
        "w2": jnp.asarray(rng.randn(50, 2) * 0.1, jnp.float32),
        "b2": jnp.zeros(2, jnp.float32),
    }


def vector_field(params, t, y):
    h = jnp.tanh((y**3) @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def main():
    args = demo_args(max_steps=400)
    xdeint = odeint_adjoint if args.adjoint else odeint

    t, true_y = make_spiral(args.data_len)
    data = WindowDataset(true_y, t, args.pred_len, seed=args.seed)
    rng = np.random.RandomState(args.seed)
    params = init_params(rng)
    opt = optax.rmsprop(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, y0, tb, targ):
        def loss_fn(p):
            pred = xdeint(
                lambda tt, y: vector_field(p, tt, y), y0, tb, args.solver,
                rtol=1e-4, atol=1e-6, time_axis=0,
            )
            return jnp.mean(jnp.abs(pred - targ))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    meter = RunningAverageMeter()
    timer = Timer()
    for step in range(1, args.max_steps + 1):
        y0, tb, targ = data.batch(args.batch_size)
        params, opt_state, loss = train_step(params, opt_state, y0, tb, targ)
        meter.update(float(loss))
        if step % 20 == 0:
            pred = odeint(
                lambda tt, y: vector_field(params, tt, y),
                true_y[0],
                t,
                args.solver,
                rtol=1e-4,
                atol=1e-6,
                time_axis=0,
            )
            full_err = float(jnp.mean(jnp.abs(pred - true_y)))
            print(
                f"step {step:05d} | loss {meter.avg:.6f} | full-traj MAE "
                f"{full_err:.4f} | {timer.elapsed():.1f}s"
            )
            maybe_visualize(
                args, step, t, true_y, pred,
                lambda pts: vector_field(params, 0.0, pts),
            )
    print("done:", meter.avg)


if __name__ == "__main__":
    main()
