"""Neural SDE demo: separate drift & diffusion MLPs on the noisy spiral.

Rebuild of ``example/sde_demo.py`` (DrownFish19/PaddleXDE): true data generated
by ``sdeint`` on the cubic-spiral drift with constant diffusion; drift and
diffusion networks trained jointly on sliding windows — but with working
Euler–Maruyama semantics and a reproducible virtual Brownian tree (the
reference's SDE path was half-implemented, SURVEY §2.11-2).

Run: python examples/sde_demo.py [--adjoint]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from examples.demo_utils import RunningAverageMeter, Timer, WindowDataset, demo_args
from paddlexde_tpu import sdeint, sdeint_adjoint


def make_noisy_spiral(data_len=1000, sigma=0.02, key=0):
    # linear spiral drift: stable under Euler-Maruyama at this dt (the cubic
    # drift's Lipschitz constant ~24 exceeds Euler's stability at dt=0.025)
    a_mat = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]])
    t = jnp.linspace(0.0, 25.0, data_len)
    true_y = sdeint(
        lambda tt, y: y @ a_mat,
        lambda tt, y: jnp.full_like(y, sigma),
        jnp.asarray([[2.0, 0.0]]),
        t,
        "euler",
        key=key,
        time_axis=0,
    )
    return t, true_y


def init_params(rng):
    def mlp(rng, out_scale):
        return {
            "w1": jnp.asarray(rng.randn(2, 50) * 0.1, jnp.float32),
            "b1": jnp.zeros(50, jnp.float32),
            "w2": jnp.asarray(rng.randn(50, 2) * out_scale, jnp.float32),
            "b2": jnp.zeros(2, jnp.float32),
        }

    return {"drift": mlp(rng, 0.1), "diffusion": mlp(rng, 0.01)}


def net(p, y):
    return jnp.tanh(y @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]


def main():
    args = demo_args(max_steps=300, solver="euler")
    xdeint = sdeint_adjoint if args.adjoint else sdeint

    t, true_y = make_noisy_spiral(args.data_len)
    data = WindowDataset(true_y, t, args.pred_len, seed=args.seed)
    rng = np.random.RandomState(args.seed)
    params = init_params(rng)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, y0, tb, targ, step):
        def loss_fn(p):
            pred = xdeint(
                lambda tt, y: net(p["drift"], y),
                lambda tt, y: jax.nn.softplus(net(p["diffusion"], y)) * 0.1,
                y0,
                tb,
                args.solver,  # euler/milstein/sriw1/heun_stratonovich
                key=jax.random.fold_in(jax.random.key(123), step),
                time_axis=0,
            )
            return jnp.mean(jnp.abs(pred - targ))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    meter = RunningAverageMeter()
    timer = Timer()
    for step in range(1, args.max_steps + 1):
        y0, tb, targ = data.batch(args.batch_size)
        params, opt_state, loss = train_step(params, opt_state, y0, tb, targ, step)
        meter.update(float(loss))
        if step % 20 == 0:
            print(f"step {step:05d} | loss {meter.avg:.6f} | {timer.elapsed():.1f}s")
    print("done:", meter.avg)


if __name__ == "__main__":
    main()
