"""Neural CDE demo: classify irregular time series via a controlled DE.

Capability demo for :func:`paddlexde_tpu.cdeint` (the reference only sketched
CDEs, ``xde/base_cde.py``, SURVEY §2.11-3). Task: distinguish clockwise from
counter-clockwise noisy spirals observed at irregular times — the torchcde
intro example. The control path is the cubic-Hermite interpolation of the
observations; the latent state evolves as dy = f(y) dX.

Run: python examples/cde_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from examples.demo_utils import RunningAverageMeter, Timer, demo_args
from paddlexde_tpu import cdeint
from paddlexde_tpu.interpolation import CubicHermiteSpline

HIDDEN = 16
N_OBS = 32


def make_dataset(n, rng):
    ts = np.sort(rng.rand(n, N_OBS), axis=1).astype(np.float32) * 4 * np.pi
    label = rng.randint(0, 2, n)
    sign = np.where(label == 0, 1.0, -1.0)[:, None]
    x = np.stack(
        [np.cos(sign * ts) + rng.randn(n, N_OBS) * 0.05,
         np.sin(sign * ts) + rng.randn(n, N_OBS) * 0.05,
         ts / (4 * np.pi)],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(ts), jnp.asarray(label)


def init_params(rng):
    return {
        "in_w": jnp.asarray(rng.randn(3, HIDDEN) * 0.3, jnp.float32),
        "f_w1": jnp.asarray(rng.randn(HIDDEN, 64) * 0.1, jnp.float32),
        "f_b1": jnp.zeros(64, jnp.float32),
        "f_w2": jnp.asarray(rng.randn(64, HIDDEN * 3) * 0.1, jnp.float32),
        "out_w": jnp.asarray(rng.randn(HIDDEN, 1) * 0.3, jnp.float32),
    }


def run_model(p, x, ts):
    """Single-sample CDE forward: x [N_OBS, 3] observed at ts [N_OBS]."""
    norm_t = jnp.linspace(0.0, 1.0, N_OBS)
    series = jnp.concatenate([x[:, :2], ts[:, None] / (4 * np.pi)], axis=-1)
    control = CubicHermiteSpline(series, norm_t)
    y0 = x[0] @ p["in_w"]

    def field(t, y):
        h = jnp.tanh(y @ p["f_w1"] + p["f_b1"])
        return jnp.tanh(h @ p["f_w2"]).reshape(HIDDEN, 3)

    sol = cdeint(field, y0, jnp.asarray([0.0, 1.0]), control, "rk4",
                 options={"grid": jnp.linspace(0.0, 1.0, 65)}, time_axis=0)
    return (sol[-1] @ p["out_w"])[0]


def main():
    args = demo_args(max_steps=150)
    rng = np.random.RandomState(args.seed)
    x, ts, labels = make_dataset(512, rng)
    params = init_params(rng)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    batched = jax.vmap(run_model, in_axes=(None, 0, 0))

    @jax.jit
    def train_step(params, opt_state, xb, tb, yb):
        def loss_fn(p):
            logits = batched(p, xb, tb)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, yb))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        acc = jnp.mean((batched(params, xb, tb) > 0) == (yb > 0.5))
        return optax.apply_updates(params, updates), opt_state, loss, acc

    meter = RunningAverageMeter(0.9)
    timer = Timer()
    n = x.shape[0]
    for step in range(1, args.max_steps + 1):
        idx = rng.randint(0, n, args.batch_size)
        params, opt_state, loss, acc = train_step(
            params, opt_state, x[idx], ts[idx], labels[idx].astype(jnp.float32)
        )
        meter.update(float(loss))
        if step % 10 == 0:
            print(
                f"step {step:04d} | loss {meter.avg:.4f} | batch acc "
                f"{float(acc):.2f} | {timer.elapsed():.1f}s"
            )
    print("done:", meter.avg)


if __name__ == "__main__":
    main()
