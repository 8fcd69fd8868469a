"""Neural DDE demo: learnable fractional lags on the spiral.

Rebuild of ``example/dde_demo.py`` (DrownFish19/PaddleXDE), FIXED: the
reference's demo used a stale 4-arg vector-field signature that its own
``BaseDDE.move`` never calls (SURVEY §2.11-5); here the live seq2seq contract
``func(y_lags, y)`` is used, and the lag positions are learnable floats
optimized jointly with the network — the differentiable delay-selection
mechanism D3STN is built on.

Run: python examples/dde_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from examples.demo_utils import RunningAverageMeter, Timer, demo_args, make_spiral
from paddlexde_tpu import Euler, ddeint


def main():
    args = demo_args(max_steps=300)
    n_lags = 6
    his_len = args.his_len
    if args.data_len - args.pred_len <= his_len:
        raise SystemExit(
            f"data_len ({args.data_len}) must exceed his_len + pred_len "
            f"({his_len} + {args.pred_len}): every training window needs a "
            f"full history behind it (use --his_len to shrink the history)"
        )

    t, true_y = make_spiral(args.data_len)
    true_np = np.asarray(true_y)  # [T, 1, 2]
    rng = np.random.RandomState(args.seed)

    params = {
        # vector field over (mean of history at lags, current state)
        "w_lag": jnp.asarray(rng.randn(2, 50) * 0.1, jnp.float32),
        "w_cur": jnp.asarray(rng.randn(2, 50) * 0.1, jnp.float32),
        "b1": jnp.zeros(50, jnp.float32),
        "w2": jnp.asarray(rng.randn(50, 2) * 0.1, jnp.float32),
        # learnable fractional lag positions into the history window
        "lags": jnp.asarray(
            np.sort(rng.randint(1, his_len - 1, n_lags)).astype(np.float32)
        ),
    }
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    his_span = jnp.arange(his_len, dtype=jnp.float32)

    def batch(batch_size):
        idx = rng.randint(his_len, true_np.shape[0] - args.pred_len, batch_size)
        his = jnp.asarray(
            np.stack([true_np[i - his_len : i, 0] for i in idx])
        )  # [B, his_len, 2]
        y0 = jnp.asarray(true_np[idx])  # [B, 1, 2]
        targ = jnp.asarray(
            np.stack([true_np[i : i + args.pred_len, 0] for i in idx], 1)
        )  # [pred_len, B, 2]
        return his, y0, targ

    t_span = jnp.arange(args.pred_len, dtype=jnp.float32) * float(t[1] - t[0])

    @jax.jit
    def train_step(params, opt_state, his, y0, targ):
        def loss_fn(p):
            def func(y_lags, y):
                # [B, L, 2] history at lags + [B, 1, 2] current state
                h = jnp.tanh(
                    jnp.mean(y_lags**3, axis=1, keepdims=True) @ p["w_lag"]
                    + (y**3) @ p["w_cur"]
                    + p["b1"]
                )
                return h @ p["w2"]

            sol, y_lags = ddeint(
                func, y0, t_span, p["lags"], his, his_span, Euler,
                fixed_solver_interp="",
            )
            # sol: [B, 1, pred_len, 2]
            pred = jnp.moveaxis(sol[:, 0], 1, 0)  # [pred_len, B, 2]
            return jnp.mean(jnp.abs(pred - targ))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    meter = RunningAverageMeter()
    timer = Timer()
    for step in range(1, args.max_steps + 1):
        his, y0, targ = batch(args.batch_size)
        params, opt_state, loss = train_step(params, opt_state, his, y0, targ)
        meter.update(float(loss))
        if step % 20 == 0:
            lag_str = np.array2string(np.asarray(params["lags"]), precision=1)
            print(
                f"step {step:05d} | loss {meter.avg:.6f} | lags {lag_str} | "
                f"{timer.elapsed():.1f}s"
            )
    print("done:", meter.avg)


if __name__ == "__main__":
    main()
