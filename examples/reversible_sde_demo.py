"""Long-horizon neural-SDE training through the O(1)-memory reversible adjoint.

A two-parameter Ornstein–Uhlenbeck model dy = −a(y − b)dt + σ dW is fitted
to trajectories of a ground-truth OU process by matching path statistics at
a handful of observation times, while the solver takes a FINE internal grid
(``options={'step_size': h}``, hundreds of steps between observations).
The point being demonstrated:

- ``sdeint_adjoint(..., 'reversible_heun')`` stores ONLY the final (y, z)
  pair per segment — the backward reconstructs every intermediate state by
  the scheme's exact algebraic inverse, so memory does not grow with the
  internal grid resolution (the replay adjoint would re-run each segment
  forward and hold its sub-step residuals);
- the gradient is machine-equal to direct backprop through the full scan
  (printed check), at ~3x forward cost;
- training recovers the ground-truth (a, b) from data.

Run: python examples/reversible_sde_demo.py [--steps 150]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

import paddlexde_tpu as pxt

A_TRUE, B_TRUE, SIG = 1.6, 0.7, 0.4
T1, N_OBS, N_PATHS = 2.0, 5, 256
FINE_H = 1.0 / 256  # ~512 internal steps over the span


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    args = ap.parse_args()

    ts = jnp.linspace(0.0, T1, N_OBS)
    y0 = jnp.zeros((N_PATHS,), jnp.float32)

    def make_bm(key):
        return pxt.BrownianInterval(0.0, T1, size=(N_PATHS,), key=key,
                                    dtype=jnp.float32)

    # ground-truth observations (fresh paths, fine grid)
    f_true = lambda t, y: -A_TRUE * (y - B_TRUE)
    g_fn = lambda t, y: SIG * jnp.ones_like(y)
    data = pxt.sdeint(f_true, g_fn, y0, jnp.linspace(0.0, T1, 513),
                      "reversible_heun", bm=make_bm(jax.random.key(999)),
                      time_axis=0)
    obs_idx = (np.linspace(0, 512, N_OBS)).astype(int)
    obs_mean = jnp.mean(data[obs_idx], axis=1)
    obs_var = jnp.var(data[obs_idx], axis=1)

    def loss_fn(params, key, solve=pxt.sdeint_adjoint):
        a, b = params
        f = lambda t, y: -a * (y - b)
        sol = solve(f, g_fn, y0, ts, "reversible_heun", bm=make_bm(key),
                    time_axis=0, options={"step_size": FINE_H})
        m = jnp.mean(sol, axis=1)
        v = jnp.var(sol, axis=1)
        return jnp.mean((m - obs_mean) ** 2) + jnp.mean((v - obs_var) ** 2)

    params = (jnp.float32(0.5), jnp.float32(0.0))
    # gradient sanity: reversible backward == direct backprop through the
    # explicit fine-grid scan (same noise)
    key0 = jax.random.key(0)

    def loss_direct(params, key):
        a, b = params
        f = lambda t, y: -a * (y - b)
        ts_f = jnp.linspace(0.0, T1, int(T1 / FINE_H) + 1)
        sol = pxt.sdeint(f, g_fn, y0, ts_f, "reversible_heun",
                         bm=make_bm(key), time_axis=0)
        keep = (np.linspace(0, int(T1 / FINE_H), N_OBS)).astype(int)
        m = jnp.mean(sol[keep], axis=1)
        v = jnp.var(sol[keep], axis=1)
        return jnp.mean((m - obs_mean) ** 2) + jnp.mean((v - obs_var) ** 2)

    g_rev = jax.grad(loss_fn)(params, key0)
    g_dir = jax.grad(loss_direct)(params, key0)
    rel = max(abs(float(g_rev[0] - g_dir[0]) / float(g_dir[0])),
              abs(float(g_rev[1] - g_dir[1]) / (abs(float(g_dir[1])) + 1e-8)))
    print(f"reversible vs direct gradient rel diff: {rel:.2e} "
          f"(~512 internal steps, residual = one pair)")

    opt = optax.adam(5e-2)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        val, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, val

    key = jax.random.key(1)
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, val = train_step(params, opt_state, sub)
        if i % 30 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(val):.5f}  "
                  f"a={float(params[0]):.3f} (true {A_TRUE})  "
                  f"b={float(params[1]):.3f} (true {B_TRUE})")

    assert abs(float(params[0]) - A_TRUE) < 0.4, params
    assert abs(float(params[1]) - B_TRUE) < 0.15, params
    print("OK — recovered the OU parameters through the O(1)-memory adjoint")


if __name__ == "__main__":
    main()
