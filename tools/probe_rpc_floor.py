"""Separate tunnel-RPC latency from device-side solve time (VERDICT r2 #3).

probe_while_floor.py showed every jitted call on this box costs ~32 ms
regardless of content (empty 512-iter while == full dopri5 bodies == one
45-step engine solve). This probe pins it: (a) a trivial y*2 call, (b) R
dependency-chained engine solves inside ONE program — the marginal time per
extra solve is the true device-side cost, the intercept is the RPC floor.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_rpc_floor.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from _cache import enable as _enable_cache
    _enable_cache(jax)
    from paddlexde_tpu import odeint

    print("backend:", jax.default_backend(), jax.devices())
    REPS = 25

    rng = np.random.RandomState(0)
    params = {
        "w1": jnp.asarray(rng.randn(2, 50).astype(np.float32) * 0.1),
        "b1": jnp.zeros(50, jnp.float32),
        "w2": jnp.asarray(rng.randn(50, 2).astype(np.float32) * 0.1),
        "b2": jnp.zeros(2, jnp.float32),
    }

    def vf(t, y):
        return jnp.tanh((y**3) @ params["w1"] + params["b1"]) @ params["w2"] + params["b2"]

    y0 = jnp.asarray([[2.0, 0.0]], jnp.float32)
    t_span = jnp.linspace(0.0, 25.0, 1000, dtype=jnp.float32)

    def timed(fn, label, n_units=1):
        out = fn(y0)
        float(jnp.sum(out))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(y0)
            float(jnp.sum(out))  # host fetch = completion barrier
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) * 1e3
        print(f"{label:26s} {med:8.2f} ms/call ({med / n_units:7.3f} ms/unit)")
        return med

    timed(jax.jit(lambda y: y * 2.0), "trivial y*2")

    def solve_once(y):
        sol, stats = odeint(
            vf, y, t_span, "dopri5", rtol=1e-6, atol=1e-8,
            options={"max_steps": 512, "return_stats": True}, time_axis=0,
        )
        return sol[-1], stats

    _, stats = jax.jit(solve_once)(y0)
    n_steps = int(stats.n_accept) + int(stats.n_reject)
    print(f"steps per solve: {n_steps}")

    def chained(r):
        def f(y):
            def body(i, yv):
                yf, _ = solve_once(yv)
                # dependency: next solve starts from a perturbed final state
                return y0 * 0.5 + yv * 1e-6 + yf * 1e-6

            return jax.lax.fori_loop(0, r, body, y)
        return jax.jit(f)

    t1 = timed(chained(1), "engine x1", 1)
    t4 = timed(chained(4), "engine x4", 4)
    t16 = timed(chained(16), "engine x16", 16)
    marg = (t16 - t1) / 15.0
    print(f"marginal device time per solve: {marg:.3f} ms "
          f"=> device-side {n_steps / marg * 1e3:.0f} steps/s; "
          f"RPC floor ~= {t1 - marg:.1f} ms")


if __name__ == "__main__":
    main()
