"""Locate the small-ODE latency floor on the TPU (VERDICT r2 next-step 3).

BENCH_r02: the dense adaptive engine does ~1.2k dopri5 steps/s on the v5e
for a [1, 2]-state spiral while the same code does ~128k on CPU. Candidate
causes, each isolated here inside ONE compiled program (timed by chaining
reps and ending with a host fetch — block_until_ready through the axon
tunnel does not wait, see memory/tpu-bench-workflow):

  A. per-while-iteration overhead (cond+carry plumbing)        -> empty_while
  B. per-op overhead of tiny tensors inside compiled code      -> scan_body
  C. the dense buffer writes                                   -> scan_buffer
  D. the full adaptive step (A+B+C plus accept/reject select)  -> engine

If B dominates (scan of real bodies ~= the engine), unrolling k attempts per
while iteration cannot help — the floor is op-dispatch within the program,
and the honest fix is documenting the floor + batching (vmap) for
throughput. If A dominates (empty_while ~ engine), unrolling wins.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_while_floor.py
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
    print("backend:", jax.default_backend(), jax.devices())

    N_ITER = 512  # iterations per measured unit
    REPS = 20

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

    def timed(make_fn, label):
        """make_fn() -> jitted fn(y) running N_ITER units; returns per-unit ms."""
        fn = jax.jit(make_fn())
        out = fn(y0)  # compile
        float(jnp.sum(out))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(y0)
            s = float(jnp.sum(out))  # host fetch = real completion barrier
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        per_unit_ms = med / N_ITER * 1e3
        print(f"{label:28s} {per_unit_ms:8.4f} ms/unit  "
              f"({N_ITER / med:9.0f} units/s)  [{s:.3f}]")
        return per_unit_ms

    # A: while loop with near-empty body
    def make_empty_while():
        def f(y):
            def body(c):
                i, y = c
                return i + 1, y * 0.999999
            _, yf = jax.lax.while_loop(lambda c: c[0] < N_ITER, body, (0, y))
            return yf
        return f

    # B: scan over the real dopri5-shaped body (7 vf evals + weighted sums)
    def dopri5_like_step(t, y, dt):
        ks = []
        yi = y
        for i in range(7):
            ks.append(vf(t, yi))
            yi = y + dt * sum((0.1 + 0.03 * j) * k for j, k in enumerate(ks)) / len(ks)
        y1 = y + dt * sum((0.05 + 0.02 * j) * k for j, k in enumerate(ks))
        err = dt * sum((0.01 * (j + 1)) * k for j, k in enumerate(ks))
        return y1, err

    def make_scan_body():
        def f(y):
            def step(carry, _):
                t, y = carry
                y1, err = dopri5_like_step(t, y, 0.01)
                return (t + 0.01, y1), None
            (_, yf), _ = jax.lax.scan(step, (0.0, y), None, length=N_ITER)
            return yf
        return f

    # B': same body inside a while_loop (adds cond/carry per-iteration cost)
    def make_while_body():
        def f(y):
            def body(c):
                i, t, y = c
                y1, err = dopri5_like_step(t, y, 0.01)
                return i + 1, t + 0.01, y1
            _, _, yf = jax.lax.while_loop(lambda c: c[0] < N_ITER, body, (0, 0.0, y))
            return yf
        return f

    # C: while body + the 5-coefficient buffer writes of the dense engine
    def make_while_buffer():
        def f(y):
            bufs = [jnp.zeros((N_ITER,) + y.shape, y.dtype) for _ in range(5)]
            def body(c):
                i, t, y, bufs = c
                y1, err = dopri5_like_step(t, y, 0.01)
                accepted = err.sum() < 1e6  # always true; keeps the select
                slot = jnp.where(accepted, i, jnp.maximum(i - 1, 0))
                bufs = [
                    b.at[slot].set(jnp.where(accepted, y1, b[slot]))
                    for b in bufs
                ]
                return i + 1, t + 0.01, y1, bufs
            _, _, yf, bufs = jax.lax.while_loop(
                lambda c: c[0] < N_ITER, body, (0, 0.0, y, bufs)
            )
            return yf + sum(b[0] for b in bufs)
        return f

    # D: the real engine at the bench config (45-step solve, repeated via
    # fori to amortize: N_ITER/45 solves per call is awkward — time one solve
    # directly instead, reps outside)
    from paddlexde_tpu import odeint

    def engine_once():
        def vf2(t, y):
            return vf(t, y)
        t_span = jnp.linspace(0.0, 25.0, 1000, dtype=jnp.float32)
        f = jax.jit(lambda y: odeint(
            vf2, y, t_span, "dopri5", rtol=1e-6, atol=1e-8,
            options={"max_steps": 512, "return_stats": True}, time_axis=0,
        ))
        sol, stats = f(y0)
        n_steps = int(stats.n_accept) + int(stats.n_reject)
        float(jnp.sum(sol))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            sol, stats = f(y0)
            float(jnp.sum(sol))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{'engine (real solve)':28s} {med / n_steps * 1e3:8.4f} ms/step "
              f"({n_steps / med:9.0f} steps/s)  [{n_steps} steps/solve, "
              f"{med * 1e3:.1f} ms/solve]")

    timed(make_empty_while, "A empty while")
    timed(make_scan_body, "B scan x dopri5-body")
    timed(make_while_body, "B' while x dopri5-body")
    timed(make_while_buffer, "C while + buffer writes")
    engine_once()


if __name__ == "__main__":
    main()
