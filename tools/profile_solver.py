"""Profile any solver configuration on the current backend.

The counterpart of the reference's scratch ``tools/`` scripts (which probed DP
and autograd behaviors); this one answers the questions a production user
actually has: steps/sec, NFE, accept/reject ratio, compile time, and an
optional ``jax.profiler`` trace for TensorBoard.

    python tools/profile_solver.py --solver dopri5 --batch 256 --dim 32
    python tools/profile_solver.py --solver rk4 --points 1000 --trace /tmp/tb
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--solver", default="dopri5")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dim", type=int, default=2)
    p.add_argument("--points", type=int, default=1000)
    p.add_argument("--rtol", type=float, default=1e-6)
    p.add_argument("--atol", type=float, default=1e-8)
    p.add_argument("--dense", action="store_true", help="buffered-dense engine")
    p.add_argument("--adjoint", action="store_true", help="profile fwd+bwd")
    p.add_argument("--trace", type=str, default="", help="jax.profiler logdir")
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from paddlexde_tpu import odeint, odeint_adjoint
    from paddlexde_tpu.solver.registry import resolve_solver

    rng = np.random.RandomState(0)
    hidden = 50
    params = {
        "w1": jnp.asarray(rng.randn(args.dim, hidden).astype(np.float32) * 0.1),
        "b1": jnp.zeros(hidden, jnp.float32),
        "w2": jnp.asarray(rng.randn(hidden, args.dim).astype(np.float32) * 0.1),
    }
    y0 = jnp.asarray(rng.randn(args.batch, args.dim).astype(np.float32))
    t_span = jnp.linspace(0.0, 10.0, args.points, dtype=jnp.float32)

    def vf(p_, t, y):
        return jnp.tanh(y @ p_["w1"] + p_["b1"]) @ p_["w2"]

    is_adaptive = resolve_solver(args.solver).kind == "adaptive"
    options = {"return_stats": True} if is_adaptive else None
    if is_adaptive and args.dense:
        options["max_steps"] = 1024

    fn = odeint_adjoint if args.adjoint else odeint

    @jax.jit
    def run(p_, y0_):
        if args.adjoint:
            return jax.grad(
                lambda pp: jnp.sum(
                    jnp.abs(fn(lambda t, y: vf(pp, t, y), y0_, t_span, args.solver,
                               rtol=args.rtol, atol=args.atol, time_axis=0))
                )
            )(p_)
        return odeint(lambda t, y: vf(p_, t, y), y0_, t_span, args.solver,
                      rtol=args.rtol, atol=args.atol, time_axis=0, options=options)

    t0 = time.perf_counter()
    out = jax.block_until_ready(run(params, y0))
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(params, y0))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))

    print(f"backend           : {jax.default_backend()}")
    print(f"solver            : {args.solver}{' (dense)' if args.dense else ''}"
          f"{' (adjoint)' if args.adjoint else ''}")
    print(f"state             : [{args.batch}, {args.dim}], {args.points} output points")
    print(f"compile + first   : {compile_s:.2f}s")
    print(f"steady-state solve: {med * 1e3:.3f} ms")
    if is_adaptive and not args.adjoint:
        _, stats = out
        n_steps = int(stats.n_accept) + int(stats.n_reject)
        print(f"nfe {int(stats.nfe)} | accept {int(stats.n_accept)} | "
              f"reject {int(stats.n_reject)} | {n_steps / med:.1f} steps/s | "
              f"{int(stats.nfe) * args.batch / med:.0f} NFE-samples/s")

    if args.trace:
        from paddlexde_tpu.utils.profiling import trace

        with trace(args.trace):
            jax.block_until_ready(run(params, y0))
        print(f"profiler trace written to {args.trace}")


if __name__ == "__main__":
    main()
