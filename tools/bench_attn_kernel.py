"""Microbenchmark: fused_temporal_attention kernel vs the XLA reference path
at PEMS08 scale, fwd and fwd+bwd, per node-tile cap.

Usage: PXT_ATTN_TILE_CAP=34 PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/bench_attn_kernel.py [--bs 32]
"""
import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--nodes", type=int, default=170)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--ref", action="store_true", help="time the XLA path too")
    ap.add_argument("--heads", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _cache import bench_cache_dir
    cache = bench_cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from paddlexde_tpu.ops.attn_pallas import (
        _pick_tile, fused_temporal_attention,
    )

    B, N, T, D, H, K = args.bs, args.nodes, 12, 128, args.heads, 3
    rng = np.random.RandomState(0)
    arrs = [jnp.asarray(rng.randn(B, N, T, D).astype(np.float32) * 0.1)
            for _ in range(3)]
    ws = []
    for _ in range(4):
        ws += [jnp.asarray(rng.randn(K, D, D).astype(np.float32) * 0.05),
               jnp.asarray(np.zeros(D, np.float32))]

    def run(use_pallas, label):
        # timing methodology: CHAIN the reps inside one jitted fori_loop
        # (iteration i's input depends on iteration i-1's output), so the
        # measurement is pure device time — per-call host/tunnel dispatch
        # latency and any async-dispatch pipelining cannot distort it.
        def block(a0, *rest):
            def body(_, x):
                # partitioned=False: measure the raw kernel, the
                # single-chip production path (config.spmd default)
                y = fused_temporal_attention(x, *rest, True, True, True, H,
                                             "float32", use_pallas, False,
                                             False)
                return x + 1e-30 * y

            return jax.lax.fori_loop(0, args.reps, body, a0)

        def block_grad(a0, *rest):
            def one(x):
                def loss(xx, *ws_):
                    return jnp.sum(
                        fused_temporal_attention(xx, *rest[:2], *ws_, True,
                                                 True, True, H, "float32",
                                                 use_pallas, False,
                                                 False) ** 2
                    )

                g = jax.grad(loss, argnums=(0,) + tuple(range(1, 9)))(
                    x, *rest[2:]
                )
                return x + 1e-30 * g[0]

            return jax.lax.fori_loop(0, args.reps, lambda _, x: one(x), a0)

        f_fwd = jax.jit(block)
        f_grad = jax.jit(block_grad)
        inputs = (*arrs, *ws)
        # NB: through the axon tunnel, block_until_ready on a jit result does
        # NOT reliably wait for device completion — a host read does. Time
        # reps chained inside one program and end with a host fetch.
        fetch = lambda o: float(jnp.sum(o))
        fetch(f_fwd(*inputs))
        fetch(f_grad(*inputs))
        t0 = time.perf_counter()
        fetch(f_fwd(*inputs))
        fwd_ms = (time.perf_counter() - t0) / args.reps * 1e3
        t0 = time.perf_counter()
        fetch(f_grad(*inputs))
        g_ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(json.dumps({
            "label": label, "tile": _pick_tile(N), "bs": B, "heads": H,
            "fwd_ms": round(fwd_ms, 3),
            "fwd_bwd_ms": round(g_ms, 3),
            "backend": jax.default_backend(),
        }), flush=True)

    run(True, "pallas")
    if args.ref:
        run(False, "xla_ref")


if __name__ == "__main__":
    main()
