"""D3STN train-step benchmark at PEMS08 scale on the current backend.

Measures ms/step and samples/sec for the FULL jitted train step (spline lag
lookups, ddeint residual, KL loss, grads, Adam) at configurable batch size /
dtype, plus XLA cost analysis (flops, bytes accessed, peak memory). The
round-1 baselines (ROADMAP "Measured"): bs 8 -> 133 samples/s, bs 32 -> 209,
bs 128 -> 195 (f32, his 288); bf16 +12% at bs 128 only.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_d3stn.py \
           [--bs 32] [--dtype float32] [--his 288] [--reps 20] [--remat 0]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--his", type=int, default=288)
    ap.add_argument("--nodes", type=int, default=170)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--conv_impl", default="conv")
    ap.add_argument("--remat", type=int, default=0)
    ap.add_argument("--fuse_qkv", type=int, default=0)  # measured slower; see config
    ap.add_argument("--dropout", type=float, default=0.0,
                    help="train-mode dropout: attention-weight dropout runs "
                    "IN-kernel; GCN score dropout falls back to XLA (the "
                    "wontfix-bound measurement for that decision)")
    ap.add_argument("--gcn_impl", default="auto")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chain", type=int, default=0,
                    help="also measure the device-side marginal step time by "
                    "chaining this many steps in one program (0 = off)")
    args = ap.parse_args()
    if args.chain == 1:
        ap.error("--chain needs >= 2 (the marginal divides by chain-1)")

    import jax

    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from _cache import enable as _enable_cache
    _enable_cache(jax)

    if args.cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    import jax.numpy as jnp
    import optax

    from paddlexde_tpu.functional.ddeint import ddeint
    from paddlexde_tpu.models.d3stn import (
        D3STN,
        D3STNConfig,
        init_lag_anchors,
        norm_adj_matrix,
    )
    from paddlexde_tpu.models.d3stn.train_utils import kl_div
    from paddlexde_tpu.xde.history import history_index

    cfg = D3STNConfig(
        dataset_name="PEMS08",
        num_nodes=args.nodes,
        his_len=args.his,
        tgt_len=12,
        encoder_num_layers=2,
        decoder_num_layers=2,
        d_model=128,
        d_proj=80,
        d_sect=24,
        d_adaptive=0,
        head=8,
        top_k=8,
        attention="Corr",
        batch_size=args.bs,
        compute_dtype=args.dtype,
        conv_impl=args.conv_impl,
        remat=bool(args.remat),
        fuse_qkv=bool(args.fuse_qkv),
        dropout=args.dropout,
        gcn_impl=args.gcn_impl,
    )
    rng = np.random.RandomState(0)
    adj = (rng.rand(cfg.num_nodes, cfg.num_nodes) < 0.05).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(cfg.num_nodes, cfg.num_nodes).astype(np.float32)
    model = D3STN(
        cfg,
        jnp.asarray(norm_adj_matrix(adj).astype(np.float32)),
        jnp.asarray(norm_adj_matrix(sc).astype(np.float32)),
    )
    dummy = jnp.zeros((1, cfg.num_nodes, cfg.tgt_len, 3), jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy)["params"]
    enc, dec = init_lag_anchors(cfg)
    state = {"net": params, "enc_idx": jnp.asarray(enc), "dec_idx": jnp.asarray(dec)}
    tx = optax.adam(1e-3)
    opt_state = tx.init(state)
    his_span = jnp.arange(cfg.his_len, dtype=jnp.float32)

    src = rng.rand(args.bs, cfg.num_nodes, cfg.his_len, 3).astype(np.float32)
    src[..., 1] = rng.randint(0, 7, src[..., 1].shape)
    src[..., 2] = rng.randint(0, 288, src[..., 2].shape)
    tgt = rng.rand(args.bs, cfg.num_nodes, cfg.tgt_len, 3).astype(np.float32)
    src, tgt = jnp.asarray(src), jnp.asarray(tgt)

    drop_rng = jax.random.key(7)

    def loss_fn(st, src, tgt):
        y0 = history_index(st["dec_idx"], src, his_span, interpolation="cubic")
        apply_kw = (
            {"deterministic": False, "rngs": {"dropout": drop_rng}}
            if args.dropout > 0 else {}
        )
        func = lambda y_lags, y: model.apply(
            {"params": st["net"]}, y_lags, y, **apply_kw)
        sol, delay = ddeint(
            func, y0, jnp.arange(2.0, dtype=jnp.float32), st["enc_idx"], src,
            his_span, "euler", fixed_solver_interp="", time_axis=0,
        )
        preds = sol[1][..., :1]
        tgt_v = tgt[..., :1]
        loss = jnp.mean(jnp.abs(preds - tgt_v))
        tgt_sm = jax.nn.softmax(tgt_v, axis=-2)
        align = kl_div(jax.nn.log_softmax(delay[..., :1], axis=-2), tgt_sm)
        align = align + kl_div(jax.nn.log_softmax(preds, axis=-2), tgt_sm)
        return loss + 0.01 * align

    @jax.jit
    def train_step(state, opt_state, src, tgt):
        loss, grads = jax.value_and_grad(loss_fn)(state, src, tgt)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(state, updates), opt_state, loss

    lowered = train_step.lower(state, opt_state, src, tgt)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        cost = {
            "gflops": round(ca.get("flops", 0) / 1e9, 1),
            "gbytes_accessed": round(ca.get("bytes accessed", 0) / 1e9, 1),
        }
    except Exception:
        cost = {}
    try:
        mem = compiled.memory_analysis()
        cost["peak_gb"] = round(
            (mem.temp_size_in_bytes + mem.argument_size_in_bytes
             + mem.output_size_in_bytes) / 2**30, 2)
        cost["temp_gb"] = round(mem.temp_size_in_bytes / 2**30, 2)
    except Exception:
        pass

    out = compiled(state, opt_state, src, tgt)
    jax.block_until_ready(out)
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = compiled(state, opt_state, *((src, tgt)))
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts) * 1e3)

    extra = {}
    if args.chain:
        # DEVICE-SIDE step time: the per-call number above includes this
        # box's ~30 ms tunnel-RPC dispatch floor (tools/probe_rpc_floor.py —
        # a trivial y*2 jit call costs the same); chain R steps in ONE
        # program (state threaded, same batch) and take the marginal.
        def make_chain(r):
            @jax.jit
            def chain(state, opt_state, src, tgt):
                def body(i, carry):
                    st, op = carry
                    st, op, _ = train_step(st, op, src, tgt)
                    return (st, op)

                st, op = jax.lax.fori_loop(0, r, body, (state, opt_state))
                return st["enc_idx"]

            def run():
                float(jnp.sum(chain(state, opt_state, src, tgt)))

            run()  # compile
            ts = []
            for _ in range(max(args.reps // 2, 3)):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts) * 1e3)

        t1, tr = make_chain(1), make_chain(args.chain)
        marginal = (tr - t1) / (args.chain - 1)
        extra = {
            "device_ms_per_step": round(marginal, 2),
            "device_samples_per_sec": round(args.bs / (marginal / 1e3), 1),
            "dispatch_floor_ms": round(t1 - marginal, 1),
        }

    print(json.dumps({
        "bs": args.bs, "dtype": args.dtype, "his": args.his,
        "conv_impl": args.conv_impl, "remat": bool(args.remat),
        "fuse_qkv": bool(args.fuse_qkv), "dropout": args.dropout,
        "ms_per_step": round(ms, 2),
        "samples_per_sec": round(args.bs / (ms / 1e3), 1),
        "backend": jax.default_backend(),
        **extra,
        **cost,
    }))


if __name__ == "__main__":
    main()
