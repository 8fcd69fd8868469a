"""Component ablations for the D3STN train step: WHERE do the bytes go?

The step at PEMS08 scale (bs 32, f32, his 288) measures ~139 ms with
608 GFLOP and ~78 GB accessed (XLA cost analysis) — 561 GB/s effective, i.e.
~70% of the v5e's ~819 GB/s HBM roofline, so it is BANDWIDTH-bound, and the
byte count (~2300 activation-sized buffers) is ~5x what a hand count of the
fusion passes predicts. This tool measures a ladder of ablations of the full
train step and reports (ms, GFLOP, GB accessed) per variant so the traffic
can be attributed by differencing, plus optionally dumps the optimized HLO
for per-instruction attribution.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_d3stn.py \
           [--bs 32] [--variants full,fwd_only,...] [--dump_hlo /tmp/x.txt]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

VARIANTS = {
    # name -> overrides; see build_step()
    "full": {},
    "fwd_only": {"fwd_only": True},
    "no_kl": {"no_kl": True},
    "linear_interp": {"interp": "linear"},
    "no_dde": {"no_dde": True},
    "ksize1": {"kernel_size": 1},
    "vanilla_attn": {"attention": "Vanilla"},
    "bf16": {"dtype": "bfloat16"},
    # monkeypatch ablations: replace a whole block with a cheap stand-in to
    # attribute its wall-clock/bytes share
    "no_gcn_attn": {"patch_gcn": True},
    "no_attention": {"patch_attention": True},
    "unfused_qkv": {"fuse_qkv": False},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--his", type=int, default=288)
    ap.add_argument("--nodes", type=int, default=170)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--dump_hlo", default="")
    args = ap.parse_args()

    import jax

    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _cache import bench_cache_dir

    cache_dir = bench_cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
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

    rng = np.random.RandomState(0)
    adj = (rng.rand(args.nodes, args.nodes) < 0.05).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(args.nodes, args.nodes).astype(np.float32)
    src_np = rng.rand(args.bs, args.nodes, args.his, 3).astype(np.float32)
    src_np[..., 1] = rng.randint(0, 7, src_np[..., 1].shape)
    src_np[..., 2] = rng.randint(0, 288, src_np[..., 2].shape)
    tgt_np = rng.rand(args.bs, args.nodes, 12, 3).astype(np.float32)

    def run_variant(name, ov):
        import flax.linen as nn

        from paddlexde_tpu.models.d3stn import model as model_mod

        patches = []
        if ov.get("patch_gcn"):
            # spatial attention GCN -> plain dense+silu (keeps params/layout,
            # drops the [B,T,N,N] score/softmax/einsum block)
            orig = model_mod.SpatialAttentionGCN.__call__

            def gcn_stub(self, x, deterministic=True):
                out = nn.Dense(
                    self.cfg.d_model, use_bias=False,
                    kernel_init=model_mod._xavier,
                )(x)
                return jax.nn.silu(out)

            model_mod.SpatialAttentionGCN.__call__ = nn.compact(gcn_stub)
            patches.append((model_mod.SpatialAttentionGCN, "__call__", orig))
        if ov.get("patch_attention"):
            orig = model_mod.MultiHeadAttentionAwareTemporalContext.__call__

            def attn_stub(self, query, key, value, is_mask=False,
                          deterministic=True):
                return nn.Dense(
                    self.cfg.d_model, use_bias=False,
                    kernel_init=model_mod._xavier,
                )(query)

            model_mod.MultiHeadAttentionAwareTemporalContext.__call__ = (
                nn.compact(attn_stub)
            )
            patches.append(
                (model_mod.MultiHeadAttentionAwareTemporalContext, "__call__", orig)
            )

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
            attention=ov.get("attention", "Corr"),
            kernel_size=ov.get("kernel_size", 3),
            batch_size=args.bs,
            compute_dtype=ov.get("dtype", "float32"),
            fuse_qkv=ov.get("fuse_qkv", True),
        )
        model = D3STN(
            cfg,
            jnp.asarray(norm_adj_matrix(adj).astype(np.float32)),
            jnp.asarray(norm_adj_matrix(sc).astype(np.float32)),
        )
        dummy = jnp.zeros((1, cfg.num_nodes, cfg.tgt_len, 3), jnp.float32)
        params = model.init(jax.random.key(0), dummy, dummy)["params"]
        enc, dec = init_lag_anchors(cfg)
        state = {
            "net": params,
            "enc_idx": jnp.asarray(enc),
            "dec_idx": jnp.asarray(dec),
        }
        tx = optax.adam(1e-3)
        opt_state = tx.init(state)
        his_span = jnp.arange(cfg.his_len, dtype=jnp.float32)
        interp = ov.get("interp", "cubic")

        def loss_fn(st, src, tgt):
            y0 = history_index(st["dec_idx"], src, his_span, interpolation=interp)
            func = lambda y_lags, y: model.apply({"params": st["net"]}, y_lags, y)
            if ov.get("no_dde"):
                y_lags = history_index(
                    st["enc_idx"], src, his_span, interpolation=interp
                )
                preds_full = func(y_lags, y0)
                delay = y_lags
            else:
                sol, delay = ddeint(
                    func, y0, jnp.arange(2.0, dtype=jnp.float32), st["enc_idx"],
                    src, his_span, "euler", fixed_solver_interp="", time_axis=0,
                )
                preds_full = sol[1]
            preds = preds_full[..., :1]
            tgt_v = tgt[..., :1]
            loss = jnp.mean(jnp.abs(preds - tgt_v))
            if ov.get("no_kl"):
                return loss
            tgt_sm = jax.nn.softmax(tgt_v, axis=-2)
            align = kl_div(jax.nn.log_softmax(delay[..., :1], axis=-2), tgt_sm)
            align = align + kl_div(jax.nn.log_softmax(preds, axis=-2), tgt_sm)
            return loss + 0.01 * align

        if ov.get("fwd_only"):

            @jax.jit
            def step(state, opt_state, src, tgt):
                return state, opt_state, loss_fn(state, src, tgt)

        else:

            @jax.jit
            def step(state, opt_state, src, tgt):
                loss, grads = jax.value_and_grad(loss_fn)(state, src, tgt)
                updates, opt_state = tx.update(grads, opt_state)
                return optax.apply_updates(state, updates), opt_state, loss

        src, tgt = jnp.asarray(src_np), jnp.asarray(tgt_np)
        compiled = step.lower(state, opt_state, src, tgt).compile()
        rec = {"variant": name, "bs": args.bs}
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            rec["gflops"] = round(ca.get("flops", 0) / 1e9, 1)
            rec["gbytes"] = round(ca.get("bytes accessed", 0) / 1e9, 1)
        except Exception:
            pass
        try:
            mem = compiled.memory_analysis()
            rec["temp_gb"] = round(mem.temp_size_in_bytes / 2**30, 2)
        except Exception:
            pass
        if args.dump_hlo and name == "full":
            with open(args.dump_hlo, "w") as f:
                f.write(compiled.as_text())
        out = compiled(state, opt_state, src, tgt)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = compiled(state, opt_state, src, tgt)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        rec["ms"] = round(float(np.median(ts) * 1e3), 2)
        rec["gbps_effective"] = round(rec.get("gbytes", 0) / (rec["ms"] / 1e3), 1)
        print(json.dumps(rec), flush=True)
        for cls, attr, orig in patches:
            setattr(cls, attr, orig)

    for name in args.variants.split(","):
        run_variant(name, VARIANTS[name])


if __name__ == "__main__":
    main()
