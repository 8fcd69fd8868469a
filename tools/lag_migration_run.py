"""Lag-only migration endurance run: how fast do the learned lags traverse
a perturbed init when ONLY they train?

Resumes a rehearsal checkpoint (net frozen: lr_net = 0), drives the jitted
train step with a FIXED boosted lag LR (a traced scalar — no recompile), and
logs mean |lag - anchor| per epoch. The reference-parity schedule's measured
migration rate is ~0.0015 index-steps/epoch (cosine-floored finetune LR +
batch-to-batch gradient sign noise); this tool measures the rate as a
function of LR so the mechanism's speed limit is a number, not a guess.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/lag_migration_run.py \
      --save_dir experiments/dress_rehearsal3 --epochs 40 --lr_lags 1e-2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dress_rehearsal import rehearsal_traffic  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save_dir", default="experiments/dress_rehearsal3")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--lr_lags", type=float, default=1e-2)
    cli = p.parse_args()

    import jax

    from _cache import enable as _enable_cache
    _enable_cache(jax)

    import jax.numpy as jnp

    from paddlexde_tpu.models.d3stn import Trainer, init_lag_anchors, load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), os.pardir,
                     "examples", "configs", "PEMS08.json"),
        data_path="", adj_path="", sc_path="",
        dataset_name="PEMS08_REHEARSAL", batch_size=32, distribute=False,
        train_epochs=30, finetune_epochs=40, warmup_step=6, decay_step=24,
        patience=10, save_dir=cli.save_dir, continue_training=True,
    )
    seq_len = 288 * 62
    rng = np.random.RandomState(cfg.seed)
    data = rehearsal_traffic(cfg.num_nodes, seq_len, seed=cfg.seed)
    adj = (rng.rand(cfg.num_nodes, cfg.num_nodes) < 0.06).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 1.0)
    t_train = int(seq_len * 0.6)
    sc = np.corrcoef(data[:t_train, :, 0].T).astype(np.float32)

    tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)
    enc_true, _ = init_lag_anchors(cfg)
    state, opt_state = tr.state, tr.opt_state
    kl_w = jnp.asarray(tr.kl_loss_weight, jnp.float32)
    lr_net = jnp.asarray(0.0, jnp.float32)
    lr_lags = jnp.asarray(cli.lr_lags, jnp.float32)

    out_path = os.path.join(cfg.save_dir, "lag_migration_run.jsonl")
    d0 = float(np.mean(np.abs(np.asarray(state["enc_idx"]) - enc_true)))
    print(f"start dist {d0:.4f}  lr_lags {cli.lr_lags}", flush=True)
    with open(out_path, "w") as fout:
        for epoch in range(cli.epochs):
            ekey = jax.random.fold_in(jax.random.key(cfg.seed), 10_000 + epoch)
            n = 0
            for s_b in tr.train_dataset.batch_starts(
                cfg.batch_size, shuffle=True, seed=cfg.seed + 10_000 + epoch,
                drop_last=True,
            ):
                state, opt_state, loss, _ = tr._train_step_idx(
                    state, opt_state, tr._put_starts(s_b), kl_w, lr_net,
                    lr_lags, jax.random.fold_in(ekey, n),
                )
                n += 1
            enc = np.asarray(state["enc_idx"], np.float64)
            dist = float(np.mean(np.abs(enc - enc_true)))
            rec = {"epoch": epoch, "dist": dist,
                   "loss": float(loss), "enc": enc.tolist()}
            fout.write(json.dumps(rec) + "\n")
            fout.flush()
            print(f"epoch {epoch}: dist {dist:.4f} (last loss {float(loss):.5f})",
                  flush=True)
    print(f"dist {d0:.4f} -> {dist:.4f} over {cli.epochs} lag-only epochs "
          f"at lr {cli.lr_lags}", flush=True)


if __name__ == "__main__":
    main()
