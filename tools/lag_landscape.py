"""Lag-loss landscape probe for the dress rehearsal (round 4).

Loads the rehearsal's best checkpoint, applies a GLOBAL offset delta to the
encoder lag positions, and measures val loss per delta — the direct
observable behind the "lags migrate to the anchor" claim: if the surface has
no slope at the jitter radius, gradient descent cannot migrate them (and the
fix is a larger jitter / hotter finetune LR, not more epochs); if the minimum
is off-anchor, the net co-adapted to the jittered lags.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/lag_landscape.py \
      --save_dir experiments/dress_rehearsal [--deltas -36:37:6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dress_rehearsal import rehearsal_traffic  # noqa: E402  (same generator)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save_dir", default="experiments/dress_rehearsal")
    p.add_argument("--deltas", default="-36:37:6")
    p.add_argument("--train_epochs", type=int, default=30)
    p.add_argument("--finetune_epochs", type=int, default=15)
    cli = p.parse_args()

    import jax.numpy as jnp

    from paddlexde_tpu.models.d3stn import Trainer, load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), os.pardir,
                     "examples", "configs", "PEMS08.json"),
        data_path="", adj_path="", sc_path="",
        dataset_name="PEMS08_REHEARSAL", batch_size=32, distribute=False,
        train_epochs=cli.train_epochs, finetune_epochs=cli.finetune_epochs,
        warmup_step=6, decay_step=24, patience=10,
        save_dir=cli.save_dir, continue_training=True,
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
    enc0 = np.asarray(tr.encoder_idx).copy()
    lo, hi, step = (int(x) for x in cli.deltas.split(":"))
    out = []
    for delta in range(lo, hi, step):
        enc = np.clip(enc0 + delta, 0, cfg.his_len - 1 - cfg.tgt_len)
        tr.encoder_idx = jnp.asarray(enc.astype(np.float32))
        tr._eval_state_cache = None
        loss = tr.compute_eval_loss(epoch=delta)
        out.append({"delta": int(delta), "eval_loss": float(loss)})
        print(f"delta {delta:+4d}: eval_loss {loss:.6f}", flush=True)
    path = os.path.join(cfg.save_dir, "lag_landscape.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
