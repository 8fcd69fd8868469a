"""Train D3STN on a traffic-flow dataset (or a synthetic stand-in).

Rebuild of the reference's launch flow (``example/D3STN/train_dde.py`` +
``args.py`` in DrownFish19/PaddleXDE). With a reference ``configs/*.json`` and
the PEMS/HZME npz+csv data in place this reproduces the published training
recipe; without data files it runs on the synthetic generator so the full
pipeline is exercisable anywhere:

    python examples/train_d3stn.py --config_json configs/PEMS08.json
    python examples/train_d3stn.py --synthetic --train_epochs 5

Data parallelism: pass --distribute to shard batches over all local devices
(the TPU-native replacement for `python -m paddle.distributed.launch`).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser(description="Traffic Flow Forecasting (TPU)")
    p.add_argument("--config_json", type=str, default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--train_epochs", type=int, default=None)
    p.add_argument("--finetune_epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--distribute", action="store_true")
    p.add_argument("--seq_days", type=int, default=14, help="synthetic data length in days")
    cli = p.parse_args()

    from paddlexde_tpu.models.d3stn import Trainer, load_config, synthetic_traffic_npz
    from paddlexde_tpu.parallel import make_mesh

    overrides = {k: v for k, v in vars(cli).items()
                 if k in ("train_epochs", "finetune_epochs", "batch_size") and v is not None}
    if cli.distribute:
        overrides["distribute"] = True

    data = adj = sc = None
    if cli.synthetic:
        overrides.setdefault("dataset_name", "SYNTH")
        overrides.setdefault("num_nodes", 16)
        overrides.setdefault("his_len", 288)
        overrides.setdefault("d_model", 64)
        overrides.setdefault("d_proj", 32)
        overrides.setdefault("d_sect", 16)
        overrides.setdefault("d_adaptive", 0)
        overrides.setdefault("encoder_num_layers", 2)
        overrides.setdefault("decoder_num_layers", 2)
        overrides.setdefault("head", 4)
        overrides.setdefault("top_k", 4)
        overrides.setdefault("warmup_step", 2)
        overrides.setdefault("decay_step", 8)
        overrides.setdefault("loss", "mae")
        cfg = load_config(cli.config_json or None, **overrides)
        rng = np.random.RandomState(cfg.seed)
        data = synthetic_traffic_npz(cfg.num_nodes, seq_len=288 * cli.seq_days, seed=cfg.seed)
        adj = (rng.rand(cfg.num_nodes, cfg.num_nodes) < 0.3).astype(np.float32)
        adj = np.maximum(adj, adj.T)
        sc = rng.rand(cfg.num_nodes, cfg.num_nodes).astype(np.float32)
    else:
        cfg = load_config(cli.config_json or None, **overrides)

    mesh = None
    if cfg.distribute:
        import jax

        if jax.device_count() > 1:
            mesh = make_mesh({"data": jax.device_count()})

    trainer = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc, mesh=mesh)
    results = trainer.train()
    print("final test:", {k: v for k, v in results.items() if k != "per_horizon"})


if __name__ == "__main__":
    main()
