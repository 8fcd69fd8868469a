"""D3STN accuracy-parity dress rehearsal at TRUE PEMS08 scale.

The reference publishes MAE/RMSE/MAPE tables for PEMS/HZME
(``/root/reference/example/D3STN/README.md:67-107``; mirrored in BASELINE.md)
but the npz files are not distributable and this environment has zero egress
(verified: DNS resolution fails), so the parity run itself cannot execute
here. This script is the committed dress rehearsal (VERDICT r3 next-step 1):
everything the real run needs, exercised end-to-end at the REAL problem
scale on a synthetic generator with the same statistical skeleton —

  1. TRUE PEMS08 geometry: N=170 sensors, his_len=2016 (one week of
     5-minute steps), tgt_len=12, d_model=128, 2+2 layers, Corr attention
     top-k 8 — the published config (``examples/configs/PEMS08.json``),
     62 days of data, 6:2:2 split;
  2. two-phase training to convergence (cosine warmup/decay, KL alignment
     weight schedule, early stopping; finetune phase freezes the net and
     trains the lags at full LR — reference ``train_dde.py:270-304``);
  3. LAG MIGRATION, measured: the encoder lags are initialized PERTURBED
     off the weekly anchor (deterministic jitter) and the per-epoch lag
     trajectory is recorded — the two-phase mechanism must pull them back
     toward the anchor (mean |lag - anchor| strictly decreasing);
  4. checkpoint -> Predictor -> metrics end-to-end: the best checkpoint is
     reloaded through the standalone serving path and its masked metrics
     must match the Trainer's test metrics;
  5. a one-command runbook for the real data (printed + written to the
     summary), so the parity run is a single invocation the moment a
     PEMS08.npz is present.

Usage (this box — never REPLACE PYTHONPATH, the axon plugin lives in
/root/.axon_site):

  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/dress_rehearsal.py \
      --scale smoke   # tiny CPU plumbing check (~minutes; no axon plugin)
  PYTHONPATH=/root/repo:/root/.axon_site python tools/dress_rehearsal.py \
      --scale full    # TRUE PEMS08 scale on the TPU (~1-2 h; run in bg)

Real-data parity (the actual VERDICT target), once data exists:

  python tools/prepare_pems.py --data PEMS08.npz --adj distance.csv \
      --dataset PEMS08
  python examples/train_d3stn.py --config_json examples/configs/PEMS08.json
  # compare the printed test MAE/RMSE/MAPE to BASELINE.md's
  # 13.84+-0.10 / 23.75+-0.12 / 9.10+-0.09
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rehearsal_traffic(num_nodes: int, seq_len: int, seed: int = 0) -> np.ndarray:
    """Synthetic traffic with the statistical skeleton of PEMS flows.

    Unlike the library's smooth two-sinusoid generator
    (``dataset.synthetic_traffic_npz``), this one carries the structure the
    LAG mechanism exists for: a sharp double-peak daily profile (morning/
    evening rush), weekday/weekend modulation (so the WEEKLY anchor is
    genuinely more informative than the daily one), per-node amplitude/
    offset diversity, and node-mixed AR(1) innovations. Values are
    non-negative flows like the real counts. Layout [T, N, 1] float32,
    identical to the reference npz's value channel.

    The WEEKLY-ANCHORED component (round 4): a smoothed pseudo-noise series
    repeating with EXACT period 2016 (one week), autocorrelation length
    ~6 steps. Information that exists only at the weekly lag: the smooth
    daily profile is recoverable from ANY nearby lag (a net co-adapts to a
    perturbed lag init and the lag-loss landscape is then centered on the
    perturbed position — measured, tools/lag_landscape.py: eval 0.0089 at
    the jittered lags vs 0.031 at ±6 steps, minimum NOT at the anchor), but
    this component decorrelates within ~6 steps, so a lag off the weekly
    anchor LOSES it and no amount of net adaptation can recover it — the
    gradient pull on the lags that the migration measurement needs.
    """
    rng = np.random.RandomState(seed)
    t = np.arange(seq_len)
    tod = (t % 288) / 288.0  # time of day in [0, 1)
    dow = (t // 288) % 7  # day of week

    # sharp double-peak daily profile: two Gaussian rush bumps + a broad base
    def bump(center, width):
        d = np.minimum(np.abs(tod - center), 1.0 - np.abs(tod - center))
        return np.exp(-0.5 * (d / width) ** 2)

    daily = 0.25 + 1.0 * bump(8.5 / 24, 0.045) + 0.85 * bump(17.5 / 24, 0.055)
    weekly = np.where(dow >= 5, 0.55, 1.0)  # weekends run light
    base = 220.0 * daily * weekly  # [T]

    amp = 0.5 + rng.rand(num_nodes) * 1.2  # per-node scale diversity
    offset = rng.rand(num_nodes) * 40.0

    # node-mixed AR(1) innovations (spatially correlated, temporally smooth)
    mixing = rng.rand(num_nodes, num_nodes) ** 4
    mixing /= mixing.sum(1, keepdims=True)
    eps = rng.randn(seq_len, num_nodes).astype(np.float64)
    ar = np.empty_like(eps)
    ar[0] = eps[0]
    phi = 0.9
    for i in range(1, seq_len):
        ar[i] = phi * ar[i - 1] + eps[i]
    noise = (ar @ mixing.T) * 6.0

    # weekly-anchored pseudo-noise: exact period 2016, smoothed to a ~6-step
    # correlation length, per-node sign/scale so it is not a global offset
    pn = rng.randn(2016)
    kern = np.exp(-0.5 * (np.arange(-12, 13) / 3.0) ** 2)
    pn = np.convolve(np.concatenate([pn[-12:], pn, pn[:12]]), kern / kern.sum(),
                     mode="same")[12:-12]
    pn = pn / pn.std()
    reps = -(-seq_len // 2016)
    weekly_sig = np.tile(pn, reps)[:seq_len]  # [T]
    w_amp = (0.4 + rng.rand(num_nodes)) * 30.0 * np.sign(rng.randn(num_nodes))

    data = np.clip(
        base[:, None] * amp[None, :] + offset[None, :] + noise
        + weekly_sig[:, None] * w_amp[None, :],
        0, None,
    )
    return data[..., None].astype(np.float32)  # [T, N, 1]


def masked_metrics(trues, preds):
    """Overall masked MAE/RMSE/MAPE exactly as the Trainer's test loop."""
    from paddlexde_tpu.models.d3stn.metrics import MAE, MAPE, RMSE

    return {
        "mae": MAE(trues.reshape(-1, 1), preds.reshape(-1, 1)),
        "rmse": RMSE(trues.reshape(-1, 1), preds.reshape(-1, 1)),
        "mape": MAPE(trues.reshape(-1, 1), preds.reshape(-1, 1), 0.9),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--scale", choices=("smoke", "full"), default="smoke")
    p.add_argument("--out", default="")
    p.add_argument("--train_epochs", type=int, default=None)
    p.add_argument("--finetune_epochs", type=int, default=None)
    p.add_argument("--jitter_std", type=float, default=3.0,
                   help="stddev (in 5-min steps) of the lag-init perturbation")
    p.add_argument("--resume", action="store_true",
                   help="continue from the epoch_best full-state sidecar "
                        "(exact resume: params, lags, Adam moments, phase, "
                        "epoch) and append to the lag trajectory")
    cli = p.parse_args()

    from paddlexde_tpu.models.d3stn import (
        Predictor, Trainer, init_lag_anchors, load_config,
    )

    t_wall = time.time()
    if cli.scale == "full":
        # TRUE PEMS08 geometry from the published config; bs 32 is the
        # measured single-chip sweet spot (ROADMAP round 2); epochs sized
        # for synthetic convergence (early stopping does the real gating)
        cfg = load_config(
            os.path.join(os.path.dirname(__file__), os.pardir,
                         "examples", "configs", "PEMS08.json"),
            data_path="", adj_path="", sc_path="",
            dataset_name="PEMS08_REHEARSAL",
            batch_size=32, distribute=False,
            train_epochs=cli.train_epochs or 30,
            finetune_epochs=cli.finetune_epochs or 15,
            warmup_step=6, decay_step=24, patience=10,
            save_dir=cli.out or "experiments/dress_rehearsal",
            continue_training=cli.resume,
            # the migration measurement needs the finetune lags at the
            # advertised full rate; reference-parity scheduling (default)
            # leaves them at the 0.1x cosine floor (see config.py)
            finetune_fresh_schedule=True,
        )
        seq_len = 288 * 62  # PEMS08's real span is 17856 steps = 62 days
    else:
        cfg = load_config(
            None,
            dataset_name="SMOKE_REHEARSAL", num_nodes=16, his_len=288,
            tgt_len=12, d_model=64, d_proj=32, d_sect=16, d_adaptive=0,
            encoder_num_layers=2, decoder_num_layers=2, head=4, top_k=4,
            batch_size=16, train_epochs=cli.train_epochs or 3,
            finetune_epochs=cli.finetune_epochs or 2,
            warmup_step=1, decay_step=4, patience=10, loss="mae",
            kl_loss_weight=1e-3,
            save_dir=cli.out or "experiments/dress_rehearsal_smoke",
        )
        seq_len = 288 * 10

    rng = np.random.RandomState(cfg.seed)
    data = rehearsal_traffic(cfg.num_nodes, seq_len, seed=cfg.seed)
    adj = (rng.rand(cfg.num_nodes, cfg.num_nodes) < 0.06).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 1.0)
    # SCORR stand-in exactly as tools/prepare_pems.py builds it: Pearson
    # correlation of the train-split series
    t_train = int(seq_len * 0.6)
    sc = np.corrcoef(data[:t_train, :, 0].T).astype(np.float32)

    # --- perturbed lag init: the migration measurement -------------------
    enc_true, dec_true = init_lag_anchors(cfg)
    jit_rng = np.random.RandomState(cfg.seed + 1)
    jitter = jit_rng.randn(enc_true.shape[0]).astype(np.float32) * cli.jitter_std
    enc_init = np.clip(enc_true + jitter, 0, cfg.his_len - 1 - cfg.tgt_len)

    traj_path = os.path.join(cfg.save_dir, "lag_trajectory.jsonl")
    os.makedirs(cfg.save_dir, exist_ok=True)
    if not (cli.resume and os.path.exists(traj_path)):
        open(traj_path, "w").close()

    def on_epoch(epoch, tr):
        enc = np.asarray(tr.encoder_idx, np.float64)
        with open(traj_path, "a") as f:
            f.write(json.dumps({
                "epoch": int(epoch),
                "phase": "finetune" if tr.finetune else "main",
                "enc_idx": enc.tolist(),
                "dec_idx": np.asarray(tr.decoder_idx, np.float64).tolist(),
                "dist_to_anchor": float(np.mean(np.abs(enc - enc_true))),
            }) + "\n")

    trainer = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc,
                      epoch_callback=on_epoch, enc_idx_init=enc_init)
    results = trainer.train()

    # --- lag migration analysis ------------------------------------------
    traj = [json.loads(line) for line in open(traj_path)]
    d0 = float(np.mean(np.abs(enc_init - enc_true)))
    d_end = traj[-1]["dist_to_anchor"] if traj else d0
    d_best = min((r["dist_to_anchor"] for r in traj), default=d0)

    # --- checkpoint -> Predictor -> metrics e2e ---------------------------
    predictor = Predictor.from_checkpoint(
        cfg, trainer.save_path, adj, sc,
        scaler=trainer.test_dataset, batch_size=cfg.batch_size,
    ).warmup()
    ds = trainer.test_dataset
    # device-resident bulk forecast: one ~MBs series upload + 4B/sample of
    # start indices (the per-window host path shipped ~131 MB/batch over the
    # tunnel and dominated the rehearsal wall-clock)
    preds = predictor.predict_series(ds.data, [w[0] for w in ds.windows])
    trues = np.stack(
        [ds.data[:, tb:te, :1] for (_, _, tb, te) in ds.windows], axis=0
    )
    trues = ds.inverse_transform(trues)
    pred_metrics = masked_metrics(trues[..., 0], preds)
    gaps = {k: abs(pred_metrics[k] - results[k]) / max(abs(results[k]), 1e-9)
            for k in ("mae", "rmse", "mape")}

    summary = {
        "scale": cli.scale,
        "geometry": {"num_nodes": cfg.num_nodes, "his_len": cfg.his_len,
                     "tgt_len": cfg.tgt_len, "d_model": cfg.d_model,
                     "layers": [cfg.encoder_num_layers, cfg.decoder_num_layers],
                     "seq_len": seq_len, "batch_size": cfg.batch_size},
        "epochs_run": len(traj),
        "trainer_test": {k: float(results[k]) for k in ("mae", "rmse", "mape", "smis")},
        "predictor_test": {k: float(v) for k, v in pred_metrics.items()},
        "predictor_vs_trainer_relgap": {k: float(v) for k, v in gaps.items()},
        "lag_migration": {
            "jitter_std": cli.jitter_std,
            "dist_to_anchor_init": d0,
            "dist_to_anchor_final": float(d_end),
            "dist_to_anchor_best": float(d_best),
            "migrated": bool(d_end < d0),
        },
        "wall_seconds": time.time() - t_wall,
        "runbook_real_data": [
            "python tools/prepare_pems.py --data PEMS08.npz --adj distance.csv --dataset PEMS08",
            "python examples/train_d3stn.py --config_json examples/configs/PEMS08.json",
            "compare printed test MAE/RMSE/MAPE to BASELINE.md (13.84/23.75/9.10 +-sigma)",
        ],
    }
    out_json = os.path.join(cfg.save_dir, f"dress_rehearsal_{cli.scale}.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))

    ok = summary["lag_migration"]["migrated"] and max(gaps.values()) < 1e-3
    print(f"DRESS REHEARSAL {'PASS' if ok else 'ATTENTION'}: "
          f"lag dist {d0:.3f} -> {d_end:.3f}, "
          f"predictor/trainer max relgap {max(gaps.values()):.2e}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
