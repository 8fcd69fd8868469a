"""Replay a diverging D3STN epoch step-by-step to locate the first
non-finite component (round-4 rehearsal v2: train loss went NaN at epoch 11).

Resumes from the saved full-state sidecar (epoch_best = epoch 10), replays
the epoch's exact batch order (same seed+epoch shuffle), fetches the loss per
step, and on the first non-finite loss recomputes the grads and reports
per-subtree finiteness — pinpointing the subsystem (net block / lags / KL)
that blows up first.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/nan_forensics.py \
      --save_dir experiments/dress_rehearsal2 --epoch 11
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dress_rehearsal import rehearsal_traffic  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save_dir", default="experiments/dress_rehearsal2")
    p.add_argument("--epoch", type=int, default=11)
    p.add_argument("--max_steps", type=int, default=400)
    cli = p.parse_args()

    import jax
    import jax.numpy as jnp

    from paddlexde_tpu.models.d3stn import Trainer, load_config

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), os.pardir,
                     "examples", "configs", "PEMS08.json"),
        data_path="", adj_path="", sc_path="",
        dataset_name="PEMS08_REHEARSAL", batch_size=32, distribute=False,
        train_epochs=30, finetune_epochs=15,
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
    print("resumed at epoch", tr.resume_epoch, "kl_w", tr.kl_loss_weight,
          flush=True)

    epoch = cli.epoch
    lr_factor = tr.lr_schedule(epoch + 1)
    lr_net = jnp.asarray(tr.base_lr["net"] * lr_factor, jnp.float32)
    lr_lags = jnp.asarray(tr.base_lr["lags"] * lr_factor, jnp.float32)
    kl_w = jnp.asarray(tr.kl_loss_weight, jnp.float32)
    epoch_key = jax.random.fold_in(jax.random.key(cfg.seed), epoch)

    state, opt_state = tr.state, tr.opt_state
    prev_state, prev_opt = state, opt_state
    n = 0
    for s_b in tr.train_dataset.batch_starts(
        cfg.batch_size, shuffle=True, seed=cfg.seed + epoch, drop_last=True,
    ):
        if n >= cli.max_steps:
            print("no blow-up within", n, "steps")
            return
        s_dev = tr._put_starts(s_b)
        rng_b = jax.random.fold_in(epoch_key, n)
        prev_state, prev_opt = state, opt_state
        state, opt_state, loss, align = tr._train_step_idx(
            state, opt_state, s_dev, kl_w, lr_net, lr_lags, rng_b
        )
        lf, af = float(loss), float(align)
        if n % 25 == 0:
            print(f"step {n}: loss {lf:.6f} align {af:.6f}", flush=True)
        if not (np.isfinite(lf) and np.isfinite(af)):
            print(f"FIRST NON-FINITE at step {n}: loss {lf} align {af}")
            # recompute grads from the pre-step state and report per subtree
            (tot, (l2, a2)), grads = jax.value_and_grad(
                tr._loss_fn, has_aux=True
            )(prev_state, *_windows_of(tr, s_dev), kl_w, rng_b)
            print("recomputed: total", float(tot), "loss", float(l2),
                  "align", float(a2))
            flat = jax.tree_util.tree_flatten_with_path(grads)[0]
            bad = [(jax.tree_util.keystr(k), int(jnp.sum(~jnp.isfinite(v))),
                    float(jnp.max(jnp.abs(jnp.where(jnp.isfinite(v), v, 0)))))
                   for k, v in flat]
            bad.sort(key=lambda r: -r[1])
            for name, nbad, mx in bad[:20]:
                print(f"  grad {name}: nonfinite {nbad} maxfinite {mx:.3e}")
            # and the pre-step state itself
            sflat = jax.tree_util.tree_flatten_with_path(prev_state)[0]
            for k, v in sflat:
                nb = int(jnp.sum(~jnp.isfinite(v)))
                if nb:
                    print(f"  state {jax.tree_util.keystr(k)}: nonfinite {nb}")
            mx = max(
                float(jnp.max(jnp.abs(v))) for _, v in sflat
            )
            print("  max |state leaf|:", mx)
            return
        n += 1
    print("epoch completed with finite losses:", n, "steps")


def _windows_of(tr, s_dev):
    import jax

    cfg = tr.cfg
    series = tr._series

    def one(s):
        w = jax.lax.dynamic_slice_in_dim(
            series, s, cfg.his_len + cfg.tgt_len, axis=1)
        return w[:, : cfg.his_len], w[:, cfg.his_len:]

    return jax.vmap(one)(s_dev)


if __name__ == "__main__":
    main()
