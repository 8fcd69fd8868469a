"""Device-resident-series batching (config.device_gather) equivalence tests.

The host path (reference DataLoader shape, ``example/D3STN/train_dde.py:96-114``
in DrownFish19/PaddleXDE) gathers [B, N, his, C] windows on the host and
uploads ~131 MB per PEMS08-scale batch; the device-gather path uploads the full
transformed series once and dynamic-slices windows inside the jitted step.
These tests pin that the two paths are the SAME computation: identical window
bits, identical training trajectory/metrics.
"""

import numpy as np
import pytest

from paddlexde_tpu.models.d3stn import (
    D3STNConfig,
    Trainer,
    TrafficFlowDataset,
    synthetic_traffic_npz,
)

N_NODES = 8


def tiny_cfg(tmp_path=None, **kw):
    defaults = dict(
        dataset_name="SYNTH", num_nodes=N_NODES, his_len=64, tgt_len=12,
        encoder_num_layers=1, decoder_num_layers=1, d_model=16, d_proj=8,
        d_sect=4, d_adaptive=0, head=2, top_k=3, attention="Corr",
        batch_size=4, train_epochs=2, finetune_epochs=1, warmup_step=1,
        decay_step=2, patience=5, loss="mae", kl_loss_weight=0.01,
        save_dir=str(tmp_path) if tmp_path else "/tmp/d3stn_test",
    )
    defaults.update(kw)
    return D3STNConfig(**defaults)


def make_graph(rng):
    adj = (rng.rand(N_NODES, N_NODES) < 0.3).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(N_NODES, N_NODES).astype(np.float32)
    return adj, sc


def test_batch_starts_matches_batches():
    """batch_starts yields exactly the window starts batches() materializes,
    in the same shuffled/dropped order, and each start reconstructs the
    (his, tgt) pair bit-for-bit from the series."""
    cfg = tiny_cfg()
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 3)
    for split in ("train", "val", "test"):
        ds = TrafficFlowDataset(cfg, split, data=data)
        kw = dict(shuffle=True, seed=7, drop_last=True)
        idx_batches = list(ds.batch_starts(4, **kw))
        host_batches = [
            (np.array(h), np.array(t)) for h, t in ds.batches(4, **kw)
        ]
        assert len(idx_batches) == len(host_batches) > 0
        for s_b, (his, tgt) in zip(idx_batches, host_batches):
            assert s_b.dtype == np.int32
            for i, s in enumerate(s_b):
                np.testing.assert_array_equal(
                    ds.data[:, s : s + cfg.his_len], his[i]
                )
                np.testing.assert_array_equal(
                    ds.data[:, s + cfg.his_len : s + cfg.his_len + cfg.tgt_len],
                    tgt[i],
                )


def test_batch_starts_process_sharding():
    """Per-process shards partition the wrap-padded order exactly like
    batches() (shared _epoch_order)."""
    cfg = tiny_cfg()
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 2)
    ds = TrafficFlowDataset(cfg, "train", data=data)
    all_starts = np.concatenate(list(ds.batch_starts(8, shuffle=True, seed=1)))
    shards = [
        np.concatenate(list(ds.batch_starts(
            8, shuffle=True, seed=1, process_index=p, process_count=2)))
        for p in range(2)
    ]
    assert len(shards[0]) == len(shards[1])
    # interleave the two strided shards back into the global order
    merged = np.empty(2 * len(shards[0]), all_starts.dtype)
    merged[0::2], merged[1::2] = shards[0], shards[1]
    np.testing.assert_array_equal(merged[: len(all_starts)], all_starts)


def test_device_gather_trains_identically(tmp_path):
    """Full two-phase training with device_gather on vs off: same losses,
    same final lags, same test metrics (the gather is the identity on the
    data — only the transfer mechanism changes)."""
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 3)
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    results = {}
    for mode in ("off", "on"):
        cfg = tiny_cfg(tmp_path / mode, device_gather=mode,
                       train_epochs=2, finetune_epochs=1)
        tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)
        assert tr.device_gather == (mode == "on")
        r = tr.train()
        results[mode] = (r, np.asarray(tr.encoder_idx).copy())
    r_on, enc_on = results["on"]
    r_off, enc_off = results["off"]
    for k in ("mae", "rmse", "mape", "smis"):
        np.testing.assert_allclose(r_on[k], r_off[k], rtol=1e-5,
                                   err_msg=f"metric {k} diverged")
    np.testing.assert_allclose(enc_on, enc_off, rtol=1e-5, atol=1e-5)


def test_device_gather_on_rejects_multiprocess():
    """'on' under a multi-process run must fail loudly (data feeding is
    per-host by design)."""
    import paddlexde_tpu.models.d3stn.trainer as trainer_mod

    cfg = tiny_cfg(device_gather="on")
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 2)
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    orig = trainer_mod.jax.process_count
    trainer_mod.jax.process_count = lambda: 2
    try:
        with pytest.raises(ValueError, match="single-process"):
            Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)
    finally:
        trainer_mod.jax.process_count = orig
