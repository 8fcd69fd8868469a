"""D3STN workload tests on synthetic traffic data (CPU, tiny shapes).

The reference has no model tests at all; these pin: forward shapes, the full
jitted train step (spline lag lookup -> ddeint one-step residual -> KL-
augmented loss -> grads to net AND lag positions), the two-phase trainer loop
with eval/test metrics, checkpoint round-trip, and config parity with the
reference JSON schema.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu.models.d3stn import (
    D3STN,
    D3STNConfig,
    Trainer,
    TrafficFlowDataset,
    init_lag_anchors,
    load_config,
    norm_adj_matrix,
    synthetic_traffic_npz,
)

N_NODES = 8


def tiny_cfg(tmp_path=None, **kw):
    defaults = dict(
        dataset_name="SYNTH",
        num_nodes=N_NODES,
        his_len=64,
        tgt_len=12,
        encoder_num_layers=1,
        decoder_num_layers=1,
        d_model=16,
        d_proj=8,
        d_sect=4,
        d_adaptive=0,
        head=2,
        top_k=3,
        attention="Corr",
        batch_size=4,
        train_epochs=2,
        finetune_epochs=1,
        warmup_step=1,
        decay_step=2,
        patience=5,
        loss="mae",
        kl_loss_weight=0.01,
        save_dir=str(tmp_path) if tmp_path else "/tmp/d3stn_test",
    )
    defaults.update(kw)
    return D3STNConfig(**defaults)


def make_graph(rng):
    adj = (rng.rand(N_NODES, N_NODES) < 0.3).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(N_NODES, N_NODES).astype(np.float32)
    return adj, sc


def test_config_validates_dims():
    with pytest.raises(ValueError):
        D3STNConfig(d_model=100, d_proj=32, d_sect=32, d_adaptive=32)


def test_config_loads_reference_json(tmp_path):
    ref_like = {
        "dataset_name": "PEMS08", "num_nodes": 170, "his_len": 2016,
        "tgt_len": 12, "d_model": 128, "d_proj": 80, "d_sect": 24,
        "d_adaptive": 0, "attention": "Corr", "head": 8, "top_k": 8,
        "with_adj": 0, "with_sc": 1, "scale": 1, "solver": "euler",
        "unknown_future_key": 42,
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(ref_like))
    cfg = load_config(str(p))
    assert cfg.num_nodes == 170 and cfg.with_sc is True and cfg.with_adj is False


def test_dataset_windows_and_scaling():
    cfg = tiny_cfg()
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 4)
    ds = TrafficFlowDataset(cfg, "train", data=data)
    his, tgt = ds[0]
    assert his.shape == (N_NODES, cfg.his_len, 3)
    assert tgt.shape == (N_NODES, cfg.tgt_len, 3)
    # scaled channel in [-1, 1]; index channels are dow/tod
    assert his[..., 0].min() >= -1.0 - 1e-6 and his[..., 0].max() <= 1.0 + 1e-6
    assert his[..., 1].max() <= 6 and his[..., 2].max() <= 287
    # inverse transform restores magnitude
    rt = ds.inverse_transform(his[..., :1])
    assert rt.max() > 10


def test_hzme_filter():
    cfg = tiny_cfg(dataset_name="HZME_SYNTH")
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 4)
    ds = TrafficFlowDataset(cfg, "train", data=data)
    for _, _, tb, te in ds.windows:
        assert tb % 288 >= 72 and te % 288 >= 72


def test_model_forward_shapes():
    cfg = tiny_cfg()
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    model = D3STN(cfg, jnp.asarray(norm_adj_matrix(adj)), jnp.asarray(norm_adj_matrix(sc)))
    src = jnp.asarray(rng.rand(2, N_NODES, 12, 3).astype(np.float32))
    tgt = jnp.asarray(rng.rand(2, N_NODES, cfg.tgt_len, 3).astype(np.float32))
    params = model.init(jax.random.key(0), src, tgt)["params"]
    out = model.apply({"params": params}, src, tgt)
    assert out.shape == (2, N_NODES, cfg.tgt_len, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_adaptive_embedding_and_vanilla_attention():
    cfg = tiny_cfg(d_model=20, d_proj=8, d_sect=4, d_adaptive=4, attention="Vanilla")
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    model = D3STN(cfg, jnp.asarray(norm_adj_matrix(adj)), jnp.asarray(norm_adj_matrix(sc)))
    src = jnp.asarray(rng.rand(2, N_NODES, cfg.tgt_len, 3).astype(np.float32))
    params = model.init(jax.random.key(0), src, src)["params"]
    out = model.apply({"params": params}, src, src)
    assert out.shape == (2, N_NODES, cfg.tgt_len, 1)


def test_trainer_end_to_end(tmp_path):
    """Full two-phase loop on synthetic data: losses finite & improving,
    lags move in finetune, metrics computed, checkpoint round-trips."""
    cfg = tiny_cfg(tmp_path)
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 4)
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    trainer = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)

    enc0 = np.asarray(trainer.encoder_idx).copy()
    results = trainer.train()

    assert np.isfinite(results["mae"]) and results["mae"] > 0
    assert len(results["per_horizon"]) == cfg.tgt_len
    # lag positions moved (learnable delay selection works end to end)
    assert not np.allclose(np.asarray(trainer.encoder_idx), enc0)

    # checkpoint round-trip
    trainer.save()
    enc_after = np.asarray(trainer.encoder_idx).copy()
    trainer.encoder_idx = jnp.zeros_like(trainer.encoder_idx)
    trainer.load()
    np.testing.assert_allclose(np.asarray(trainer.encoder_idx), enc_after)


def test_lag_anchor_initialization():
    enc, dec = init_lag_anchors(tiny_cfg())
    assert enc.shape == (12,) and dec.shape == (12,)
    np.testing.assert_allclose(dec, 63.0)  # his_len - 1
    np.testing.assert_allclose(enc, np.arange(52, 64))  # hour anchor

    cfg = tiny_cfg(his_len=2016)
    enc, _ = init_lag_anchors(cfg)
    np.testing.assert_allclose(enc, np.arange(0, 12))  # week anchor


def test_reference_checkpoint_converter():
    """Key mapping covers the core layers and lands values at the right flax
    paths (conv kernels transposed to [kh, kw, in, out])."""
    from paddlexde_tpu.models.d3stn import convert_reference_state_dict

    cfg = tiny_cfg()
    rng = np.random.RandomState(0)
    k = cfg.kernel_size
    d = cfg.d_model
    ref_state = {
        "encoder_dense.weight": rng.randn(1, cfg.d_proj).astype(np.float32),
        "encoder_dense.bias": np.zeros(cfg.d_proj, np.float32),
        "temporal_section_week.embedding.weight": rng.randn(7, cfg.d_sect).astype(np.float32),
        "encoder.layers.0.self_attn.query_conv.weight": rng.randn(d, d, 1, k).astype(np.float32),
        "encoder.layers.0.feed_forward_gcn.linear.weight": rng.randn(d, d).astype(np.float32),
        "encoder.layers.0.feed_forward_gcn.alpha": np.asarray([0.7], np.float32),
        "encoder.norm.weight": np.ones(d, np.float32),
        "generator.weight": rng.randn(d, 1).astype(np.float32),
        "generator.bias": np.zeros(1, np.float32),
        "some.unknown.key": np.zeros(3, np.float32),
    }
    params, unmatched = convert_reference_state_dict(ref_state, cfg)
    assert unmatched == ["some.unknown.key"]
    assert params["encoder_dense"]["kernel"].shape == (1, cfg.d_proj)
    # conv kernel transposed to flax layout [1, k, in, out]
    assert params["enc_0"]["self_attn"]["query_conv"]["Conv_0"]["kernel"].shape == (1, k, d, d)
    np.testing.assert_allclose(params["enc_0"]["gcn"]["alpha"], [0.7])


def test_dropout_active_in_training(tmp_path):
    """With dropout > 0 the train step must be stochastic (different rngs ->
    different losses) while eval stays deterministic."""
    cfg = tiny_cfg(tmp_path, dropout=0.3, train_epochs=1, finetune_epochs=0)
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 2)
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    trainer = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)
    src, tgt = next(trainer.train_dataset.batches(cfg.batch_size))
    src, tgt = jnp.asarray(src), jnp.asarray(tgt)
    args = (trainer.state, trainer.opt_state, src, tgt,
            jnp.asarray(0.0), jnp.asarray(1e-3), jnp.asarray(1e-4))
    _, _, l1, _ = trainer._train_step(*args, jax.random.key(1))
    _, _, l2, _ = trainer._train_step(*args, jax.random.key(2))
    assert float(l1) != float(l2)  # dropout noise
    # eval is deterministic
    e1 = trainer._eval_step(trainer.state, src, tgt)
    e2 = trainer._eval_step(trainer.state, src, tgt)
    assert float(e1) == float(e2)


def test_dropout_runs_in_attention_kernel(tmp_path):
    """attn_impl='pallas' + dropout no longer falls back to XLA (round 3:
    the kernel takes an explicit keep mask): the train step is stochastic
    through the KERNEL path, raises no fallback warning, and eval (dropout
    off) bit-matches the XLA implementation."""
    import warnings

    cfg = tiny_cfg(tmp_path, dropout=0.3, train_epochs=1, finetune_epochs=0,
                   attn_impl="pallas", batch_size=8)
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 2)
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    trainer = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)
    src, tgt = next(trainer.train_dataset.batches(cfg.batch_size))
    src, tgt = jnp.asarray(src), jnp.asarray(tgt)
    args = (trainer.state, trainer.opt_state, src, tgt,
            jnp.asarray(0.0), jnp.asarray(1e-3), jnp.asarray(1e-4))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any kernel-fallback warning fails
        _, _, l1, _ = trainer._train_step(*args, jax.random.key(1))
        _, _, l2, _ = trainer._train_step(*args, jax.random.key(2))
    assert float(l1) != float(l2)  # dropout noise flows through the kernel

    cfg_x = tiny_cfg(tmp_path, dropout=0.3, train_epochs=1, finetune_epochs=0,
                     attn_impl="xla", batch_size=8)
    tr_x = Trainer(cfg_x, data=data, adj_matrix=adj, sc_matrix=sc)
    e_k = trainer._eval_step(trainer.state, src, tgt)
    e_x = tr_x._eval_step(trainer.state, src, tgt)
    np.testing.assert_allclose(float(e_k), float(e_x), rtol=2e-5)


def test_bfloat16_compute_dtype():
    """bf16 compute: finite outputs close to the f32 model (same params)."""
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    src = jnp.asarray(rng.rand(2, N_NODES, 12, 3).astype(np.float32))

    outs = {}
    for cd in ("float32", "bfloat16"):
        cfg = tiny_cfg(compute_dtype=cd)
        model = D3STN(cfg, jnp.asarray(norm_adj_matrix(adj).astype(np.float32)),
                      jnp.asarray(norm_adj_matrix(sc).astype(np.float32)))
        params = model.init(jax.random.key(0), src, src)["params"]
        outs[cd] = np.asarray(model.apply({"params": params}, src, src), np.float32)
    assert np.all(np.isfinite(outs["bfloat16"]))
    # bf16 (~3 significant digits) compounds through ~10 nonlinear layers:
    # measured mean rel dev ~1.5%, worst element ~11% on this tiny model
    denom = np.maximum(np.abs(outs["float32"]), 0.1)
    rel = np.abs(outs["bfloat16"] - outs["float32"]) / denom
    assert np.mean(rel) < 0.03 and np.max(rel) < 0.25, (rel.mean(), rel.max())


def test_positional_embeddings():
    """SpatialPositionalEmbedding (GCN-smoothed) and the sinusoidal
    TemporalPositionalEmbedding table — present for inventory parity."""
    from paddlexde_tpu.models.d3stn.model import (
        SpatialPositionalEmbedding,
        temporal_positional_encoding,
    )

    cfg = tiny_cfg()
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    adj_n = jnp.asarray(norm_adj_matrix(adj).astype(np.float32))
    sc_n = jnp.asarray(norm_adj_matrix(sc).astype(np.float32))
    mod = SpatialPositionalEmbedding(cfg, adj_n, sc_n)
    x = jnp.zeros((2, N_NODES, 12, 3))
    params = mod.init(jax.random.key(0), x)["params"]
    emb = mod.apply({"params": params}, x)
    assert emb.shape == (1, N_NODES, 1, cfg.d_proj)

    pe = temporal_positional_encoding(64, 16)
    assert pe.shape == (1, 1, 64, 16)
    # sin/cos structure: position 0 rows are sin(0)=0 at even dims
    np.testing.assert_allclose(pe[0, 0, 0, 0::2], 0.0, atol=1e-7)


def test_full_state_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg(tmp_path, train_epochs=1, finetune_epochs=0)
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 2)
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)
    src, tgt = next(tr.train_dataset.batches(cfg.batch_size))
    out = tr._train_step(tr.state, tr.opt_state, jnp.asarray(src), jnp.asarray(tgt),
                         jnp.asarray(0.0), jnp.asarray(1e-3), jnp.asarray(1e-4),
                         jax.random.key(0))
    tr._set_state(out[0]); tr.opt_state = out[1]
    tr.save(full_state=True)
    opt_before = jax.tree.leaves(tr.opt_state)
    tr.opt_state = jax.tree.map(jnp.zeros_like, tr.opt_state)
    tr.load()
    for a, b in zip(jax.tree.leaves(tr.opt_state), opt_before):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_continue_training_resumes_full_state(tmp_path):
    """cfg.continue_training=True restores optimizer moments, phase flag and
    next epoch from a full-state checkpoint (the resume flow end-to-end)."""
    cfg = tiny_cfg(tmp_path, train_epochs=1, finetune_epochs=0)
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 2)
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)
    src, tgt = next(tr.train_dataset.batches(cfg.batch_size))
    out = tr._train_step(tr.state, tr.opt_state, jnp.asarray(src), jnp.asarray(tgt),
                         jnp.asarray(0.0), jnp.asarray(1e-3), jnp.asarray(1e-4),
                         jax.random.key(0))
    tr._set_state(out[0]); tr.opt_state = out[1]
    tr.finetune = True
    # the train loop's best-checkpoint flow: epoch-tagged AND epoch_best both
    # carry the full-state sidecar (epoch_best records the epoch via at_epoch —
    # without it the resume path silently degraded to fresh Adam moments)
    tr.save(epoch=3, full_state=True)
    tr.save(full_state=True, at_epoch=3)
    assert os.path.exists(tr._ckpt_files(None)[0] + ".opt")
    opt_before = jax.tree.leaves(tr.opt_state)

    cfg2 = tiny_cfg(tmp_path, train_epochs=1, finetune_epochs=0,
                    continue_training=True)
    tr2 = Trainer(cfg2, data=data, adj_matrix=adj, sc_matrix=sc)
    assert tr2.finetune is True
    assert tr2.base_lr["net"] == 0.0  # finetune-phase LRs re-derived
    assert tr2.resume_epoch == 4
    for a, b in zip(jax.tree.leaves(tr2.opt_state), opt_before):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_test_metrics_collect_distinct_batches(tmp_path):
    """compute_test_loss must snapshot targets per batch: the dataset reuses
    its batch buffers, so aliasing would collapse all collected batches into
    the last one (regression: MAE jumped 14 -> 52 on TPU before the copy)."""
    cfg = tiny_cfg(tmp_path, batch_size=2)
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 3)
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)

    # ground truth assembled per-item (no buffer reuse)
    want = np.stack([tr.test_dataset[i][1][..., :1] for i in range(len(tr.test_dataset))])

    collected = []
    for src, tgt in tr.test_dataset.batches(cfg.batch_size):
        collected.append(np.array(tgt[..., :1]))
    got = np.concatenate(collected, 0)
    np.testing.assert_array_equal(got, want)

    res = tr.compute_test_loss()
    # recompute the overall MAE independently from per-item data
    preds = []
    for src, tgt in tr.test_dataset.batches(cfg.batch_size):
        preds.append(np.asarray(tr._pred_step(tr.state, jnp.asarray(src))))
    preds = tr.test_dataset.inverse_transform(np.concatenate(preds, 0))
    trues = tr.test_dataset.inverse_transform(want)
    from paddlexde_tpu.models.d3stn import MAE

    np.testing.assert_allclose(res["mae"], MAE(trues.reshape(-1, 1), preds.reshape(-1, 1)), rtol=1e-6)


def test_batches_process_sharding():
    """Per-process strided shard of the global order (DistributedBatchSampler
    role, ref train_dde.py:99-114): disjoint-up-to-wrap-padding coverage, equal
    counts per process, shared-seed consistency."""
    cfg = tiny_cfg()
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 4)
    ds = TrafficFlowDataset(cfg, "val", data=data)
    n = len(ds)  # 218 at this seq_len
    assert n > 4 and n % 4 != 0  # wrap-padding must engage

    def collect(pi, pc):
        sigs = []
        for his, tgt in ds.batches(2, shuffle=True, seed=7, process_index=pi,
                                   process_count=pc):
            for b in range(his.shape[0]):
                sigs.append(his[b].tobytes())
        return sigs

    shards = [collect(pi, 4) for pi in range(4)]
    # equal sample counts per process (collectives can't desync)
    assert len({len(s) for s in shards}) == 1
    total = -(-n // 4) * 4
    assert sum(len(s) for s in shards) == total
    # union covers the whole epoch (duplicates only from wrap padding)
    all_sigs = [s for sh in shards for s in sh]
    full = collect(0, 1)
    assert set(all_sigs) == set(full)
    assert len(set(all_sigs)) == n
    # single-process default unchanged
    assert len(full) == n


def test_trainer_under_mesh_matches_single_device(tmp_path):
    """Trainer with an 8-device data mesh: same two-phase e2e flow as
    mesh=None, ragged eval/test tail batches included (replicated-put
    fallback), and matching losses/metrics (VERDICT r1 next-step 3)."""
    from paddlexde_tpu.parallel import make_mesh

    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 4)
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)

    results, step_loss = {}, {}
    for name, mesh in (("none", None), ("mesh8", make_mesh({"data": 8}))):
        cfg = tiny_cfg(tmp_path / name, batch_size=8, train_epochs=1,
                       finetune_epochs=1)
        tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc, mesh=mesh)
        if mesh is not None:
            # eval set must have a ragged tail so the replicated fallback runs
            assert len(tr.val_dataset) % 8 != 0
        # one fixed train step: sharded-batch grads must match single-device
        # math tightly (XLA's psum vs one-device reduction order only)
        src, tgt = next(tr.train_dataset.batches(8))
        out = tr._train_step(
            tr.state, tr.opt_state, tr._device_put(np.array(src)),
            tr._device_put(np.array(tgt)), jnp.asarray(0.01, jnp.float32),
            jnp.asarray(1e-3, jnp.float32), jnp.asarray(1e-4, jnp.float32),
            jax.random.key(0),
        )
        step_loss[name] = float(out[2])
        results[name] = tr.train()

    # the real "same math" proof: one sharded-batch step == single-device to
    # float tolerance (only XLA's psum vs one-device reduction order differs)
    np.testing.assert_allclose(step_loss["mesh8"], step_loss["none"], rtol=1e-5)
    # over two full epochs that reduction-order noise compounds through
    # chaotic training dynamics (measured drift 0.9-5% depending on the
    # compiled graph), so the end-of-run check is a same-ballpark band, not
    # an equality: both runs must converge to healthy metrics of the same
    # scale
    ratio = results["mesh8"]["mae"] / results["none"]["mae"]
    assert 0.8 < ratio < 1.25, (results["mesh8"]["mae"], results["none"]["mae"])
    ratio = results["mesh8"]["rmse"] / results["none"]["rmse"]
    assert 0.8 < ratio < 1.25, (results["mesh8"]["rmse"], results["none"]["rmse"])


def test_conv_impl_and_remat_equivalence():
    """conv_impl='shifted_matmul' (K time-shifted GEMMs) and remat=True are
    numerically identical to the default conv path with the SAME param tree
    (checkpoint-compatible), so the perf knobs can never change results."""
    import jax.tree_util as jtu

    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    adj_n = jnp.asarray(norm_adj_matrix(adj).astype(np.float32))
    sc_n = jnp.asarray(norm_adj_matrix(sc).astype(np.float32))
    src = jnp.asarray(rng.rand(2, N_NODES, 12, 3).astype(np.float32))

    params0, base, struct0 = None, None, None
    for impl, remat, fuse in (("conv", False, True), ("shifted_matmul", False, True),
                              ("conv", True, True), ("shifted_matmul", True, True),
                              ("conv", False, False)):
        cfg = tiny_cfg(conv_impl=impl, remat=remat, fuse_qkv=fuse)
        m = D3STN(cfg, adj_n, sc_n)
        if params0 is None:
            params0 = m.init(jax.random.key(0), src, src)["params"]
            struct0 = jtu.tree_structure(params0)
        else:
            assert jtu.tree_structure(
                m.init(jax.random.key(0), src, src)["params"]
            ) == struct0
        out = np.asarray(m.apply({"params": params0}, src, src))
        if base is None:
            base = out
        else:
            np.testing.assert_allclose(out, base, rtol=1e-5, atol=1e-5)


def test_native_gather_matches_numpy_fallback(monkeypatch):
    """ops/native's OpenMP window gather yields byte-identical batches to the
    numpy copy loop (measured 7.4x faster at PEMS08 scale) — and the dataset
    degrades gracefully when the native library is unavailable."""
    cfg = tiny_cfg()
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 3)
    ds = TrafficFlowDataset(cfg, "train", data=data)

    def collect():
        return [
            (np.array(h), np.array(t))
            for h, t in ds.batches(4, shuffle=True, seed=3)
        ]

    native = collect()
    import paddlexde_tpu.ops.native as native_mod

    monkeypatch.setattr(native_mod, "gather_windows", lambda *a, **k: False)
    fallback = collect()
    assert len(native) == len(fallback) > 0
    for (h1, t1), (h2, t2) in zip(native, fallback):
        np.testing.assert_array_equal(h1, h2)
        np.testing.assert_array_equal(t1, t2)
    # time-major layout too
    monkeypatch.undo()
    h_n = [np.array(h) for h, _ in ds.batches(4, time_major=True)]
    monkeypatch.setattr(native_mod, "gather_windows", lambda *a, **k: False)
    h_f = [np.array(h) for h, _ in ds.batches(4, time_major=True)]
    for a, b in zip(h_n, h_f):
        np.testing.assert_array_equal(a, b)


def test_config_validates_impl_knobs():
    for kw in ({"conv_impl": "im2col"}, {"gcn_impl": "fast"},
               {"attn_impl": "flash"}, {"attention": "corr"}):
        with pytest.raises(ValueError, match=next(iter(kw))):
            tiny_cfg(**kw)


def test_trainer_under_mesh_keeps_kernel_impls():
    """Trainer(mesh=...) must NOT downgrade the kernel impls: ops/partition.py
    gives the Pallas kernels the SPMD partitioning rule pallas_call lacks, so
    'auto'/'pallas' stay as configured under a mesh (the reference's fast path
    never downgrades under DataParallel either, train_dde.py:201-202). The
    kernel path under the 8-device mesh must match single-device numerics:
    one pallas-forced train step (interpret kernels on CPU), loss compared."""
    from paddlexde_tpu.parallel import make_mesh

    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 3)
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    tr = Trainer(tiny_cfg(), data=data, adj_matrix=adj, sc_matrix=sc,
                 mesh=make_mesh({"data": 8}))
    assert tr.cfg.attn_impl == "auto" and tr.cfg.gcn_impl == "auto"

    loss = {}
    for name, mesh in (("none", None), ("mesh8", make_mesh({"data": 8})),
                       ("mesh4x2", make_mesh({"data": 4, "space": 2}))):
        cfg = tiny_cfg(attn_impl="pallas", gcn_impl="pallas", batch_size=8)
        t = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc, mesh=mesh)
        src, tgt = next(t.train_dataset.batches(8))
        batch = t._device_put(np.array(src)), t._device_put(np.array(tgt))
        if name == "mesh4x2":
            # 2D data x space: the sensor axis must actually shard
            from jax.sharding import PartitionSpec as P

            assert batch[0].sharding.spec == P("data", "space")
        out = t._train_step(
            t.state, t.opt_state, *batch, jnp.asarray(0.01, jnp.float32),
            jnp.asarray(1e-3, jnp.float32), jnp.asarray(1e-4, jnp.float32),
            jax.random.key(0),
        )
        loss[name] = float(out[2])
    np.testing.assert_allclose(loss["mesh8"], loss["none"], rtol=1e-6)
    np.testing.assert_allclose(loss["mesh4x2"], loss["none"], rtol=1e-6)


def test_predictor_matches_trainer(tmp_path):
    """Predictor.from_checkpoint == the trainer's pred step on the same
    checkpoint: identical model-space outputs, scaler-inverse applied, and
    the ragged-batch zero-pad path returns only the real rows."""
    from paddlexde_tpu.models.d3stn import Predictor

    cfg = tiny_cfg(tmp_path, train_epochs=1, finetune_epochs=0)
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 3)
    rng = np.random.RandomState(0)
    adj, sc = make_graph(rng)
    tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)
    tr.train()
    tr.save()

    pred = Predictor.from_checkpoint(
        cfg, tr.save_path, adj, sc, scaler=tr.test_dataset.scaler, batch_size=4
    ).warmup()
    src, _ = next(tr.test_dataset.batches(7))  # ragged (7 = 4 + 3)
    src = np.array(src)
    got = pred(src)
    assert got.shape == (7, N_NODES, cfg.tgt_len)
    want = np.asarray(tr._pred_step(tr.state, jnp.asarray(src)))[..., 0]
    want = tr.test_dataset.scaler.inverse_transform(want[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="does not match"):
        pred(src[:, :, : cfg.his_len - 1])

    # device-resident bulk path: predict_series(series, starts) must equal
    # the per-window host path BIT-FOR-BIT (same slices, same program shape;
    # only the transfer pattern differs) — incl. the repeated-last ragged tail
    ds = tr.test_dataset
    starts = [w[0] for w in ds.windows][:7]
    got_idx = pred.predict_series(ds.data, starts)
    host_windows = np.stack(
        [ds.data[:, s : s + cfg.his_len] for s in starts], axis=0
    )
    np.testing.assert_array_equal(got_idx, pred(host_windows))
    with pytest.raises(ValueError, match="out of range"):
        pred.predict_series(ds.data, [ds.data.shape[1]])
    assert pred.predict_series(ds.data, []).shape == (0, N_NODES, cfg.tgt_len)
