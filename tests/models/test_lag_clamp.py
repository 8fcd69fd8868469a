"""Projected lag updates: learned lags stay inside the interpolation domain.

The reference never clamps its lag tensors (``example/D3STN/train_dde.py:455``
in DrownFish19/PaddleXDE) — they only survive because they start AT the
anchors and move slowly. Observed in the round-4 dress rehearsal: a decoder
lag crossing the last knot (2015.29 over a 2015 domain) destabilized
training. The train step is now a PROJECTED Adam step: after the update,
enc/dec lags are clipped to [0, his_len-1] (deliberate deviation, documented
in trainer.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from paddlexde_tpu.models.d3stn import (
    D3STNConfig,
    Trainer,
    synthetic_traffic_npz,
)

N_NODES = 8


def test_lags_stay_in_domain_under_huge_lr(tmp_path):
    cfg = D3STNConfig(
        dataset_name="SYNTH", num_nodes=N_NODES, his_len=64, tgt_len=12,
        encoder_num_layers=1, decoder_num_layers=1, d_model=16, d_proj=8,
        d_sect=4, d_adaptive=0, head=2, top_k=3, attention="Corr",
        batch_size=4, train_epochs=1, finetune_epochs=0, warmup_step=1,
        decay_step=2, patience=5, loss="mae", kl_loss_weight=0.01,
        save_dir=str(tmp_path),
    )
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 2)
    rng = np.random.RandomState(0)
    adj = (rng.rand(N_NODES, N_NODES) < 0.3).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(N_NODES, N_NODES).astype(np.float32)
    tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)

    # decoder lags start AT the last knot (his_len-1): any upward push used
    # to leave the domain immediately. Drive with an absurd lag LR so a
    # single step would fly far out without the projection.
    s_b = next(tr.train_dataset.batch_starts(cfg.batch_size))
    state, opt_state = tr.state, tr.opt_state
    for i in range(3):
        state, opt_state, loss, _ = tr._train_step_idx(
            state, opt_state, jnp.asarray(s_b),
            jnp.asarray(0.0), jnp.asarray(1e-3), jnp.asarray(1e3),
            jax.random.key(i),
        )
    enc = np.asarray(state["enc_idx"])
    dec = np.asarray(state["dec_idx"])
    assert np.isfinite(enc).all() and np.isfinite(dec).all()
    assert enc.min() >= 0.0 and enc.max() <= cfg.his_len - 1
    assert dec.min() >= 0.0 and dec.max() <= cfg.his_len - 1
    # the Adam step actually moved them (the projection is not a freeze)
    assert not np.allclose(enc, np.asarray(tr.encoder_idx))


def test_nonfinite_step_skips_update(tmp_path):
    """A step whose total loss is non-finite must keep state/opt_state
    unchanged and report a NaN loss (the epoch loop counts + logs it)."""
    cfg = D3STNConfig(
        dataset_name="SYNTH", num_nodes=N_NODES, his_len=64, tgt_len=12,
        encoder_num_layers=1, decoder_num_layers=1, d_model=16, d_proj=8,
        d_sect=4, d_adaptive=0, head=2, top_k=3, attention="Corr",
        batch_size=4, train_epochs=1, finetune_epochs=0, warmup_step=1,
        decay_step=2, patience=5, loss="mae", kl_loss_weight=0.01,
        save_dir=str(tmp_path),
    )
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 2)
    rng = np.random.RandomState(0)
    adj = (rng.rand(N_NODES, N_NODES) < 0.3).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(N_NODES, N_NODES).astype(np.float32)
    tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)

    s_b = jnp.asarray(next(tr.train_dataset.batch_starts(cfg.batch_size)))
    state0, opt0 = tr.state, tr.opt_state
    # kl_weight = NaN poisons the total while the criterion stays finite
    state1, opt1, loss, _ = tr._train_step_idx(
        state0, opt0, s_b, jnp.asarray(np.nan), jnp.asarray(1e-3),
        jnp.asarray(1e-4), jax.random.key(0),
    )
    assert not np.isfinite(float(loss))
    for a, b in zip(jax.tree.leaves(state0), jax.tree.leaves(state1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt0), jax.tree.leaves(opt1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and a finite step does move
    state2, _, loss2, _ = tr._train_step_idx(
        state0, opt0, s_b, jnp.asarray(0.0), jnp.asarray(1e-3),
        jnp.asarray(1e-4), jax.random.key(0),
    )
    assert np.isfinite(float(loss2))
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state0), jax.tree.leaves(state2))
    )
    assert moved


def test_finite_loss_nonfinite_update_skips(tmp_path):
    """The guard must key on the UPDATED state tree, not just the loss
    total: a finite loss with a non-finite update leaf (here: a poisoned
    Adam second moment — the same shape as an inf/NaN gradient leaf or an
    f32 moment overflow) would otherwise commit NaN parameters that every
    later step then faithfully "keeps" while reporting NaN losses forever."""
    cfg = D3STNConfig(
        dataset_name="SYNTH", num_nodes=N_NODES, his_len=64, tgt_len=12,
        encoder_num_layers=1, decoder_num_layers=1, d_model=16, d_proj=8,
        d_sect=4, d_adaptive=0, head=2, top_k=3, attention="Corr",
        batch_size=4, train_epochs=1, finetune_epochs=0, warmup_step=1,
        decay_step=2, patience=5, loss="mae", kl_loss_weight=0.01,
        save_dir=str(tmp_path),
    )
    data = synthetic_traffic_npz(num_nodes=N_NODES, seq_len=288 * 2)
    rng = np.random.RandomState(0)
    adj = (rng.rand(N_NODES, N_NODES) < 0.3).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(N_NODES, N_NODES).astype(np.float32)
    tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)

    s_b = jnp.asarray(next(tr.train_dataset.batch_starts(cfg.batch_size)))
    state0 = tr.state
    # poison ONE float leaf of the optimizer state: the loss stays finite
    # (it never reads opt_state) but the Adam update for that leaf is NaN
    leaves, treedef = jax.tree.flatten(tr.opt_state)
    poisoned = False
    for i, leaf in enumerate(leaves):
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating) and arr.size > 0:
            leaves[i] = jnp.full_like(arr, jnp.nan)
            poisoned = True
            break
    assert poisoned
    opt_bad = jax.tree.unflatten(treedef, leaves)

    state1, opt1, loss, _ = tr._train_step_idx(
        state0, opt_bad, s_b, jnp.asarray(0.0), jnp.asarray(1e-3),
        jnp.asarray(1e-4), jax.random.key(0),
    )
    # the step is SKIPPED: reported loss NaN, params bit-unchanged (no NaN
    # leaked into the model), opt state kept as passed in
    assert not np.isfinite(float(loss))
    for a, b in zip(jax.tree.leaves(state0), jax.tree.leaves(state1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(state1))
