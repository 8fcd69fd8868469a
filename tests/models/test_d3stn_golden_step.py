"""Golden TRAIN-STEP parity: the Trainer's loss, gradients (incl. lag
gradients) and Adam update against an independent NumPy oracle.

Round-3 extension of the forward-only golden spec (VERDICT r2 next-step 4a):
``test_d3stn_golden.py`` pins the MODEL math; this file pins the TRAINER
wiring around it — the full reference ``train_one_step`` semantics
(``example/D3STN/train_dde.py:398-470`` in DrownFish19/PaddleXDE):

  1. decoder-lag spline lookup (y0) + encoder-lag lookup (y_lags = delay),
     cubic Hermite with forward-difference slopes (``xde/base_dde.py:33-36``);
  2. ddeint's one-Euler-step damped residual update
     y1 = y0 + (f(y_lags, y0) - 1e-3*y0) (``xde/base_dde.py:55-58``);
  3. loss = MAE(y1[..., :1], tgt) + kl_weight * (KL(delay||tgt) +
     KL(preds||tgt)) with softmax over the horizon axis
     (``train_dde.py:428-452``);
  4. gradients to net AND lags — lag grads checked against central finite
     differences OF THE NUMPY SPEC (not of the jax graph);
  5. one Adam update with per-group lr (net vs lags) — optax semantics
     re-derived in NumPy.

The NumPy forward spec is imported from test_d3stn_golden (hand-derived from
the reference sources, not from this repo's flax code), so any trainer-level
drift — wrong damping, wrong KL axis, missing lag-gradient path, optimizer
mis-wiring — breaks an independent oracle, not a self-comparison.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu.models.d3stn import (
    D3STN,
    D3STNConfig,
    Trainer,
    convert_reference_state_dict,
    norm_adj_matrix,
    synthetic_traffic_npz,
)

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from test_d3stn_golden import (
    B,
    N,
    T,
    _softmax,
    golden_cfg,
    make_reference_state,
    reference_forward,
)

HIS = 64


def trainer_cfg(tmp_path, **kw):
    base = golden_cfg(**kw)
    import dataclasses

    return dataclasses.replace(
        base,
        dataset_name="SYNTH",
        batch_size=B,
        train_epochs=1,
        finetune_epochs=0,
        warmup_step=1,
        decay_step=2,
        patience=5,
        loss="mae",
        kl_loss_weight=0.01,
        save_dir=str(tmp_path),
    )


# --------------------------------------------------------------------------
# NumPy spec: spline lookup, residual step, loss
# --------------------------------------------------------------------------

def np_hermite_eval(series, queries):
    """Cubic Hermite, forward-difference slopes (last replicated), uniform
    integer knots 0..T-1 — the reference ``HistoryIndex`` spline contract."""
    s = series.astype(np.float64)
    t_len = s.shape[-2]
    m = np.concatenate([s[..., 1:, :] - s[..., :-1, :],
                        s[..., -1:, :] - s[..., -2:-1, :]], axis=-2)
    idx = np.clip(np.floor(queries).astype(np.int64), 0, t_len - 2)
    x = queries - idx
    p0 = np.take(s, idx, axis=-2)
    p1 = np.take(s, idx + 1, axis=-2)
    m0 = np.take(m, idx, axis=-2)
    m1 = np.take(m, np.clip(idx + 1, 0, t_len - 1), axis=-2)
    x = x.reshape((1,) * (s.ndim - 2) + (-1, 1))
    x2, x3 = x * x, x * x * x
    return (
        (2 * x3 - 3 * x2 + 1) * p0
        + (x3 - 2 * x2 + x) * m0
        + (-2 * x3 + 3 * x2) * p1
        + (x3 - x2) * m1
    )


def _log_softmax(x, axis):
    x = x.astype(np.float64)
    m = np.max(x, axis=axis, keepdims=True)
    return x - m - np.log(np.exp(x - m).sum(axis=axis, keepdims=True))


def _kl_mean(log_q, p):
    elem = np.where(p > 0, p * (np.log(np.maximum(p, 1e-38)) - log_q), 0.0)
    return elem.mean()


def spec_loss(state, cfg, adj_n, sc_n, enc_idx, dec_idx, src, tgt, kl_w):
    y_lags = np_hermite_eval(src, enc_idx).astype(np.float32)  # delay
    y0 = np_hermite_eval(src, dec_idx).astype(np.float32)
    f = reference_forward(state, cfg, adj_n, sc_n, y_lags, y0)  # [B,N,T,1]
    y1 = y0 + (f - 1e-3 * y0)  # ddeint damped Euler, dt=1 (broadcasts f)
    preds = y1[..., :1]
    tgt_v = tgt[..., :1]
    loss = np.abs(preds - tgt_v).mean()
    tgt_sm = _softmax(tgt_v, -2).astype(np.float64)
    align = _kl_mean(_log_softmax(y_lags[..., :1], -2), tgt_sm) + _kl_mean(
        _log_softmax(preds, -2), tgt_sm
    )
    return loss + kl_w * align


# --------------------------------------------------------------------------
# the test
# --------------------------------------------------------------------------

def test_trainer_step_matches_numpy_spec(tmp_path):
    cfg = trainer_cfg(tmp_path)
    rng = np.random.RandomState(7)

    adj = (rng.rand(N, N) < 0.5).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(N, N).astype(np.float32)
    adj_n = norm_adj_matrix(adj).astype(np.float32)
    sc_n = norm_adj_matrix(sc).astype(np.float32)

    data = synthetic_traffic_npz(num_nodes=N, seq_len=288 * 3)
    tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc)

    # swap in reference-format golden weights + fractional (non-knot) lags
    state_np = make_reference_state(cfg, rng)
    params, unmatched = convert_reference_state_dict(state_np, cfg)
    assert unmatched == []
    tr.params = jax.tree.map(jnp.asarray, params)
    enc_idx = (np.linspace(5.0, HIS - 8.0, T) + 0.37).astype(np.float32)
    dec_idx = (np.linspace(40.0, HIS - 2.0, T) + 0.21).astype(np.float32)
    tr.encoder_idx = jnp.asarray(enc_idx)
    tr.decoder_idx = jnp.asarray(dec_idx)
    tr.opt_state = tr.tx.init(tr.state)

    src, tgt = next(tr.train_dataset.batches(B))
    src, tgt = np.array(src), np.array(tgt)
    kl_w = 0.01

    # ---- 1. loss value (probe grads JITTED so they match the compiled
    # train step's grads ~1e-7 — eager op-by-op f32 drifts ~1e-3)
    want = spec_loss(state_np, cfg, adj_n, sc_n, enc_idx, dec_idx, src, tgt, kl_w)
    (got, _), grads = jax.jit(jax.value_and_grad(tr._loss_fn, has_aux=True))(
        tr.state, jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(kl_w, jnp.float32)
    )
    np.testing.assert_allclose(float(got), want, rtol=5e-4)

    # ---- 2. lag + net gradients vs central differences of the NumPy spec
    def fd_scalar(apply_eps, h):
        lp = spec_loss(*apply_eps(+h), src, tgt, kl_w)
        lm = spec_loss(*apply_eps(-h), src, tgt, kl_w)
        return (lp - lm) / (2 * h)

    def lag_probe(which, j):
        def apply_eps(eps):
            e, d = enc_idx.copy(), dec_idx.copy()
            (e if which == "enc" else d)[j] += eps
            return state_np, cfg, adj_n, sc_n, e, d
        return apply_eps

    def weight_probe(key, flat_index):
        def apply_eps(eps):
            st = dict(state_np)
            w = st[key].copy()
            w.reshape(-1)[flat_index] += eps
            st[key] = w
            return st, cfg, adj_n, sc_n, enc_idx, dec_idx
        return apply_eps

    checks = [
        (fd_scalar(lag_probe("enc", 3), 1e-2), float(grads["enc_idx"][3])),
        (fd_scalar(lag_probe("enc", 7), 1e-2), float(grads["enc_idx"][7])),
        (fd_scalar(lag_probe("dec", 5), 1e-2), float(grads["dec_idx"][5])),
        (fd_scalar(weight_probe("generator.bias", 0), 1e-3),
         float(grads["net"]["generator"]["bias"][0])),
        (fd_scalar(weight_probe("encoder.layers.0.feed_forward_gcn.alpha", 0), 1e-3),
         float(grads["net"]["enc_0"]["gcn"]["alpha"][0])),
        (fd_scalar(weight_probe("encoder_dense.weight", 0), 1e-3),
         float(grads["net"]["encoder_dense"]["kernel"][0, 0])),
    ]
    for want_g, got_g in checks:
        np.testing.assert_allclose(got_g, want_g, rtol=5e-2, atol=5e-5)

    # ---- 3. one Adam update vs a NumPy optax oracle (fresh moments,
    # per-group lr: net at lr_net, lags at lr_lags)
    lr_net, lr_lags = 1.3e-3, 2.7e-4
    new_state, _, _, _ = tr._train_step(
        tr.state, tr.opt_state, jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(kl_w, jnp.float32), jnp.asarray(lr_net, jnp.float32),
        jnp.asarray(lr_lags, jnp.float32), jax.random.key(0),
    )

    b1, b2, eps = 0.9, 0.999, 1e-8

    def adam_first_step(g):
        g = np.asarray(g, np.float64)
        mu_hat = ((1 - b1) * g) / (1 - b1)
        nu_hat = ((1 - b2) * g * g) / (1 - b2)
        return mu_hat / (np.sqrt(nu_hat) + eps)

    flat_new, _ = jax.tree_util.tree_flatten_with_path(new_state)
    flat_old = dict(jax.tree_util.tree_flatten_with_path(tr.state)[0])
    flat_g = dict(jax.tree_util.tree_flatten_with_path(grads)[0])
    flat_old = {jax.tree_util.keystr(k): v for k, v in flat_old.items()}
    flat_g = {jax.tree_util.keystr(k): v for k, v in flat_g.items()}
    assert len(flat_new) > 10
    for path, leaf in flat_new:
        key = jax.tree_util.keystr(path)
        lr = lr_lags if ("enc_idx" in key or "dec_idx" in key) else lr_net
        want_leaf = np.asarray(flat_old[key], np.float64) - lr * adam_first_step(
            flat_g[key]
        )
        np.testing.assert_allclose(
            np.asarray(leaf), want_leaf, rtol=1e-5, atol=1e-7, err_msg=key
        )
