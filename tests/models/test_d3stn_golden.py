"""Golden numerical parity: the flax D3STN + checkpoint converter must
reproduce the REFERENCE model math exactly (to f32 tolerance).

The reference ships a golden-output check in its own converter
(``example/D3STN/convert2paddle.py:97-128`` in DrownFish19/PaddleXDE); the
real PEMS/HZME checkpoints and paddle itself are unavailable in this
environment, so the oracle here is an independent NumPy *executable spec* of
the reference forward semantics, hand-derived from reading
``d3stn.py:17-125``, ``attention.py:100-256``, ``graphconv.py:79-125``,
``embedding.py:77-109`` and ``endecoder.py:5-147`` — NOT from this repo's
flax code. A reference-format state_dict with random weights is pushed
through ``convert_reference_state_dict`` into the flax model and through the
spec; any drift in attention conv padding, Corr top-k mixing, head split,
masking, GCN gating/scaling, embedding lookup, pre-norm residual wiring or
LayerNorm epsilon breaks the comparison.

Spec details encoded from the reference:
- paddle nn.Linear: y = x @ W + b, W stored [in, out] (no transpose).
- temporal-context convs: NHWC Conv2D kernel (1, ks), weights [out, in, 1, ks];
  '1DConv' pads time symmetrically ((ks-1)//2), 'causal' left-pads (ks-1)
  (the reference pads BOTH spatial dims and slices the node halo back off,
  attention.py:204-224 — numerically identical).
- Corr attention: per-node top-k of the sc matrix, softmax-weighted mix of
  queries and keys only (values untouched), attention.py:226-241.
- scores = q k^T / sqrt(head_dim); causal mask adds float32-min upper
  triangle; softmax over keys.
- SpatialAttentionGCN: softmax(x x^T / sqrt(d)) over nodes per timestep,
  / sqrt(d_model) when is_scale, gated alpha*(score .* adj) + beta*(score
  .* sc), matmul with x, bias-free linear, SiLU (graphconv.py:99-125).
- SublayerConnection (residual+LN branch): x + sublayer(LayerNorm(x)),
  paddle LayerNorm epsilon 1e-5 (endecoder.py:24-25).
- encode/decode embed concat: dense(x[..., :1]) ++ week(x[...,1]) ++
  day(x[...,2]) ++ adaptive (broadcast [N, tgt_len, d_adaptive]); decode
  reuses the ENCODER adaptive embedding (reference slip, d3stn.py:113-114).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu.models.d3stn import (
    D3STN,
    D3STNConfig,
    convert_reference_state_dict,
    norm_adj_matrix,
)

B, N, T, KS = 2, 6, 12, 3


def golden_cfg(**kw):
    defaults = dict(
        dataset_name="GOLDEN",
        num_nodes=N,
        his_len=64,
        tgt_len=T,
        encoder_num_layers=1,
        decoder_num_layers=1,
        d_model=16,
        d_proj=6,
        d_sect=3,
        d_adaptive=4,
        head=2,
        kernel_size=KS,
        top_k=3,
        attention="Corr",
        with_adj=True,
        with_sc=True,
        dropout=0.0,
    )
    defaults.update(kw)
    return D3STNConfig(**defaults)


# --------------------------------------------------------------------------
# NumPy executable spec of the reference forward
# --------------------------------------------------------------------------

def _softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp((x - m).astype(np.float64))
    return (e / e.sum(axis=axis, keepdims=True)).astype(np.float32)


def _silu(x):
    return x / (1.0 + np.exp(-x.astype(np.float64))).astype(np.float32)


def _layernorm(x, gamma, beta, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * gamma + beta


def _conv_time(x, w, b, causal):
    """x [B,N,T,C]; paddle NHWC Conv2D weight [out, in, 1, ks]."""
    out_c, _, _, ks = w.shape
    pad = (ks - 1, 0) if causal else ((ks - 1) // 2, (ks - 1) // 2)
    xp = np.pad(x, ((0, 0), (0, 0), pad, (0, 0)))
    t = x.shape[2]
    out = np.broadcast_to(b, x.shape[:3] + (out_c,)).astype(np.float32).copy()
    for j in range(ks):
        out += xp[:, :, j : j + t, :] @ w[:, :, 0, j].T
    return out


def _attention(state, prefix, cfg, sc_norm, q_in, k_in, v_in,
               q_causal, k_causal, is_mask):
    w = lambda n: state[f"{prefix}.{n}.weight"]
    bb = lambda n: state[f"{prefix}.{n}.bias"]
    q = _conv_time(q_in, w("query_conv"), bb("query_conv"), q_causal)
    k = _conv_time(k_in, w("key_conv"), bb("key_conv"), k_causal)
    v = _conv_time(v_in, w("value_conv"), bb("value_conv"), k_causal)

    if cfg.attention == "Corr":
        idx = np.argsort(-sc_norm, axis=-1, kind="stable")[:, : cfg.top_k]
        vals = np.take_along_axis(sc_norm, idx, -1)
        wts = _softmax(vals, -1)  # [N, K]

        def mix(x):
            sel = x[:, idx]  # [B, N, K, T, D]
            return np.einsum("nk,bnktd->bntd", wts, sel).astype(np.float32)

        q, k = mix(q), mix(k)

    heads, dh = cfg.head, cfg.d_model // cfg.head
    sh = lambda x: x.reshape(x.shape[0], x.shape[1], x.shape[2], heads, dh
                             ).transpose(0, 1, 3, 2, 4)
    qh, kh, vh = sh(q), sh(k), sh(v)
    scores = np.einsum("bnhqd,bnhkd->bnhqk", qh, kh) / math.sqrt(dh)
    if is_mask:
        tq = scores.shape[-2]
        mask = np.triu(np.full((tq, tq), np.finfo(np.float32).min, np.float32), 1)
        scores = scores + mask
    attn = _softmax(scores, -1)
    x = np.einsum("bnhqk,bnhkd->bnhqd", attn, vh).astype(np.float32)
    x = x.transpose(0, 1, 3, 2, 4).reshape(q.shape[0], q.shape[1], -1, heads * dh)
    return _conv_time(x, w("out_conv"), bb("out_conv"), False)


def _sa_gcn(state, prefix, cfg, adj_norm, sc_norm, x):
    d = x.shape[-1]
    xt = x.transpose(0, 2, 1, 3)  # [B, T, N, D]
    score = _softmax(
        np.einsum("btnd,btmd->btnm", xt, xt) / math.sqrt(d), -1
    ) / math.sqrt(cfg.d_model)  # is_scale=True always in the reference model
    alpha = state[f"{prefix}.alpha"]
    beta = state[f"{prefix}.beta"]
    if cfg.with_adj and not cfg.with_sc:
        adj = alpha * (score * adj_norm)
    elif cfg.with_sc and not cfg.with_adj:
        adj = beta * (score * sc_norm)
    elif cfg.with_adj and cfg.with_sc:
        adj = alpha * (score * adj_norm) + beta * (score * sc_norm)
    else:
        adj = alpha * (score * adj_norm)
    x_gcn = np.einsum("btnm,btmd->btnd", adj, xt).astype(np.float32)
    out = x_gcn @ state[f"{prefix}.linear.weight"]
    return _silu(out).transpose(0, 2, 1, 3)


def _embed(state, cfg, x, which):
    dense_w = state[f"{which}_dense.weight"]
    dense_b = state[f"{which}_dense.bias"]
    parts = [x[..., :1] @ dense_w + dense_b]
    for table, axis, num in (
        ("temporal_section_week.embedding.weight", 1, 7),
        ("temporal_section_day.embedding.weight", 2, 288),
    ):
        idx = np.clip(x[..., axis], 0, num - 1).astype(np.int32)
        parts.append(state[table][idx])
    if cfg.d_adaptive > 0:
        emb = state["adaptive_embedding_encoder.embedding"]  # reference slip:
        # decode also uses the ENCODER adaptive embedding (d3stn.py:113-114)
        parts.append(np.broadcast_to(emb[None], (x.shape[0],) + emb.shape))
    return np.concatenate(parts, axis=-1).astype(np.float32)


def _sublayer(state, key, x, fn):
    g = state[f"{key}.norm.weight"]
    b = state[f"{key}.norm.bias"]
    return x + fn(_layernorm(x, g, b))


def reference_forward(state, cfg, adj_norm, sc_norm, src, tgt):
    """The executable spec: d3stn.py:86-125 forward semantics in numpy."""
    x = _embed(state, cfg, src, "encoder")
    for i in range(cfg.encoder_num_layers):
        p = f"encoder.layers.{i}"
        x = _sublayer(state, f"{p}.sublayer.0", x,
                      lambda h: _attention(state, f"{p}.self_attn", cfg, sc_norm,
                                           h, h, h, False, False, False))
        x = _sublayer(state, f"{p}.sublayer.1", x,
                      lambda h: _sa_gcn(state, f"{p}.feed_forward_gcn", cfg,
                                        adj_norm, sc_norm, h))
    memory = _layernorm(x, state["encoder.norm.weight"], state["encoder.norm.bias"])

    y = _embed(state, cfg, tgt, "decoder")
    for i in range(cfg.decoder_num_layers):
        p = f"decoder.layers.{i}"
        y = _sublayer(state, f"{p}.sublayer.0", y,
                      lambda h: _attention(state, f"{p}.self_attn", cfg, sc_norm,
                                           h, h, h, True, True, True))
        y = _sublayer(state, f"{p}.sublayer.1", y,
                      lambda h: _attention(state, f"{p}.src_attn", cfg, sc_norm,
                                           h, memory, memory, True, False, False))
        y = _sublayer(state, f"{p}.sublayer.2", y,
                      lambda h: _sa_gcn(state, f"{p}.feed_forward_gcn", cfg,
                                        adj_norm, sc_norm, h))
    y = _layernorm(y, state["decoder.norm.weight"], state["decoder.norm.bias"])
    return y @ state["generator.weight"] + state["generator.bias"]


# --------------------------------------------------------------------------
# Reference-format state_dict with random weights
# --------------------------------------------------------------------------

def make_reference_state(cfg, rng):
    d, dp, ds = cfg.d_model, cfg.d_proj, cfg.d_sect
    r = lambda *s: (rng.randn(*s) * 0.2).astype(np.float32)
    state = {
        "encoder_dense.weight": r(1, dp), "encoder_dense.bias": r(dp),
        "decoder_dense.weight": r(1, dp), "decoder_dense.bias": r(dp),
        "temporal_section_week.embedding.weight": r(7, ds),
        "temporal_section_day.embedding.weight": r(288, ds),
        "generator.weight": r(d, 1), "generator.bias": r(1),
        "encoder.norm.weight": 1.0 + r(d), "encoder.norm.bias": r(d),
        "decoder.norm.weight": 1.0 + r(d), "decoder.norm.bias": r(d),
    }
    if cfg.d_adaptive > 0:
        state["adaptive_embedding_encoder.embedding"] = r(
            cfg.num_nodes, cfg.tgt_len, cfg.d_adaptive
        )

    def layer(prefix, subs, n_sublayers):
        for s in subs:
            for c in ("query_conv", "key_conv", "value_conv", "out_conv"):
                state[f"{prefix}.{s}.{c}.weight"] = r(d, d, 1, cfg.kernel_size)
                state[f"{prefix}.{s}.{c}.bias"] = r(d)
        state[f"{prefix}.feed_forward_gcn.linear.weight"] = r(d, d)
        state[f"{prefix}.feed_forward_gcn.alpha"] = np.asarray([0.6], np.float32)
        state[f"{prefix}.feed_forward_gcn.beta"] = np.asarray([0.4], np.float32)
        for s in range(n_sublayers):
            state[f"{prefix}.sublayer.{s}.norm.weight"] = 1.0 + r(d)
            state[f"{prefix}.sublayer.{s}.norm.bias"] = r(d)

    for i in range(cfg.encoder_num_layers):
        layer(f"encoder.layers.{i}", ("self_attn",), 2)
    for i in range(cfg.decoder_num_layers):
        layer(f"decoder.layers.{i}", ("self_attn", "src_attn"), 3)
    return state


@pytest.mark.parametrize("attention", ["Corr", "Vanilla"])
def test_reference_golden_forward(attention):
    cfg = golden_cfg(attention=attention)
    rng = np.random.RandomState(42)

    adj = (rng.rand(N, N) < 0.5).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(N, N).astype(np.float32)  # distinct values: no top-k ties
    adj_norm = norm_adj_matrix(adj).astype(np.float32)
    sc_norm = norm_adj_matrix(sc).astype(np.float32)

    state = make_reference_state(cfg, rng)

    src = rng.rand(B, N, T, 3).astype(np.float32)
    src[..., 1] = rng.randint(0, 7, (B, N, T))
    src[..., 2] = rng.randint(0, 288, (B, N, T))
    tgt = rng.rand(B, N, T, 3).astype(np.float32)
    tgt[..., 1] = rng.randint(0, 7, (B, N, T))
    tgt[..., 2] = rng.randint(0, 288, (B, N, T))

    want = reference_forward(state, cfg, adj_norm, sc_norm, src, tgt)

    params, unmatched = convert_reference_state_dict(state, cfg)
    assert unmatched == [], unmatched
    model = D3STN(cfg, jnp.asarray(adj_norm), jnp.asarray(sc_norm))
    # converted params must cover the full init tree (no silently-default
    # weights hiding a mapping gap)
    ref_tree = model.init(jax.random.key(0), jnp.asarray(src), jnp.asarray(tgt))["params"]
    want_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(ref_tree)[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert want_paths == got_paths, (
        want_paths.symmetric_difference(got_paths)
    )

    got = np.asarray(
        model.apply({"params": jax.tree.map(jnp.asarray, params)},
                    jnp.asarray(src), jnp.asarray(tgt))
    )
    assert got.shape == want.shape == (B, N, T, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
