"""Pallas TPU kernel: fused temporal-context attention block (D3STN).

``MultiHeadAttentionAwareTemporalContext`` (reference ``example/D3STN/
attention.py:100-256`` in DrownFish19/PaddleXDE) is the D3STN train step's
dominant cost: 4 temporal convs + top-k node mix + per-node MHA per module, 6
modules per 2+2-layer model. Measured on v5e at PEMS08 scale (bs 32): the
attention blocks hold ~90 of 139 ms — the step is op-count/copy-bound, every
sub-op a separate HBM round-trip of a 67 MB activation.

Fusion insight: the top-k mix matrix is ROW-STOCHASTIC (softmax weights), so
it commutes with the temporal conv exactly — ``mix(conv(x)) = conv(mix(x))``
(bias term invariant because rows sum to 1). With the mixes hoisted to one
XLA einsum per input, the whole block becomes per-node independent and fuses
into ONE kernel: per (batch, node-tile) the conv -> heads -> scores ->
softmax -> attn@v -> out-conv chain runs entirely in VMEM; x is read once and
y written once.

The backward is flash-attention-style: a second kernel re-computes q/k/v and
the softmax from the saved inputs and produces input grads per tile plus
weight/bias grads accumulated across the sequential TPU grid. A jnp reference
implementation (bit-matching the shifted-matmul conv form, which is pinned
equal to the model's nn.Conv path) backs non-TPU devices and the equality
tests.
"""

from __future__ import annotations

import functools
import os
import math

import jax
import jax.numpy as jnp

from .spline_pallas import pallas_available

__all__ = [
    "fused_temporal_attention",
    "fused_temporal_attention_dropout",
    "pallas_available",
]


def _dt(name: str):
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def _pad_cfg(k: int, causal: bool):
    return (k - 1, 0) if causal else ((k - 1) // 2, (k - 1) // 2)


# ---------------------------------------------------------------------------
# reference implementation (jnp; used off-TPU and as the test oracle)
# ---------------------------------------------------------------------------


def _tconv_ref(x, w, b, causal, dt):
    """Shifted-matmul temporal conv over [..., T, D] (== nn.Conv at 1e-5;
    the equivalence is pinned by the model's conv_impl test)."""
    k = w.shape[0]
    pad = _pad_cfg(k, causal)
    xp = jnp.pad(x, ((0, 0),) * (x.ndim - 2) + (pad, (0, 0))).astype(dt)
    t = x.shape[-2]
    w = w.astype(dt)
    out = sum(
        jnp.einsum(
            "...td,df->...tf",
            jax.lax.slice_in_dim(xp, j, j + t, axis=-2),
            w[j],
        )
        for j in range(k)
    )
    return out + b.astype(dt)


def _ref_impl(mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo, *,
              causal_q, causal_kv, is_mask, heads, dtype_name,
              dropout_mask=None):
    dt = _dt(dtype_name)
    q = _tconv_ref(mq, wq, bq, causal_q, dt)
    k = _tconv_ref(mk, wk, bk, causal_kv, dt)
    v = _tconv_ref(vsrc, wv, bv, causal_kv, dt)
    b, n, t_q, d = q.shape
    t_k = k.shape[-2]
    head_dim = d // heads
    q = q.reshape(b, n, t_q, heads, head_dim)
    k = k.reshape(b, n, t_k, heads, head_dim)
    v = v.reshape(b, n, t_k, heads, head_dim)
    scores = jnp.einsum(
        "bnqhd,bnkhd->bnhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(head_dim)
    if is_mask:
        scores = scores + jnp.triu(
            jnp.full((t_q, t_q), jnp.finfo(scores.dtype).min), k=1
        )
    attn = jax.nn.softmax(scores, axis=-1)
    if dropout_mask is not None:
        # mask layout [B, N, Tq, H*Tk] head-major (the kernel's blockdiag
        # column layout); values are pre-scaled {0, 1/keep}
        m = jnp.moveaxis(
            dropout_mask.astype(jnp.float32).reshape(b, n, t_q, heads, t_k),
            3, 2,
        )
        attn = attn * m
    attn = attn.astype(dt)
    x = jnp.einsum("bnhqk,bnkhd->bnqhd", attn, v).reshape(b, n, t_q, d)
    return _tconv_ref(x, wo, bo, False, dt)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _tconv_tile(x, w, b, causal, dt):
    """[G, T, D] tile conv via K shifted GEMMs on [G*T, D] (all in VMEM)."""
    g, t, d = x.shape
    k = w.shape[0]
    pad = _pad_cfg(k, causal)
    xp = jnp.pad(x.astype(dt), ((0, 0), pad, (0, 0)))
    acc = None
    for j in range(k):
        xj = jax.lax.slice_in_dim(xp, j, j + t, axis=1).reshape(g * t, d)
        pj = jnp.dot(xj, w[j].astype(dt), preferred_element_type=jnp.float32)
        acc = pj if acc is None else acc + pj
    return (acc.astype(dt) + b.astype(dt)).reshape(g, t, d)


_MIDDLE = os.environ.get("PXT_ATTN_MIDDLE", "blockdiag")  # "blockdiag" | "loop"
# blockdiag measured: module fwd+bwd 8.1 vs 10.9 ms; FULL STEP bs 32
# 119.8 -> 98.9 ms, bs 64 203.2 -> 169.0 ms (378.7 samples/s)

# How the blockdiag operands are BUILT/UNBUILT (round-5 closure of the
# pinned 2-3x VPU gap, VERDICT r4 next-step 5):
# - "where": 8 per-head jnp.where selects + a lane/sublane-dim concatenate
#   per operand (and the mirrored slice+where+sum per gradient) — pure
#   VPU/layout work, the round-3 suspect for the gap.
# - "dot": one matmul against a CONSTANT selector matrix per operand
#   (k_bd = (k·E)∘M with E [Tk,cols] the tiled identity and M [D,cols] the
#   head-alignment mask; gradients un-build with the same constants) —
#   moves the scatter/gather onto the MXU, which the roofline analysis
#   (ROADMAP r3 item 11b) said was 2-4x idle. "dot" is the DEFAULT since
#   round 5 — MEASURED (v5e, bs 32, tile 17, chained): module fwd
#   3.124 -> 2.638 ms, fwd+bwd 8.398 -> 6.100 ms (-27%); FULL D3STN step
#   60.2 -> 46.44 ms device-side (531 -> 689 samples/s).
_BD_BUILD = os.environ.get("PXT_ATTN_BD_BUILD", "dot")  # "dot" | "where"


def _bd_selectors(t_k, heads, d, head_dim):
    """Constant selector matrices for the "dot" blockdiag build.

    E [Tk, cols]: E[t, c] = 1 iff c mod Tk == t (tiled identity — expands a
    [.., Tk] operand to head-major [.., heads*Tk] columns by copy).
    M [D, cols]: M[d, c] = 1 iff d//head_dim == c//Tk (keeps only the block
    where the lane's head matches the column's head).

    Built with raw ``lax`` primitives, NOT jnp operators: this runs at the
    DEEPEST point of the whole train-step trace (flax init -> encoder ->
    pallas kernel trace), and jnp's operator-dispatch/promotion frames here
    tipped the full on-chip pytest run over the recursion limit (every tpu
    test RecursionError'd; standalone passed — razor-thin margin)."""
    lax = jax.lax
    cols = heads * t_k
    i32 = jnp.int32

    def div(a, b):
        return lax.div(a, lax.full_like(a, b))

    def onehot(a, b):
        return lax.convert_element_type(lax.eq(a, b), jnp.float32)

    col = lax.broadcasted_iota(i32, (t_k, cols), 1)
    row = lax.broadcasted_iota(i32, (t_k, cols), 0)
    colmod = lax.sub(col, lax.mul(div(col, t_k), lax.full_like(col, t_k)))
    e_sel = onehot(colmod, row)
    dcol = div(lax.broadcasted_iota(i32, (d, cols), 1), t_k)
    drow = div(lax.broadcasted_iota(i32, (d, cols), 0), head_dim)
    m_sel = onehot(dcol, drow)
    return e_sel, m_sel


def _tile_in(ref, bt):
    """Read a [bt, tile, T, D] block as a [bt*tile, T, D] tile (the kernel
    math is per-(batch, node) independent, so batch rows fold into the node
    dim — leading-dim collapse only, which Mosaic supports)."""
    if bt == 1:
        return ref[0]
    s = ref.shape
    return ref[...].reshape(bt * s[1], s[2], s[3])


def _tile_out(ref, y, bt):
    if bt == 1:
        ref[0] = y.astype(ref.dtype)
    else:
        s = ref.shape
        ref[...] = y.reshape(s).astype(ref.dtype)


def _attention_tile(q, k, v, *, heads, is_mask, dt, dmask=None):
    """Per-node MHA on a [G, T, D] tile.

    Two formulations (numerically equal, knob PXT_ATTN_MIDDLE):
    - "loop": static per-head loop of narrow dots (lane slices of dh=16).
      Measured: the loop is ~70% of the kernel (heads=1 fwd 1.5 ms vs
      heads=8 3.8 ms at PEMS08 scale).
    - "blockdiag": no per-head loop — block-structured operands and three
      batched [*, 128]-shaped matmuls (see _blockdiag_state). Mosaic rejects
      the natural head-batched alternatives (two batch dims in tpu.matmul;
      lane-split reshapes [*,128]->[*,H,16]), so heads live along matmul
      COLUMNS instead.
    """
    t_q, d = q.shape[1], q.shape[2]
    head_dim = d // heads
    inv = 1.0 / math.sqrt(head_dim)
    mask = None
    if is_mask:
        mask = jnp.triu(jnp.full((t_q, t_q), jnp.finfo(jnp.float32).min), k=1)
    if _MIDDLE == "blockdiag":
        x, _ = _blockdiag_state(
            q, k, v, heads=heads, head_dim=head_dim, inv=inv, mask=mask, dt=dt,
            dmask=dmask,
        )
        return x
    t_k = k.shape[1]
    outs = []
    dn = (((2,), (2,)), ((0,), (0,)))  # contract dh, batch over G
    dn_pv = (((2,), (1,)), ((0,), (0,)))  # attn [G,Tq,Tk] x v [G,Tk,dh]
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q[:, :, sl], k[:, :, sl], v[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh, dn, preferred_element_type=jnp.float32
        ) * inv
        if mask is not None:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1)
        if dmask is not None:
            p = p * dmask[:, :, h * t_k : (h + 1) * t_k]
        p = p.astype(dt)
        outs.append(
            jax.lax.dot_general(p, vh, dn_pv, preferred_element_type=jnp.float32)
            .astype(dt)
        )
    return jnp.concatenate(outs, axis=-1)  # [G, Tq, D]


def _fwd_kernel(mq_ref, mk_ref, vs_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, bo_ref, *rest,
                causal_q, causal_kv, is_mask, heads, dtype_name, bt=1,
                has_dropout=False):
    if has_dropout:
        dm_ref, out_ref = rest
        dmask = _tile_in(dm_ref, bt).astype(jnp.float32)
    else:
        (out_ref,) = rest
        dmask = None
    dt = _dt(dtype_name)
    q = _tconv_tile(_tile_in(mq_ref, bt), wq_ref[...], bq_ref[...], causal_q, dt)
    k = _tconv_tile(_tile_in(mk_ref, bt), wk_ref[...], bk_ref[...], causal_kv, dt)
    v = _tconv_tile(_tile_in(vs_ref, bt), wv_ref[...], bv_ref[...], causal_kv, dt)
    x = _attention_tile(q, k, v, heads=heads, is_mask=is_mask, dt=dt,
                        dmask=dmask)
    y = _tconv_tile(x, wo_ref[...], bo_ref[...], False, dt)
    _tile_out(out_ref, y, bt)


def _tconv_bwd_input(g, w, causal, dt):
    """d(conv)/d(input): correlation with index-reversed, transposed taps.

    out[t] = sum_j x[t + j - off] W[j]  =>  dx[s] = sum_j g[s - j + off] W[j]^T
    which is the same shifted-GEMM form with pad reversed and W[j] -> W[K-1-j]^T
    relabeled."""
    k = w.shape[0]
    pad = _pad_cfg(k, causal)
    rev_pad = (pad[1], pad[0])
    n_g, t, d = g.shape
    gp = jnp.pad(g.astype(dt), ((0, 0), rev_pad, (0, 0)))
    acc = None
    for j in range(k):
        gj = jax.lax.slice_in_dim(gp, j, j + t, axis=1).reshape(n_g * t, d)
        wj = w[k - 1 - j].astype(dt).T
        pj = jnp.dot(gj, wj, preferred_element_type=jnp.float32)
        acc = pj if acc is None else acc + pj
    return acc.reshape(n_g, t, d)


def _conv_weight_grads(x, g, k, causal, dt):
    """Per-tile dW [K, D, D] and db [D] for out = conv(x)."""
    pad = _pad_cfg(k, causal)
    n_g, t, d_in = x.shape
    xp = jnp.pad(x.astype(dt), ((0, 0), pad, (0, 0)))
    g2 = g.reshape(n_g * t, -1).astype(dt)
    dws = []
    for j in range(k):
        xj = jax.lax.slice_in_dim(xp, j, j + t, axis=1).reshape(n_g * t, d_in)
        dws.append(
            jax.lax.dot_general(
                xj, g2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    dw = jnp.stack(dws, axis=0)  # [K, D_in, D_out]
    db = jnp.sum(g2.astype(jnp.float32), axis=0)
    return dw, db


def _blockdiag_state(q, k, v, *, heads, head_dim, inv, mask, dt, dmask=None):
    """Forward attention middle in block-diagonal form; returns
    (x_attn [G, Tq, D] dt, residual state for the backward).

    ``dmask`` [G, Tq, heads*Tk] f32 (values {0, 1/keep}) is attention-weight
    dropout — its column layout IS the blockdiag layout, so it applies as one
    elementwise multiply on p. The stored state keeps the PRE-dropout softmax
    p0 (the softmax backward needs it; p0 cannot be recovered where the mask
    zeroed p).

    Two builds for the block operands (knob ``PXT_ATTN_BD_BUILD``, see
    module note): "where" (per-head select + concat, VPU) and "dot"
    (selector-matrix matmuls, MXU). Numerically identical — the selector
    entries are exact {0,1} floats, so the matmuls move values untouched."""
    d = q.shape[2]
    t_k = k.shape[1]
    cols = heads * t_k
    if _BD_BUILD == "dot":
        e_sel, m_sel = _bd_selectors(t_k, heads, d, head_dim)
        # [G, Tk, D] ·(Tk) E [Tk, cols] -> [G, D, cols], masked to the block
        k_bd = jax.lax.dot_general(
            k.astype(jnp.float32), e_sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * m_sel
    else:
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2) // head_dim
        kt = jnp.swapaxes(k.astype(jnp.float32), 1, 2)  # [G, D, Tk]
        sub_head = jnp.swapaxes(lane_head, 1, 2)  # [1, D, 1]
        k_bd = jnp.concatenate(
            [jnp.where(sub_head == h, kt, 0.0) for h in range(heads)], axis=2
        )  # [G, D, cols]
    s = jax.lax.dot_general(
        q.astype(jnp.float32), k_bd, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * inv
    if mask is not None:
        if _BD_BUILD == "dot":
            # head-tiled causal mask [Tq, cols] built directly from iota
            # (is_mask implies Tq == Tk) — no lane-dim concatenate; raw lax
            # for the same peak-trace-depth reason as _bd_selectors
            lax = jax.lax
            t_q = q.shape[1]
            mrow = lax.broadcasted_iota(jnp.int32, (t_q, cols), 0)
            mcol = lax.broadcasted_iota(jnp.int32, (t_q, cols), 1)
            mcol = lax.sub(
                mcol, lax.mul(lax.div(mcol, lax.full_like(mcol, t_k)),
                              lax.full_like(mcol, t_k)))
            s = s + lax.select(
                lax.gt(mcol, mrow),
                lax.full((t_q, cols), jnp.finfo(jnp.float32).min, jnp.float32),
                lax.full((t_q, cols), 0.0, jnp.float32))
        else:
            s = s + jnp.tile(mask, (1, heads))
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    rid = jax.lax.broadcasted_iota(jnp.int32, (cols, cols), 0) // t_k
    cid = jax.lax.broadcasted_iota(jnp.int32, (cols, cols), 1) // t_k
    block_sum = (rid == cid).astype(jnp.float32)
    denom = jax.lax.dot_general(
        e, block_sum, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = e / denom  # [G, Tq, cols] f32 (pre-dropout)
    p_eff = p if dmask is None else p * dmask
    if _BD_BUILD == "dot":
        # v in the SAME [G, D, cols] layout as k_bd (one shared build form);
        # the attn@v contraction then runs over both operands' LAST dim
        v_bd = jax.lax.dot_general(
            v.astype(jnp.float32), e_sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * m_sel  # [G, D, cols]
        x_attn = jax.lax.dot_general(
            p_eff.astype(dt), v_bd.astype(dt), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        return x_attn, (p, k_bd, v_bd, block_sum, e_sel, m_sel)
    v_bd = jnp.concatenate(
        [jnp.where(lane_head == h, v.astype(jnp.float32), 0.0)
         for h in range(heads)],
        axis=1,
    )  # [G, cols, D]
    x_attn = jax.lax.dot_general(
        p_eff.astype(dt), v_bd.astype(dt), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    return x_attn, (p, k_bd, v_bd, block_sum, lane_head, sub_head)


def _blockdiag_bwd(state, q, v, dx_attn, *, heads, head_dim, inv, dmask=None):
    """Backward of the block-diagonal attention middle: four batched matmuls
    plus mask/recombine VPU work (no per-head loop). Returns f32
    (dq_full, dk_full, dv_full) [G, T, D]. With dropout, the mask applies to
    the value path (p_eff = p0*m feeds dv) and gates the softmax cotangent
    (dp0 = dp_eff*m) before the usual block-softmax backward on p0.

    Mirrors the forward's ``PXT_ATTN_BD_BUILD`` choice: "dot" un-builds the
    block-operand gradients with the same constant selectors (three extra
    MXU matmuls) instead of the 8-way slice+where+sum VPU reduction."""
    if _BD_BUILD == "dot":
        p, k_bd, v_bd, block_sum, e_sel, m_sel = state
        p_eff = p if dmask is None else p * dmask
        g_n, t_k = v.shape[0], v.shape[1]
        gq = dx_attn  # [G, Tq, D] f32
        # x = p_eff ·(cols) v_bd  with v_bd [G, D, cols]
        d_vbd = jax.lax.dot_general(  # contract Tq -> [G, D, cols]
            gq, p_eff, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        e_b = jnp.broadcast_to(e_sel, (g_n,) + e_sel.shape)  # [G, Tk, cols]
        dv_full = jax.lax.dot_general(  # contract cols -> [G, Tk, D]
            e_b, d_vbd * m_sel, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(  # contract D -> [G, Tq, cols]
            gq, v_bd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if dmask is not None:
            dp = dp * dmask
        ds = p * (
            dp - jax.lax.dot_general(
                dp * p, block_sum, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ) * inv
        dq_full = jax.lax.dot_general(  # contract cols -> [G, Tq, D]
            ds, k_bd, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        d_kbd = jax.lax.dot_general(  # contract Tq -> [G, D, cols]
            q.astype(jnp.float32), ds, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk_full = jax.lax.dot_general(  # contract cols -> [G, Tk, D]
            e_b, d_kbd * m_sel, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return dq_full, dk_full, dv_full
    p, k_bd, v_bd, block_sum, lane_head, sub_head = state
    p_eff = p if dmask is None else p * dmask
    t_k = v.shape[1]
    gq = dx_attn  # [G, Tq, D] f32
    d_vbd = jax.lax.dot_general(  # p_eff^T @ g over Tq -> [G, cols, D]
        p_eff, gq, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dv_full = sum(
        jnp.where(
            lane_head == h,
            jax.lax.slice_in_dim(d_vbd, h * t_k, (h + 1) * t_k, axis=1),
            0.0,
        )
        for h in range(heads)
    )  # [G, Tk, D]
    dp = jax.lax.dot_general(  # g @ v_bd^T over D -> [G, Tq, cols]
        gq, v_bd, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if dmask is not None:
        dp = dp * dmask
    ds = p * (
        dp - jax.lax.dot_general(
            dp * p, block_sum, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    ) * inv
    dq_full = jax.lax.dot_general(  # ds @ k_bd^T over cols -> [G, Tq, D]
        ds, k_bd, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    d_kbd = jax.lax.dot_general(  # q^T @ ds over Tq -> [G, D, cols]
        q.astype(jnp.float32), ds, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk_t = sum(
        jnp.where(
            sub_head == h,
            jax.lax.slice_in_dim(d_kbd, h * t_k, (h + 1) * t_k, axis=2),
            0.0,
        )
        for h in range(heads)
    )  # [G, D, Tk]
    dk_full = jnp.swapaxes(dk_t, 1, 2)
    return dq_full, dk_full, dv_full


def _bwd_kernel(mq_ref, mk_ref, vs_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, bo_ref, g_ref, *rest,
                causal_q, causal_kv, is_mask, heads, dtype_name, bt=1,
                has_dropout=False):
    from jax.experimental import pallas as pl

    if has_dropout:
        dm_ref = rest[0]
        rest = rest[1:]
        dmask = _tile_in(dm_ref, bt).astype(jnp.float32)
    else:
        dmask = None
    (dmq_ref, dmk_ref, dvs_ref, dwq_ref, dbq_ref, dwk_ref,
     dbk_ref, dwv_ref, dbv_ref, dwo_ref, dbo_ref) = rest

    dt = _dt(dtype_name)
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for r in (dwq_ref, dbq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                  dwo_ref, dbo_ref):
            r[...] = jnp.zeros_like(r)

    mq, mk, vs = _tile_in(mq_ref, bt), _tile_in(mk_ref, bt), _tile_in(vs_ref, bt)
    g_out = _tile_in(g_ref, bt).astype(jnp.float32)
    k_taps = wq_ref.shape[0]

    # --- recompute forward (flash-style) ---
    q = _tconv_tile(mq, wq_ref[...], bq_ref[...], causal_q, dt)
    k = _tconv_tile(mk, wk_ref[...], bk_ref[...], causal_kv, dt)
    v = _tconv_tile(vs, wv_ref[...], bv_ref[...], causal_kv, dt)
    t_q, d = q.shape[1], q.shape[2]
    head_dim = d // heads
    inv = 1.0 / math.sqrt(head_dim)
    mask = None
    if is_mask:
        mask = jnp.triu(jnp.full((t_q, t_q), jnp.finfo(jnp.float32).min), k=1)

    if _MIDDLE == "blockdiag":
        x_attn, st = _blockdiag_state(
            q, k, v, heads=heads, head_dim=head_dim, inv=inv, mask=mask, dt=dt,
            dmask=dmask,
        )
        dwo, dbo = _conv_weight_grads(x_attn, g_out, k_taps, False, dt)
        dwo_ref[...] += dwo.astype(dwo_ref.dtype)
        dbo_ref[...] += dbo.astype(dbo_ref.dtype)
        dx_attn = _tconv_bwd_input(g_out, wo_ref[...], False, dt)
        dq_full, dk_full, dv_full = _blockdiag_bwd(
            st, q, v, dx_attn.astype(jnp.float32), heads=heads,
            head_dim=head_dim, inv=inv, dmask=dmask,
        )
        dwq, dbq = _conv_weight_grads(mq, dq_full, k_taps, causal_q, dt)
        dwk, dbk = _conv_weight_grads(mk, dk_full, k_taps, causal_kv, dt)
        dwv, dbv = _conv_weight_grads(vs, dv_full, k_taps, causal_kv, dt)
        dwq_ref[...] += dwq.astype(dwq_ref.dtype)
        dbq_ref[...] += dbq.astype(dbq_ref.dtype)
        dwk_ref[...] += dwk.astype(dwk_ref.dtype)
        dbk_ref[...] += dbk.astype(dbk_ref.dtype)
        dwv_ref[...] += dwv.astype(dwv_ref.dtype)
        dbv_ref[...] += dbv.astype(dbv_ref.dtype)
        _tile_out(dmq_ref, _tconv_bwd_input(dq_full, wq_ref[...], causal_q, dt), bt)
        _tile_out(dmk_ref, _tconv_bwd_input(dk_full, wk_ref[...], causal_kv, dt), bt)
        _tile_out(dvs_ref, _tconv_bwd_input(dv_full, wv_ref[...], causal_kv, dt), bt)
        return

    dn_qk = (((2,), (2,)), ((0,), (0,)))
    dn_pv = (((2,), (1,)), ((0,), (0,)))
    dn_ptg = (((1,), (1,)), ((0,), (0,)))  # p^T @ g per batch

    def head_softmax(h):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[:, :, sl].astype(jnp.float32)
        kh = k[:, :, sl].astype(jnp.float32)
        s = jax.lax.dot_general(qh, kh, dn_qk,
                                preferred_element_type=jnp.float32) * inv
        if mask is not None:
            s = s + mask
        return jax.nn.softmax(s, axis=-1)

    # store the per-head softmax maps for the grad loop (8 x [G, Tq, Tk] f32
    # ~ 0.5M at tile 17 — recomputing them instead measured +11 ms on the
    # full bs-32 step and did NOT shrink Mosaic's scoped-VMEM stack anyway)
    t_k = k.shape[1]
    x_parts, p_list = [], []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        vh = v[:, :, sl].astype(jnp.float32)
        p = head_softmax(h)
        p_list.append(p)  # PRE-dropout softmax (softmax bwd needs it)
        p_eff = p if dmask is None else p * dmask[:, :, h * t_k:(h + 1) * t_k]
        x_parts.append(
            jax.lax.dot_general(p_eff.astype(dt), vh.astype(dt), dn_pv,
                                preferred_element_type=jnp.float32)
        )
    x_attn = jnp.concatenate(
        [xp.astype(dt) for xp in x_parts], axis=-1
    )  # [G, Tq, D]

    # --- out conv ---
    dwo, dbo = _conv_weight_grads(x_attn, g_out, k_taps, False, dt)
    dwo_ref[...] += dwo.astype(dwo_ref.dtype)
    dbo_ref[...] += dbo.astype(dbo_ref.dtype)
    dx_attn = _tconv_bwd_input(g_out, wo_ref[...], False, dt)  # [G, Tq, D]

    # --- attention bwd per head (p saved above) ---
    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[:, :, sl].astype(jnp.float32)
        kh = k[:, :, sl].astype(jnp.float32)
        vh = v[:, :, sl].astype(jnp.float32)
        gh = dx_attn[:, :, sl]
        p = p_list[h]
        m_h = None if dmask is None else dmask[:, :, h * t_k:(h + 1) * t_k]
        p_eff = p if m_h is None else p * m_h
        dp = jax.lax.dot_general(  # g [G,Tq,dh] x v [G,Tk,dh] -> [G,Tq,Tk]
            gh, vh, dn_qk, preferred_element_type=jnp.float32
        )
        if m_h is not None:
            dp = dp * m_h
        dv_parts.append(jax.lax.dot_general(  # p_eff^T g over Tq
            p_eff, gh, dn_ptg, preferred_element_type=jnp.float32
        ))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_parts.append(jax.lax.dot_general(  # ds [G,Tq,Tk] x k [G,Tk,dh]
            ds, kh, dn_pv, preferred_element_type=jnp.float32
        ) * inv)
        dk_parts.append(jax.lax.dot_general(  # ds^T over Tq x q [G,Tq,dh]
            ds, qh, dn_ptg, preferred_element_type=jnp.float32
        ) * inv)
    dq_full = jnp.concatenate(dq_parts, axis=-1)
    dk_full = jnp.concatenate(dk_parts, axis=-1)
    dv_full = jnp.concatenate(dv_parts, axis=-1)

    # --- input convs ---
    dwq, dbq = _conv_weight_grads(mq, dq_full, k_taps, causal_q, dt)
    dwk, dbk = _conv_weight_grads(mk, dk_full, k_taps, causal_kv, dt)
    dwv, dbv = _conv_weight_grads(vs, dv_full, k_taps, causal_kv, dt)
    dwq_ref[...] += dwq.astype(dwq_ref.dtype)
    dbq_ref[...] += dbq.astype(dbq_ref.dtype)
    dwk_ref[...] += dwk.astype(dwk_ref.dtype)
    dbk_ref[...] += dbk.astype(dbk_ref.dtype)
    dwv_ref[...] += dwv.astype(dwv_ref.dtype)
    dbv_ref[...] += dbv.astype(dbv_ref.dtype)
    _tile_out(dmq_ref, _tconv_bwd_input(dq_full, wq_ref[...], causal_q, dt), bt)
    _tile_out(dmk_ref, _tconv_bwd_input(dk_full, wk_ref[...], causal_kv, dt), bt)
    _tile_out(dvs_ref, _tconv_bwd_input(dv_full, wv_ref[...], causal_kv, dt), bt)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

_TILE_N = 16
_TILE_CAP = int(os.environ.get("PXT_ATTN_TILE_CAP", "17"))
# forward-only cap (the fwd kernel has VMEM headroom the bwd lacks — only
# the BACKWARD straddles the 16M scoped limit at tile 34); default ties to
# the shared cap, override to experiment, e.g. PXT_ATTN_TILE_CAP_FWD=34
_TILE_CAP_FWD = int(os.environ.get("PXT_ATTN_TILE_CAP_FWD", str(_TILE_CAP)))
# batch rows folded into each kernel program's node dim (grid B/bt x N/tile):
# bigger GEMM M-dim + fewer grid steps at the cost of bt x the tile VMEM
_BATCH_BLOCK_FWD = int(os.environ.get("PXT_ATTN_BATCH_BLOCK_FWD",
                                      os.environ.get("PXT_ATTN_BATCH_BLOCK", "1")))
_BATCH_BLOCK_BWD = int(os.environ.get("PXT_ATTN_BATCH_BLOCK_BWD",
                                      os.environ.get("PXT_ATTN_BATCH_BLOCK", "1")))


def _pick_bt(b: int, cap: int) -> int:
    """Largest divisor of the batch <= cap (no batch padding)."""
    for d in range(min(b, cap), 1, -1):
        if b % d == 0:
            return d
    return 1


def _pick_tile(n: int, cap: int = None) -> int:
    """Largest node-tile <= cap that divides N exactly (no pad/slice copies
    around the kernel — e.g. PEMS08's N=170 -> 34); falls back to _TILE_N
    with zero-padding for awkward (e.g. prime) N. Default cap 17: tile 34
    measured slightly faster on one bs-64 program (199 vs 205-215 ms full
    step) but its BACKWARD sits at 16.0-16.3M scoped VMEM against the 16M
    limit and fails to compile on other program shapes (observed both ways;
    recomputing the per-head softmax did not change Mosaic's stack size).
    17 compiles everywhere measured and gives the best stable bs-32 number
    (117 ms). Cap overridable via PXT_ATTN_TILE_CAP for experiments."""
    cap = _TILE_CAP if cap is None else cap
    for d in range(min(n, cap), 7, -1):
        if n % d == 0:
            return d
    return min(_TILE_N, cap)


def _padded(x, n_pad):
    n = x.shape[1]
    if n == n_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))


def _call_fwd(mq, mk, vs, weights, statics, interpret, dmask=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, t_q, d = mq.shape
    t_k = mk.shape[2]
    tile = _pick_tile(n, _TILE_CAP_FWD)
    n_pad = -(-n // tile) * tile
    bt = _pick_bt(b, _BATCH_BLOCK_FWD)
    mq_p, mk_p, vs_p = (_padded(a, n_pad) for a in (mq, mk, vs))
    dt = _dt(statics["dtype_name"])
    kern = functools.partial(_fwd_kernel, bt=bt,
                             has_dropout=dmask is not None, **statics)

    def tile_spec(t_len, width=d):
        return pl.BlockSpec((bt, tile, t_len, width), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, j: (0,) * nd,
                            memory_space=pltpu.VMEM)

    wq, bq, wk, bk, wv, bv, wo, bo = weights
    in_specs = [
        tile_spec(t_q), tile_spec(t_k), tile_spec(t_k),
        const_spec(wq.shape), const_spec(bq.shape),
        const_spec(wk.shape), const_spec(bk.shape),
        const_spec(wv.shape), const_spec(bv.shape),
        const_spec(wo.shape), const_spec(bo.shape),
    ]
    operands = [mq_p, mk_p, vs_p, wq, bq, wk, bk, wv, bv, wo, bo]
    if dmask is not None:
        in_specs.append(tile_spec(t_q, statics["heads"] * t_k))
        operands.append(_padded(dmask, n_pad))
    out = pl.pallas_call(
        kern,
        grid=(b // bt, n_pad // tile),
        in_specs=in_specs,
        out_specs=tile_spec(t_q),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, t_q, d), dt),
        interpret=interpret,
    )(*operands)
    return out[:, :n] if n_pad != n else out


def _call_bwd(mq, mk, vs, weights, g, statics, interpret, dmask=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, t_q, d = mq.shape
    t_k = mk.shape[2]
    tile = _pick_tile(n)
    n_pad = -(-n // tile) * tile
    bt = _pick_bt(b, _BATCH_BLOCK_BWD)
    mq_p, mk_p, vs_p = (_padded(a, n_pad) for a in (mq, mk, vs))
    g_p = _padded(g, n_pad)
    kern = functools.partial(_bwd_kernel, bt=bt,
                             has_dropout=dmask is not None, **statics)
    wq, bq, wk, bk, wv, bv, wo, bo = weights

    def tile_spec(t_len, width=d):
        return pl.BlockSpec((bt, tile, t_len, width), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, j: (0,) * nd,
                            memory_space=pltpu.VMEM)

    w_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                for w in (wq, bq, wk, bk, wv, bv, wo, bo)]
    in_specs = [
        tile_spec(t_q), tile_spec(t_k), tile_spec(t_k),
        const_spec(wq.shape), const_spec(bq.shape),
        const_spec(wk.shape), const_spec(bk.shape),
        const_spec(wv.shape), const_spec(bv.shape),
        const_spec(wo.shape), const_spec(bo.shape),
        tile_spec(t_q),
    ]
    operands = [mq_p, mk_p, vs_p, wq, bq, wk, bk, wv, bv, wo, bo, g_p]
    if dmask is not None:
        in_specs.append(tile_spec(t_q, statics["heads"] * t_k))
        operands.append(_padded(dmask, n_pad))
    outs = pl.pallas_call(
        kern,
        grid=(b // bt, n_pad // tile),
        in_specs=in_specs,
        out_specs=[
            tile_spec(t_q), tile_spec(t_k), tile_spec(t_k),
            const_spec(wq.shape), const_spec(bq.shape),
            const_spec(wk.shape), const_spec(bk.shape),
            const_spec(wv.shape), const_spec(bv.shape),
            const_spec(wo.shape), const_spec(bo.shape),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, t_q, d), mq.dtype),
            jax.ShapeDtypeStruct((b, n_pad, t_k, d), mk.dtype),
            jax.ShapeDtypeStruct((b, n_pad, t_k, d), vs.dtype),
            *w_shapes,
        ],
        interpret=interpret,
    )(*operands)
    dmq, dmk, dvs = outs[0][:, :n], outs[1][:, :n], outs[2][:, :n]
    return (dmq, dmk, dvs) + tuple(outs[3:])


# ---------------------------------------------------------------------------
# SPMD partitioning (multi-device mesh)
# ---------------------------------------------------------------------------
# pallas_call has no GSPMD/Shardy partitioning rule, so under a mesh the
# partitioner would replicate the whole batch onto every device. The kernel
# grid is embarrassingly parallel over (batch, node-tile): give it the rule it
# lacks — activations shard over their leading (B, N) dims and each shard runs
# the unmodified kernel on its local block; conv weights are replicated and
# their gradients (accumulated over the kernel's sequential grid) are psum'd
# across the sharded axes. See ops/partition.py.

_ACT_F = ("b n tq d", "b n tk d", "b n tk d")
_REPL_ACT = ("tq", "tk", "d")


def _w_factors(prefix):
    """Einsum-rule factor strings for the 4 conv kernels + biases."""
    dims, flat = [], []
    for i in range(4):
        dims += [f"{prefix}k{i} {prefix}i{i} {prefix}o{i}", f"{prefix}b{i}"]
        flat += [f"{prefix}k{i}", f"{prefix}i{i}", f"{prefix}o{i}", f"{prefix}b{i}"]
    return dims, tuple(flat)


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(statics_key, interpret, has_dropout=False):
    from .partition import shard_batched

    statics = dict(zip(
        ("causal_q", "causal_kv", "is_mask", "heads", "dtype_name"), statics_key
    ))

    if has_dropout:
        def impl(mq, mk, vs, dm, *weights):
            return _call_fwd(mq, mk, vs, weights, statics, interpret, dmask=dm)

        batched, act_f, repl_extra = (0, 1, 2, 3), _ACT_F + ("b n tq dmc",), ("dmc",)
    else:
        def impl(mq, mk, vs, *weights):
            return _call_fwd(mq, mk, vs, weights, statics, interpret)

        batched, act_f, repl_extra = (0, 1, 2), _ACT_F, ()

    w_dims, w_flat = _w_factors("w")
    return shard_batched(
        impl,
        batched_args=batched,
        batched_outs=(0,),
        n_outs=1,
        sharded_dims=2,
        rule=", ".join(act_f + tuple(w_dims)) + " -> b n tq d",
        need_replication=_REPL_ACT + repl_extra + w_flat,
    )


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(statics_key, interpret, has_dropout=False):
    from .partition import shard_batched

    statics = dict(zip(
        ("causal_q", "causal_kv", "is_mask", "heads", "dtype_name"), statics_key
    ))

    if has_dropout:
        def impl(mq, mk, vs, wq, bq, wk, bk, wv, bv, wo, bo, g, dm):
            return _call_bwd(
                mq, mk, vs, (wq, bq, wk, bk, wv, bv, wo, bo), g, statics,
                interpret, dmask=dm,
            )

        batched = (0, 1, 2, 11, 12)
        in_extra, repl_extra = ("b n tq d", "b n tq dmc"), ("dmc",)
    else:
        def impl(mq, mk, vs, wq, bq, wk, bk, wv, bv, wo, bo, g):
            return _call_bwd(
                mq, mk, vs, (wq, bq, wk, bk, wv, bv, wo, bo), g, statics,
                interpret,
            )

        batched = (0, 1, 2, 11)
        in_extra, repl_extra = ("b n tq d",), ()

    w_dims, w_flat = _w_factors("w")
    g_dims, g_flat = _w_factors("g")
    rule = (
        ", ".join(_ACT_F + tuple(w_dims) + in_extra)
        + " -> "
        + ", ".join(_ACT_F + tuple(g_dims))
    )
    return shard_batched(
        impl,
        batched_args=batched,
        batched_outs=(0, 1, 2),
        n_outs=11,
        sharded_dims=2,
        rule=rule,
        need_replication=_REPL_ACT + repl_extra + w_flat + g_flat,
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15, 16, 17, 18)
)
def fused_temporal_attention(
    mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo,
    causal_q: bool, causal_kv: bool, is_mask: bool, heads: int,
    dtype_name: str = "float32", use_pallas: bool = False,
    interpret: bool = False, partitioned: bool = True,
):
    """Fused conv->MHA->conv temporal-context attention over [B, N, T, D].

    ``mq``/``mk`` are the PRE-MIXED query/key inputs (the row-stochastic
    top-k mix commutes with the conv — hoist it outside), ``vsrc`` the raw
    value input; weights are the four temporal convs' ``[K, D, D]`` kernels
    and ``[D]`` biases. Gradients flow to all array arguments.

    ``partitioned`` wraps the kernel in its SPMD rule (required for a
    multi-device mesh to shard it; default on = safe). Single-device callers
    can pass False to skip the custom-call boundary (~5% of a PEMS08 bs-32
    step) — D3STN does via ``config.spmd``.
    """
    args = dict(causal_q=causal_q, causal_kv=causal_kv, is_mask=is_mask,
                heads=heads, dtype_name=dtype_name)
    if not use_pallas:
        return _ref_impl(mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo, **args)
    if not partitioned:
        return _call_fwd(mq, mk, vsrc, (wq, bq, wk, bk, wv, bv, wo, bo),
                         args, interpret)
    key = (causal_q, causal_kv, is_mask, heads, dtype_name)
    return _partitioned_fwd(key, interpret)(
        mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo
    )


def _vjp_fwd(mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo,
             causal_q, causal_kv, is_mask, heads, dtype_name, use_pallas,
             interpret, partitioned):
    out = fused_temporal_attention(
        mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo,
        causal_q, causal_kv, is_mask, heads, dtype_name, use_pallas, interpret,
        partitioned,
    )
    return out, (mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo)


def _vjp_bwd(causal_q, causal_kv, is_mask, heads, dtype_name, use_pallas,
             interpret, partitioned, res, g):
    mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo = res
    args = dict(causal_q=causal_q, causal_kv=causal_kv, is_mask=is_mask,
                heads=heads, dtype_name=dtype_name)
    if not use_pallas:
        _, vjp = jax.vjp(
            lambda *arrs: _ref_impl(*arrs, **args),
            mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo,
        )
        return vjp(g)
    if not partitioned:
        outs = _call_bwd(mq, mk, vsrc, (wq, bq, wk, bk, wv, bv, wo, bo), g,
                         args, interpret)
    else:
        key = (causal_q, causal_kv, is_mask, heads, dtype_name)
        outs = _partitioned_bwd(key, interpret)(
            mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo, g
        )
    dmq, dmk, dvs, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo = outs
    cast = lambda a, ref: a.astype(jnp.asarray(ref).dtype)
    return (dmq, dmk, dvs, cast(dwq, wq), cast(dbq, bq), cast(dwk, wk),
            cast(dbk, bk), cast(dwv, wv), cast(dbv, bv), cast(dwo, wo),
            cast(dbo, bo))


fused_temporal_attention.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17, 18, 19)
)
def fused_temporal_attention_dropout(
    mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo, dropout_mask,
    causal_q: bool, causal_kv: bool, is_mask: bool, heads: int,
    dtype_name: str = "float32", use_pallas: bool = False,
    interpret: bool = False, partitioned: bool = True,
):
    """:func:`fused_temporal_attention` with attention-weight dropout inside
    the kernel (closes the reference's ``nn.Dropout(attention)`` semantics,
    ``example/D3STN/attention.py:240-242``, without leaving VMEM).

    ``dropout_mask`` is a [B, N, Tq, heads*Tk] array of pre-scaled keep
    weights {0, 1/keep} in head-major column layout (head h occupies columns
    [h*Tk, (h+1)*Tk)); the caller samples it (one ``jax.random.bernoulli``)
    so the kernel stays deterministic and the backward replays the exact
    same mask from residuals. No gradient flows to the mask."""
    args = dict(causal_q=causal_q, causal_kv=causal_kv, is_mask=is_mask,
                heads=heads, dtype_name=dtype_name)
    if not use_pallas:
        return _ref_impl(mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo,
                         dropout_mask=dropout_mask, **args)
    if not partitioned:
        return _call_fwd(mq, mk, vsrc, (wq, bq, wk, bk, wv, bv, wo, bo),
                         args, interpret, dmask=dropout_mask)
    key = (causal_q, causal_kv, is_mask, heads, dtype_name)
    return _partitioned_fwd(key, interpret, True)(
        mq, mk, vsrc, dropout_mask, wq, bq, wk, bk, wv, bv, wo, bo
    )


def _vjp_fwd_dropout(mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo,
                     dropout_mask, causal_q, causal_kv, is_mask, heads,
                     dtype_name, use_pallas, interpret, partitioned):
    out = fused_temporal_attention_dropout(
        mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo, dropout_mask,
        causal_q, causal_kv, is_mask, heads, dtype_name, use_pallas, interpret,
        partitioned,
    )
    return out, (mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo, dropout_mask)


def _vjp_bwd_dropout(causal_q, causal_kv, is_mask, heads, dtype_name,
                     use_pallas, interpret, partitioned, res, g):
    mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo, dropout_mask = res
    args = dict(causal_q=causal_q, causal_kv=causal_kv, is_mask=is_mask,
                heads=heads, dtype_name=dtype_name)
    if not use_pallas:
        _, vjp = jax.vjp(
            lambda *arrs: _ref_impl(*arrs, dropout_mask=dropout_mask, **args),
            mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo,
        )
        outs = vjp(g)
    elif not partitioned:
        outs = _call_bwd(mq, mk, vsrc, (wq, bq, wk, bk, wv, bv, wo, bo), g,
                         args, interpret, dmask=dropout_mask)
    else:
        key = (causal_q, causal_kv, is_mask, heads, dtype_name)
        outs = _partitioned_bwd(key, interpret, True)(
            mq, mk, vsrc, wq, bq, wk, bk, wv, bv, wo, bo, g, dropout_mask
        )
    dmq, dmk, dvs, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo = outs
    cast = lambda a, ref: a.astype(jnp.asarray(ref).dtype)
    return (dmq, dmk, dvs, cast(dwq, wq), cast(dbq, bq), cast(dwk, wk),
            cast(dbk, bk), cast(dwv, wv), cast(dbv, bv), cast(dwo, wo),
            cast(dbo, bo), jnp.zeros_like(dropout_mask))


fused_temporal_attention_dropout.defvjp(_vjp_fwd_dropout, _vjp_bwd_dropout)
