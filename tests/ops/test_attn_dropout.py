"""In-kernel attention-weight dropout (VERDICT r2 next-step 8).

The reference applies ``nn.Dropout`` to the softmax weights
(``example/D3STN/attention.py:240-242``); round 2 fell back to the XLA path
whenever dropout was active. The kernel now takes an explicit pre-scaled
keep mask [B, N, Tq, heads*Tk] (head-major — the blockdiag column layout),
sampled OUTSIDE the kernel so forward and backward replay the exact same
mask. Pinned here in interpret mode: fwd + every grad equal the jnp oracle
under the same mask, an all-keep mask reproduces the no-dropout kernel, the
mask gets no gradient, and both attention middles (blockdiag / loop) agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu.ops import attn_pallas as ap

B, N, T, D, K, H = 2, 5, 4, 16, 3, 4


def _args(seed=0):
    rng = np.random.RandomState(seed)
    acts = [jnp.asarray(rng.randn(B, N, T, D) * 0.4, jnp.float32) for _ in range(3)]
    ws = [
        jnp.asarray(rng.randn(K, D, D) * 0.2, jnp.float32)
        if i % 2 == 0
        else jnp.asarray(rng.randn(D) * 0.2, jnp.float32)
        for i in range(8)
    ]
    return acts, ws


def _mask(rate=0.35, seed=7):
    keep = 1.0 - rate
    m = jax.random.bernoulli(jax.random.PRNGKey(seed), keep, (B, N, T, H * T))
    return m.astype(jnp.float32) / keep


def _kernel(mask, *args, causal=(False, False, False)):
    return ap.fused_temporal_attention_dropout(
        *args, mask, causal[0], causal[1], causal[2], H, "float32",
        True, True, False,  # use_pallas, interpret, partitioned off
    )


def _oracle(mask, *args, causal=(False, False, False)):
    return ap._ref_impl(
        *args, causal_q=causal[0], causal_kv=causal[1], is_mask=causal[2],
        heads=H, dtype_name="float32", dropout_mask=mask,
    )


@pytest.mark.parametrize("causal", [(False, False, False), (True, True, True)])
def test_dropout_kernel_fwd_matches_oracle(causal):
    (mq, mk, vs), ws = _args()
    mask = _mask()
    out_k = _kernel(mask, mq, mk, vs, *ws, causal=causal)
    out_r = _oracle(mask, mq, mk, vs, *ws, causal=causal)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), rtol=1e-5, atol=1e-5
    )


def test_dropout_kernel_grads_match_oracle():
    (mq, mk, vs), ws = _args()
    mask = _mask()
    argnums = tuple(range(1, 12))
    g_k = jax.grad(
        lambda m, *a: jnp.sum(jnp.sin(_kernel(m, *a))), argnums=argnums
    )(mask, mq, mk, vs, *ws)
    g_r = jax.grad(
        lambda m, *a: jnp.sum(jnp.sin(_oracle(m, *a))), argnums=argnums
    )(mask, mq, mk, vs, *ws)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_dropout_mask_gets_zero_gradient():
    (mq, mk, vs), ws = _args()
    mask = _mask()
    g = jax.grad(lambda m: jnp.sum(_kernel(m, mq, mk, vs, *ws)))(mask)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_all_keep_mask_equals_no_dropout_kernel():
    (mq, mk, vs), ws = _args()
    ones = jnp.ones((B, N, T, H * T), jnp.float32)
    out_d = _kernel(ones, mq, mk, vs, *ws)
    out_0 = ap.fused_temporal_attention(
        mq, mk, vs, *ws, False, False, False, H, "float32", True, True, False
    )
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_0), rtol=1e-6, atol=1e-6
    )


def test_loop_middle_matches_blockdiag(monkeypatch):
    """Both attention middles implement the same dropout math."""
    (mq, mk, vs), ws = _args()
    mask = _mask(rate=0.5, seed=3)
    out_bd = _kernel(mask, mq, mk, vs, *ws)
    gs_bd = jax.grad(lambda *a: jnp.sum(_kernel(mask, *a) ** 2), argnums=(0, 3))(
        mq, mk, vs, *ws
    )
    monkeypatch.setattr(ap, "_MIDDLE", "loop")
    out_lp = _kernel(mask, mq, mk, vs, *ws)
    gs_lp = jax.grad(lambda *a: jnp.sum(_kernel(mask, *a) ** 2), argnums=(0, 3))(
        mq, mk, vs, *ws
    )
    np.testing.assert_allclose(
        np.asarray(out_bd), np.asarray(out_lp), rtol=1e-5, atol=1e-5
    )
    for a, b in zip(gs_bd, gs_lp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_dropout_actually_drops():
    """A rate-0.5 mask must change the output (dropout is live, not a no-op)."""
    (mq, mk, vs), ws = _args()
    out_d = _kernel(_mask(rate=0.5, seed=11), mq, mk, vs, *ws)
    out_0 = _kernel(jnp.ones((B, N, T, H * T), jnp.float32), mq, mk, vs, *ws)
    assert float(jnp.max(jnp.abs(out_d - out_0))) > 1e-3


@pytest.mark.parametrize("causal", [(False, False, False), (True, True, True)])
def test_dot_build_matches_where_build(monkeypatch, causal):
    """Round-5 VPU-gap attempt: the selector-matmul ("dot") blockdiag build
    must be numerically identical to the select+concat ("where") build —
    the selector entries are exact {0,1} floats, so every moved value is
    bit-preserved up to f32 summation order. Pinned fwd + input/weight
    grads, with and without the causal mask and dropout."""
    (mq, mk, vs), ws = _args(seed=5)
    mask = _mask(rate=0.4, seed=9)

    def run():
        out = _kernel(mask, mq, mk, vs, *ws, causal=causal)
        gs = jax.grad(
            lambda *a: jnp.sum(jnp.sin(_kernel(mask, *a, causal=causal))),
            argnums=(0, 1, 2, 3, 9),
        )(mq, mk, vs, *ws)
        out_nd = ap.fused_temporal_attention(
            mq, mk, vs, *ws, causal[0], causal[1], causal[2], H, "float32",
            True, True, False,
        )
        return (out, out_nd) + gs

    monkeypatch.setattr(ap, "_BD_BUILD", "where")
    ref = run()
    monkeypatch.setattr(ap, "_BD_BUILD", "dot")
    got = run()
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_dot_build_matches_oracle(monkeypatch):
    """And directly against the jnp oracle (not just the sibling build)."""
    (mq, mk, vs), ws = _args(seed=6)
    monkeypatch.setattr(ap, "_BD_BUILD", "dot")
    out_k = ap.fused_temporal_attention(
        mq, mk, vs, *ws, False, False, False, H, "float32", True, True, False
    )
    out_r = ap._ref_impl(
        mq, mk, vs, *ws, causal_q=False, causal_kv=False, is_mask=False,
        heads=H, dtype_name="float32",
    )
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), rtol=1e-5, atol=1e-5
    )
