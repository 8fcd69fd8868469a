"""Fused spatial-attention GCN kernel (ops/gcn_pallas.py): the Pallas path
(interpret mode on CPU) must match the model's einsum formulation exactly —
forward, dx, and dgate — in both compute dtypes, so routing the model through
the kernel can never change results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlexde_tpu.ops.gcn_pallas import _ref_impl, gcn_spatial_mix


@pytest.fixture(autouse=True)
def _f32(monkeypatch):
    # kernel math is f32 (TPU register width); run the comparison in f32 too
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)


def _data(B=3, N=24, T=5, D=16, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, N, T, D).astype(np.float32))
    gate = jnp.asarray(rng.rand(N, N).astype(np.float32))
    return x, gate


@pytest.mark.parametrize("dtype_name", ["float32", "bfloat16"])
def test_forward_matches_reference(dtype_name):
    x, gate = _data()
    s2 = 1.0 / np.sqrt(32.0)
    ref = _ref_impl(x, gate, s2, dtype_name)
    out = gcn_spatial_mix(x, gate, s2, dtype_name, True, True)  # interpret
    assert out.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=1e-5, atol=1e-6,
    )


def test_gradients_match_reference():
    x, gate = _data(seed=1)
    s2 = 1.0 / np.sqrt(32.0)

    def loss_k(x, gate):
        return jnp.sum(jnp.sin(gcn_spatial_mix(x, gate, s2, "float32", True, True)))

    def loss_r(x, gate):
        return jnp.sum(jnp.sin(_ref_impl(x, gate, s2, "float32")))

    gk = jax.grad(loss_k, argnums=(0, 1))(x, gate)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, gate)
    np.testing.assert_allclose(gk[0], gr[0], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(gk[1], gr[1], rtol=2e-5, atol=2e-6)


def test_scale_identity_when_not_scaled():
    """scale2=1.0 == the is_scale=False configuration."""
    x, gate = _data(seed=2)
    out = gcn_spatial_mix(x, gate, 1.0, "float32", True, True)
    ref = _ref_impl(x, gate, 1.0, "float32")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_model_routes_through_kernel_equivalently():
    """SpatialAttentionGCN with gcn_impl='xla' vs the kernel's reference path
    (= what 'pallas' computes, pinned above) agree through the full module —
    same params, same output."""
    import flax.linen as nn

    from paddlexde_tpu.models.d3stn import D3STNConfig
    from paddlexde_tpu.models.d3stn.model import SpatialAttentionGCN

    rng = np.random.RandomState(3)
    N = 16
    cfg = D3STNConfig(
        num_nodes=N, d_model=32, d_proj=8, d_sect=8, d_adaptive=8,
        encoder_num_layers=1, decoder_num_layers=1, head=2,
    )
    adj = jnp.asarray(rng.rand(N, N).astype(np.float32))
    sc = jnp.asarray(rng.rand(N, N).astype(np.float32))
    x = jnp.asarray(rng.randn(2, N, 4, 32).astype(np.float32))

    m_xla = SpatialAttentionGCN(
        D3STNConfig(**{**cfg.__dict__, "gcn_impl": "xla"}), adj, sc
    )
    params = m_xla.init(jax.random.key(0), x)["params"]
    out_xla = m_xla.apply({"params": params}, x)

    # the 'pallas' routing falls back to XLA off-TPU only via pallas_available
    # in 'auto'; force the kernel's reference math through gcn_spatial_mix to
    # pin the module-level wiring (gate build, scale2, dense) around it
    from paddlexde_tpu.ops import gcn_pallas

    m_pal = SpatialAttentionGCN(
        D3STNConfig(**{**cfg.__dict__, "gcn_impl": "pallas"}), adj, sc
    )
    out_pal = m_pal.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_xla), rtol=1e-5, atol=1e-6
    )


def test_attention_kernel_matches_model():
    """fused_temporal_attention (interpret mode) == the attention module's
    XLA path at model level, for all three configurations (encoder self,
    decoder masked self, decoder src) — forward and a scalar-loss gradient."""
    from paddlexde_tpu.models.d3stn import D3STNConfig
    from paddlexde_tpu.models.d3stn.model import (
        MultiHeadAttentionAwareTemporalContext,
    )

    rng = np.random.RandomState(0)
    N, D, H, T = 10, 32, 4, 6
    base = dict(num_nodes=N, d_model=D, d_proj=16, d_sect=8, d_adaptive=0,
                head=H, top_k=3, attention="Corr")
    sc = jnp.asarray(rng.rand(N, N).astype(np.float32))
    x = jnp.asarray(rng.randn(2, N, T, D).astype(np.float32))
    mem = jnp.asarray(rng.randn(2, N, T, D).astype(np.float32))

    for qc, kc, mask, key_in in [(False, False, False, x),
                                 (True, True, True, x),
                                 (True, False, False, mem)]:
        m_x = MultiHeadAttentionAwareTemporalContext(
            D3STNConfig(attn_impl="xla", **base), sc, qc, kc)
        m_p = MultiHeadAttentionAwareTemporalContext(
            D3STNConfig(attn_impl="pallas", **base), sc, qc, kc)
        params = m_x.init(jax.random.key(0), x, key_in, key_in, mask)["params"]
        out_x = m_x.apply({"params": params}, x, key_in, key_in, mask)
        out_p = m_p.apply({"params": params}, x, key_in, key_in, mask)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   rtol=1e-4, atol=1e-5)

        def loss(mod):
            return lambda p, a, b: jnp.sum(
                jnp.sin(mod.apply({"params": p}, a, b, b, mask))
            )

        gx = jax.grad(loss(m_x))(params, x, key_in)
        gp = jax.grad(loss(m_p))(params, x, key_in)
        flat_x = jax.tree_util.tree_leaves(gx)
        flat_p = jax.tree_util.tree_leaves(gp)
        for a, b in zip(flat_p, flat_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)


def test_attention_kernel_batch_block_equality():
    """PXT_ATTN_BATCH_BLOCK (grid B/bt x N/tile, batch rows folded into the
    GEMM M-dim) must be a pure scheduling knob: bt=2 fwd and grads equal
    bt=1 exactly in interpret mode. Kept-knob regression (ROADMAP 11b —
    measured neutral on-chip at default-legal shapes, default stays 1)."""
    from paddlexde_tpu.ops import attn_pallas
    from paddlexde_tpu.ops.attn_pallas import fused_temporal_attention

    rng = np.random.RandomState(5)
    B, N, T, D, K, H = 4, 10, 6, 32, 3, 4
    acts = [jnp.asarray(rng.randn(B, N, T, D).astype(np.float32) * 0.3)
            for _ in range(3)]
    ws = [jnp.asarray((rng.randn(K, D, D) if i % 2 == 0 else rng.randn(D))
                      .astype(np.float32) * 0.05) for i in range(8)]

    def loss(*a):
        return jnp.sum(jnp.sin(fused_temporal_attention(
            *a, True, True, True, H, "float32", True, True, False)))

    def run():
        out = loss(*acts, *ws)
        g = jax.grad(loss, argnums=tuple(range(11)))(*acts, *ws)
        return out, g

    old = (attn_pallas._BATCH_BLOCK_FWD, attn_pallas._BATCH_BLOCK_BWD)
    try:
        attn_pallas._BATCH_BLOCK_FWD = attn_pallas._BATCH_BLOCK_BWD = 1
        out1, g1 = run()
        attn_pallas._BATCH_BLOCK_FWD = attn_pallas._BATCH_BLOCK_BWD = 2
        out2, g2 = run()
    finally:
        attn_pallas._BATCH_BLOCK_FWD, attn_pallas._BATCH_BLOCK_BWD = old

    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # weight/bias grads are accumulated across grid steps: bt=2 sums the
    # same terms in a different order (one 2x-M GEMM vs two accumulated
    # ones), so f32 bit-equality is too strict there — activation grads
    # stay per-element identical
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
