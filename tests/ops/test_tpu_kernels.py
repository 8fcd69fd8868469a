"""Mosaic-compiled kernel numerics on the REAL chip (@pytest.mark.tpu).

The interpret-mode equality pins (test_gcn_pallas.py, test_attn_pallas.py,
test_ops_pallas.py) validate kernel MATH on CPU; this file validates the
Mosaic-COMPILED path on the v5e — previously a manual tool run
(tools/bench_attn_kernel.py), now a regression net (VERDICT r2 next-step 5).
Includes the VMEM tile-ladder regression: tile 17 must compile fwd+bwd
everywhere; tile-34 backward sits at 16.0-16.3M scoped VMEM against the 16M
limit (compiles on some surrounding programs, OOMs on others — ROADMAP r2)
and is explicitly skipped, not silently flaky.

Run: tools/run_tpu_tests.sh  (sets PXT_TPU_TESTS=1; ~2-5 min warm,
first-ever run ~15 min of remote Mosaic compiles, cached afterwards).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("real TPU required")


# PEMS08-like slice: N=34 -> two tiles of 17 (the shipped tile cap)
B, N, T, D, K, H = 4, 34, 12, 128, 3, 8


def _attn_args(seed=0):
    rng = np.random.RandomState(seed)
    acts = [jnp.asarray(rng.randn(B, N, T, D) * 0.3, jnp.float32) for _ in range(3)]
    ws = [
        jnp.asarray(rng.randn(K, D, D) * 0.05, jnp.float32)
        if i % 2 == 0
        else jnp.asarray(rng.randn(D) * 0.05, jnp.float32)
        for i in range(8)
    ]
    return acts, ws


@pytest.mark.parametrize(
    "causal_q,causal_kv,is_mask",
    [(False, False, False),  # encoder self-attention
     (True, True, True),     # decoder masked self-attention
     (True, False, False)],  # decoder cross-attention
)
def test_attn_kernel_compiled_matches_oracle(causal_q, causal_kv, is_mask):
    from paddlexde_tpu.ops.attn_pallas import _ref_impl, fused_temporal_attention

    (mq, mk, vs), ws = _attn_args()

    def kernel(*args):
        return fused_temporal_attention(
            *args, causal_q, causal_kv, is_mask, H, "float32", True, False
        )

    def oracle(*args):
        return _ref_impl(
            *args, causal_q=causal_q, causal_kv=causal_kv, is_mask=is_mask,
            heads=H, dtype_name="float32",
        )

    # tolerance calibration: interpret-mode tests pin the kernel MATH exact;
    # here kernel and oracle are both Mosaic/XLA-compiled f32 whose MXU
    # matmul passes round differently — measured fwd max-abs divergence
    # 9.3e-4 over the conv->MHA->conv chain (D=128 contractions)
    out_k = jax.jit(kernel)(mq, mk, vs, *ws)
    out_r = jax.jit(oracle)(mq, mk, vs, *ws)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), rtol=2e-3, atol=3e-3
    )

    loss_k = lambda *a: jnp.sum(jnp.sin(kernel(*a)))
    loss_r = lambda *a: jnp.sum(jnp.sin(oracle(*a)))
    argnums = tuple(range(11))
    g_k = jax.jit(jax.grad(loss_k, argnums=argnums))(mq, mk, vs, *ws)
    g_r = jax.jit(jax.grad(loss_r, argnums=argnums))(mq, mk, vs, *ws)
    for a, b in zip(g_k, g_r):
        # max-normalized compare: measured worst activation/kernel violator
        # 3.1e-3 (6 of 209k elements) between the two compiled f32 backward
        # graphs. BIAS grads ([D]-shaped) are sums of ~200k sign-canceling
        # O(1e-3) terms — two differently-fused f32 reductions legitimately
        # diverge ~1e-2 absolute there (measured 9.6e-3); the interpret-mode
        # suite pins their math exactly, so the on-chip pin is coarser.
        a, b = np.asarray(a), np.asarray(b)
        atol = 2.5e-2 if a.ndim == 1 else 5e-3
        scale = np.maximum(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-2, atol=atol)


def test_attn_dropout_kernel_compiled_matches_oracle():
    """The in-kernel dropout variant (round 3) on the Mosaic-compiled path:
    same mask -> fwd + grads match the jnp oracle at the calibrated
    compiled-f32 tolerances (see test_attn_kernel_compiled_matches_oracle)."""
    from paddlexde_tpu.ops.attn_pallas import (
        _ref_impl,
        fused_temporal_attention_dropout,
    )

    (mq, mk, vs), ws = _attn_args(seed=5)
    keep = 0.7
    mask = (
        jax.random.bernoulli(jax.random.PRNGKey(0), keep, (B, N, T, H * T))
        .astype(jnp.float32) / keep
    )

    def kernel(m, *args):
        return fused_temporal_attention_dropout(
            *args, m, False, False, False, H, "float32", True, False
        )

    def oracle(m, *args):
        return _ref_impl(
            *args, causal_q=False, causal_kv=False, is_mask=False,
            heads=H, dtype_name="float32", dropout_mask=m,
        )

    out_k = jax.jit(kernel)(mask, mq, mk, vs, *ws)
    out_r = jax.jit(oracle)(mask, mq, mk, vs, *ws)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), rtol=2e-3, atol=3e-3
    )

    argnums = tuple(range(1, 12))
    g_k = jax.jit(jax.grad(
        lambda m, *a: jnp.sum(jnp.sin(kernel(m, *a))), argnums=argnums
    ))(mask, mq, mk, vs, *ws)
    g_r = jax.jit(jax.grad(
        lambda m, *a: jnp.sum(jnp.sin(oracle(m, *a))), argnums=argnums
    ))(mask, mq, mk, vs, *ws)
    for a, b in zip(g_k, g_r):
        a, b = np.asarray(a), np.asarray(b)
        atol = 2.5e-2 if a.ndim == 1 else 5e-3
        scale = np.maximum(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, rtol=2e-2, atol=atol)


def test_gcn_kernel_compiled_matches_oracle():
    from paddlexde_tpu.ops.gcn_pallas import _ref_impl, gcn_spatial_mix

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, N, T, D) * 0.3, jnp.float32)
    gate = jnp.asarray(rng.rand(N, N), jnp.float32)
    s2 = 1.0 / np.sqrt(D)

    out_k = jax.jit(lambda x, g: gcn_spatial_mix(x, g, s2, "float32", True, False))(x, gate)
    out_r = jax.jit(lambda x, g: _ref_impl(x, g, s2, "float32"))(x, gate)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), rtol=2e-4, atol=2e-4
    )

    loss_k = lambda x, g: jnp.sum(jnp.sin(gcn_spatial_mix(x, g, s2, "float32", True, False)))
    loss_r = lambda x, g: jnp.sum(jnp.sin(_ref_impl(x, g, s2, "float32")))
    g_k = jax.jit(jax.grad(loss_k, argnums=(0, 1)))(x, gate)
    g_r = jax.jit(jax.grad(loss_r, argnums=(0, 1)))(x, gate)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3
        )


def test_spline_kernel_compiled_matches_oracle():
    from paddlexde_tpu.ops import hermite_gather_eval

    rng = np.random.RandomState(2)
    series = jnp.asarray(rng.randn(2, 8, 288, 3), jnp.float32)
    t = jnp.arange(288, dtype=jnp.float32)
    q = jnp.asarray(np.sort(rng.rand(12)).astype(np.float32) * 287)
    out_k = jax.jit(lambda s, t, q: hermite_gather_eval(s, t, q, True))(series, t, q)
    out_r = jax.jit(lambda s, t, q: hermite_gather_eval(s, t, q, False))(series, t, q)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_r), rtol=1e-5, atol=1e-5
    )


def test_attn_tile_ladder():
    """Tile 17 (the shipped cap) compiles fwd+bwd at N=34. Tile 34's BACKWARD
    is the measured VMEM-edge config (16.0-16.3M scoped vs the 16M limit,
    flaky across surrounding programs — ROADMAP r2): explicitly not exercised
    so the suite can never inherit the flake; its forward alone compiles."""
    from paddlexde_tpu.ops import attn_pallas

    (mq, mk, vs), ws = _attn_args(seed=3)

    def run(cap, with_bwd):
        # both caps: _call_fwd reads _TILE_CAP_FWD, _call_bwd reads _TILE_CAP
        old = attn_pallas._TILE_CAP, attn_pallas._TILE_CAP_FWD
        attn_pallas._TILE_CAP = attn_pallas._TILE_CAP_FWD = cap
        try:
            f = lambda *a: jnp.sum(
                attn_pallas.fused_temporal_attention(
                    *a, False, False, False, H, "float32", True, False
                )
            )
            out = jax.jit(f)(mq, mk, vs, *ws)
            jax.block_until_ready(out)
            if with_bwd:
                g = jax.jit(jax.grad(f, argnums=(0,)))(mq, mk, vs, *ws)
                jax.block_until_ready(g)
        finally:
            attn_pallas._TILE_CAP, attn_pallas._TILE_CAP_FWD = old

    run(17, with_bwd=True)  # must always compile
    run(34, with_bwd=False)  # fwd fits comfortably
    # tile-34 bwd: asserted-skipped, see docstring (do NOT "fix" by running it)