"""SPMD partitioning of the Pallas kernels (ops/partition.py).

Under a multi-device mesh the kernels must shard their batch (attention: and
node) dims instead of replicating — the custom_partitioning rule added in
round 3 (VERDICT r2 next-step 1). Pinned here on the 8-device CPU mesh with
interpret-mode kernels: sharded fwd/grad outputs equal the single-device
run, batched outputs come back sharded, and reduced outputs (weight/gate
grads) come back replicated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paddlexde_tpu.ops.attn_pallas import fused_temporal_attention
from paddlexde_tpu.ops.gcn_pallas import gcn_spatial_mix

B, N, T, D, K, H = 8, 6, 5, 16, 3, 4


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))


def _attn_args():
    rng = np.random.RandomState(0)
    acts = [jnp.asarray(rng.randn(B, N, T, D), jnp.float32) for _ in range(3)]
    ws = [
        jnp.asarray(rng.randn(K, D, D) * 0.1, jnp.float32)
        if i % 2 == 0
        else jnp.asarray(rng.randn(D) * 0.1, jnp.float32)
        for i in range(8)
    ]
    return acts, ws


def _attn(mq, mk, vs, *ws):
    return fused_temporal_attention(
        mq, mk, vs, *ws, False, False, False, H, "float32", True, True
    )


def test_attn_kernel_sharded_matches_single_device(mesh):
    (mq, mk, vs), ws = _attn_args()
    shard = lambda a: jax.device_put(a, NamedSharding(mesh, P("data")))
    repl = lambda a: jax.device_put(a, NamedSharding(mesh, P()))

    out_s = jax.jit(_attn)(shard(mq), shard(mk), shard(vs), *map(repl, ws))
    out_1 = jax.jit(_attn)(mq, mk, vs, *ws)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_1))
    assert out_s.sharding.spec == P("data")

    loss = lambda *a: jnp.sum(_attn(*a) ** 2)
    g_s = jax.jit(jax.grad(loss, argnums=(0, 2, 3, 4)))(
        shard(mq), shard(mk), shard(vs), *map(repl, ws)
    )
    g_1 = jax.jit(jax.grad(loss, argnums=(0, 2, 3, 4)))(mq, mk, vs, *ws)
    for a, b in zip(g_s, g_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert g_s[0].sharding.spec == P("data")  # dmq: stays batch-sharded
    assert g_s[2].sharding.spec == P()  # dwq: psum'd, replicated
    assert g_s[3].sharding.spec == P()  # dbq


def test_attn_dropout_kernel_sharded_matches_single_device(mesh):
    """The in-kernel dropout variant (round 3) has its own partitioning rule:
    the mask shards with the batch, weight grads still psum."""
    from paddlexde_tpu.ops.attn_pallas import fused_temporal_attention_dropout

    (mq, mk, vs), ws = _attn_args()
    keep = 0.6
    mask = (
        jax.random.bernoulli(jax.random.PRNGKey(2), keep, (B, N, T, H * T))
        .astype(jnp.float32) / keep
    )

    def f(m, mq, mk, vs, *ws):
        return fused_temporal_attention_dropout(
            mq, mk, vs, *ws, m, False, False, False, H, "float32", True, True
        )

    shard = lambda a: jax.device_put(a, NamedSharding(mesh, P("data")))
    repl = lambda a: jax.device_put(a, NamedSharding(mesh, P()))
    out_s = jax.jit(f)(shard(mask), shard(mq), shard(mk), shard(vs),
                       *map(repl, ws))
    out_1 = jax.jit(f)(mask, mq, mk, vs, *ws)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_1))
    assert out_s.sharding.spec == P("data")

    loss = lambda *a: jnp.sum(f(*a) ** 2)
    g_s = jax.jit(jax.grad(loss, argnums=(1, 4)))(
        shard(mask), shard(mq), shard(mk), shard(vs), *map(repl, ws)
    )
    g_1 = jax.jit(jax.grad(loss, argnums=(1, 4)))(mask, mq, mk, vs, *ws)
    for a, b in zip(g_s, g_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert g_s[0].sharding.spec == P("data")  # dmq batch-sharded
    assert g_s[1].sharding.spec == P()  # dwq psum'd


def test_attn_kernel_node_sharding(mesh):
    """The node dim is per-tile independent (the mix is hoisted outside):
    sharding N=6 over 2 mesh devices must also reproduce single-device."""
    mesh2 = Mesh(np.array(jax.devices()[:2]).reshape(2), ("space",))
    (mq, mk, vs), ws = _attn_args()
    shard = lambda a: jax.device_put(a, NamedSharding(mesh2, P(None, "space")))
    repl = lambda a: jax.device_put(a, NamedSharding(mesh2, P()))
    out_s = jax.jit(_attn)(shard(mq), shard(mk), shard(vs), *map(repl, ws))
    out_1 = jax.jit(_attn)(mq, mk, vs, *ws)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_1))
    assert out_s.sharding.spec == P(None, "space")


def test_gcn_kernel_sharded_matches_single_device(mesh):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, N, T, D), jnp.float32)
    gate = jnp.asarray(rng.rand(N, N), jnp.float32)
    shard = lambda a: jax.device_put(a, NamedSharding(mesh, P("data")))
    repl = lambda a: jax.device_put(a, NamedSharding(mesh, P()))

    f = lambda x, gate: gcn_spatial_mix(x, gate, 0.5, "float32", True, True)
    out_s = jax.jit(f)(shard(x), repl(gate))
    out_1 = jax.jit(f)(x, gate)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_1))
    assert out_s.sharding.spec == P("data")

    loss = lambda x, gate: jnp.sum(f(x, gate) ** 2)
    g_s = jax.jit(jax.grad(loss, argnums=(0, 1)))(shard(x), repl(gate))
    g_1 = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, gate)
    np.testing.assert_allclose(np.asarray(g_s[0]), np.asarray(g_1[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_s[1]), np.asarray(g_1[1]), atol=1e-5)
    assert g_s[0].sharding.spec == P("data")
    assert g_s[1].sharding.spec == P()  # dgate: psum'd


def test_kernel_unsharded_and_eager_paths_unchanged(mesh):
    """No mesh / no jit: the partitioning wrapper must be a no-op."""
    (mq, mk, vs), ws = _attn_args()
    out_jit = jax.jit(_attn)(mq, mk, vs, *ws)
    out_eager = _attn(mq, mk, vs, *ws)
    np.testing.assert_allclose(
        np.asarray(out_eager), np.asarray(out_jit), atol=1e-6
    )
