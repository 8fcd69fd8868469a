"""Data-parallel correctness on an 8-virtual-device CPU mesh.

This is the SURVEY §4 "multi-node story" the reference lacked: DP sharding of
the D3STN train step must produce the SAME loss and updated parameters as the
single-device run on the identical global batch — XLA's inserted psum replaces
``DataParallel`` + ``fused_allreduce_gradients`` exactly (SURVEY §2.10).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from paddlexde_tpu.parallel import NamedSharding, P, make_mesh, replicate, shard_batch


def _setup_model():
    from paddlexde_tpu.models.d3stn import D3STN, D3STNConfig, norm_adj_matrix

    cfg = D3STNConfig(
        dataset_name="SYNTH", num_nodes=8, his_len=64, tgt_len=12,
        encoder_num_layers=1, decoder_num_layers=1, d_model=16, d_proj=8,
        d_sect=4, d_adaptive=0, head=2, top_k=3,
    )
    rng = np.random.RandomState(0)
    adj = np.maximum((rng.rand(8, 8) < 0.4).astype(np.float32), np.eye(8, dtype=np.float32))
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(8, 8).astype(np.float32)
    model_adj = jnp.asarray(norm_adj_matrix(adj).astype(np.float32))
    model_sc = jnp.asarray(norm_adj_matrix(sc).astype(np.float32))
    model = D3STN(cfg, model_adj, model_sc)
    dummy = jnp.zeros((1, 8, 12, 3), jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy)["params"]
    return cfg, model, params


def _loss_fn(model, cfg, params, enc_idx, dec_idx, src, tgt):
    from paddlexde_tpu.functional.ddeint import ddeint
    from paddlexde_tpu.xde.history import history_index

    his_span = jnp.arange(cfg.his_len, dtype=jnp.float32)
    y0 = history_index(dec_idx, src, his_span, interpolation="cubic")
    func = lambda y_lags, y: model.apply({"params": params}, y_lags, y)
    sol, delay = ddeint(
        func, y0, jnp.arange(2.0, dtype=jnp.float32), enc_idx, src, his_span,
        "euler", fixed_solver_interp="", time_axis=0,
    )
    preds = sol[1][..., :1]
    return jnp.mean(jnp.abs(preds - tgt[..., :1]))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dp_matches_single_device():
    cfg, model, params = _setup_model()
    from paddlexde_tpu.models.d3stn import init_lag_anchors

    enc, dec = init_lag_anchors(cfg)
    rng = np.random.RandomState(1)
    src = rng.rand(16, 8, cfg.his_len, 3).astype(np.float32)
    src[..., 1] = rng.randint(0, 7, src[..., 1].shape)
    src[..., 2] = rng.randint(0, 288, src[..., 2].shape)
    tgt = rng.rand(16, 8, cfg.tgt_len, 3).astype(np.float32)

    state = {"net": params, "enc": jnp.asarray(enc), "dec": jnp.asarray(dec)}
    tx = optax.sgd(1e-2)
    opt0 = tx.init(state)

    def train_step(state, opt_state, src, tgt):
        loss, grads = jax.value_and_grad(
            lambda st: _loss_fn(model, cfg, st["net"], st["enc"], st["dec"], src, tgt)
        )(state)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(state, updates), opt_state, loss

    # single device
    s1, _, l1 = jax.jit(train_step)(state, opt0, jnp.asarray(src), jnp.asarray(tgt))

    # 8-way data parallel
    mesh = make_mesh({"data": 8})
    state_r = replicate(state, mesh)
    opt_r = replicate(opt0, mesh)
    src_s = shard_batch(jnp.asarray(src), mesh)
    tgt_s = shard_batch(jnp.asarray(tgt), mesh)
    s8, _, l8 = jax.jit(train_step)(state_r, opt_r, src_s, tgt_s)

    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-6)
    for k in ("enc", "dec"):
        np.testing.assert_allclose(np.asarray(s8[k]), np.asarray(s1[k]), rtol=1e-5)
    l1_leaves = jax.tree.leaves(s1["net"])
    l8_leaves = jax.tree.leaves(s8["net"])
    for a, b in zip(l8_leaves, l1_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_mesh_helpers():
    mesh = make_mesh({"data": 4, "model": 2})
    assert mesh.shape == {"data": 4, "model": 2}
    x = jnp.zeros((8, 16))
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data")
    with pytest.raises(ValueError):
        make_mesh({"data": 5})


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_2d_data_space_sharding():
    """2D mesh (data x space): batch sharded over `data`, the sensor axis N
    sharded over `space`. GSPMD inserts the all-gathers the spatial-attention
    GCN needs; the loss must match the single-device value exactly."""
    cfg, model, params = _setup_model()
    from paddlexde_tpu.models.d3stn import init_lag_anchors

    enc, dec = init_lag_anchors(cfg)
    rng = np.random.RandomState(2)
    src = rng.rand(8, 8, cfg.his_len, 3).astype(np.float32)
    src[..., 1] = rng.randint(0, 7, src[..., 1].shape)
    src[..., 2] = rng.randint(0, 288, src[..., 2].shape)
    tgt = rng.rand(8, 8, cfg.tgt_len, 3).astype(np.float32)

    def loss_fn(src, tgt):
        return _loss_fn(model, cfg, params, jnp.asarray(enc), jnp.asarray(dec), src, tgt)

    l_single = float(jax.jit(loss_fn)(jnp.asarray(src), jnp.asarray(tgt)))

    mesh = make_mesh({"data": 4, "space": 2})
    sh = NamedSharding(mesh, P("data", "space"))
    src_s = jax.device_put(jnp.asarray(src), sh)
    tgt_s = jax.device_put(jnp.asarray(tgt), sh)
    l_2d = float(jax.jit(loss_fn)(src_s, tgt_s))
    np.testing.assert_allclose(l_2d, l_single, rtol=1e-6)
