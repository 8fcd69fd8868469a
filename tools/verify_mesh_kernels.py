"""Verify the Pallas kernels run UNDER A MESH on the real chip.

Round-3 check (VERDICT r2 next-step 1): with ops/partition.py giving
pallas_call its SPMD partitioning rule, a Trainer over a mesh must keep
``attn_impl/gcn_impl='auto'`` resolved to the Mosaic-compiled kernels and the
train step must compile + run + produce the same loss as the no-mesh path.
On this box the TPU is a single chip, so the mesh is 1-device — that still
exercises the full custom_partitioning lowering path (Shardy partitions the
program, calls our per-shard lowering, Mosaic compiles the kernel inside it).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_mesh_kernels.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    import sys as _sys, os as _os
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from _cache import enable as _enable_cache
    _enable_cache(jax)
    import jax.numpy as jnp

    from paddlexde_tpu.models.d3stn import Trainer, synthetic_traffic_npz
    from paddlexde_tpu.models.d3stn.config import D3STNConfig
    from paddlexde_tpu.parallel import make_mesh

    print("devices:", jax.devices())
    n_nodes = 34
    cfg = dict(
        dataset_name="SYNTH",
        num_nodes=n_nodes,
        his_len=288,
        tgt_len=12,
        encoder_num_layers=2,
        decoder_num_layers=2,
        d_model=128,
        d_proj=64,
        d_sect=32,
        d_adaptive=0,
        head=8,
        top_k=4,
        attention="Corr",
        batch_size=8,
        train_epochs=1,
        finetune_epochs=0,
        save_dir="/tmp/verify_mesh",
    )
    data = synthetic_traffic_npz(num_nodes=n_nodes, seq_len=288 * 3)
    rng = np.random.RandomState(0)
    adj = np.maximum((rng.rand(n_nodes, n_nodes) < 0.3), 0).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(n_nodes, n_nodes).astype(np.float32)

    loss = {}
    for name, mesh in (("none", None), ("mesh1", make_mesh({"data": 1}))):
        tr = Trainer(D3STNConfig(**cfg), data=data, adj_matrix=adj,
                     sc_matrix=sc, mesh=mesh)
        assert tr.cfg.attn_impl == "auto" and tr.cfg.gcn_impl == "auto", (
            "trainer must not downgrade impls under a mesh"
        )
        src, tgt = next(tr.train_dataset.batches(8))
        t0 = time.time()
        out = tr._train_step(
            tr.state, tr.opt_state, tr._device_put(np.array(src)),
            tr._device_put(np.array(tgt)), jnp.asarray(0.01, jnp.float32),
            jnp.asarray(1e-3, jnp.float32), jnp.asarray(1e-4, jnp.float32),
            jax.random.key(0),
        )
        jax.block_until_ready(out)
        loss[name] = float(out[2])
        print(f"{name}: loss={loss[name]:.6f} (compile+step {time.time()-t0:.1f}s)")

    assert np.isfinite(loss["none"]) and np.isfinite(loss["mesh1"])
    np.testing.assert_allclose(loss["mesh1"], loss["none"], rtol=1e-5)
    print("OK: mesh-1 pallas train step == no-mesh train step "
          f"({loss['mesh1']:.6f} vs {loss['none']:.6f})")


if __name__ == "__main__":
    main()
