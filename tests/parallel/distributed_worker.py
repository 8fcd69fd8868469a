"""Worker for the two-process ``jax.distributed`` smoke test.

Launched by ``test_distributed.py`` as ``python distributed_worker.py
<process_id> <num_processes> <port> <outdir>``. Each process owns 4 virtual
CPU devices; the global mesh is 8. Runs one D3STN data-parallel train step
(each process feeding its own shard of the global batch through
``Trainer._device_put``'s ``make_array_from_process_local_data`` path) plus a
process-local eval, and writes its results as JSON for the parent to compare.
"""

import json
import os
import sys


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "step"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from paddlexde_tpu.models.d3stn import Trainer, synthetic_traffic_npz
    from paddlexde_tpu.models.d3stn.config import D3STNConfig
    from paddlexde_tpu.parallel import make_mesh

    n_nodes = 8
    cfg = D3STNConfig(
        dataset_name="SYNTH",
        num_nodes=n_nodes,
        his_len=64,
        tgt_len=12,
        encoder_num_layers=1,
        decoder_num_layers=1,
        d_model=16,
        d_proj=8,
        d_sect=4,
        d_adaptive=0,
        head=2,
        top_k=3,
        attention="Corr",
        batch_size=4,  # per-process: global batch = 8
        train_epochs=1,
        finetune_epochs=0,
        # SHARED across processes — the real multi-host contract: rank 0 is
        # the single checkpoint writer, every rank loads after the collective
        # barrier in Trainer.load()
        save_dir=os.path.join(outdir, "shared_ckpt"),
    )
    data = synthetic_traffic_npz(num_nodes=n_nodes, seq_len=288 * 3)
    rng = np.random.RandomState(0)
    adj = ((rng.rand(n_nodes, n_nodes) < 0.5)).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(n_nodes, n_nodes).astype(np.float32)

    tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc,
                 mesh=make_mesh({"data": 4 * nproc}))
    assert tr.process_count == nproc and tr.process_index == pid

    if mode == "epoch":
        # mini-epoch e2e (VERDICT r4 next-step 6): the full Trainer.train()
        # loop — per-process shard feeding, jitted DP steps, epoch loss
        # accounting, eval — across two REAL processes. Every process runs
        # the same GLOBAL computation, so the final state must agree
        # bit-for-bit across processes.
        tr.train()
        leaves = jax.tree.leaves(tr.state)
        params_sum = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float64)))
                               for l in leaves))
        eval_loss = tr.compute_eval_loss()
        with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
            json.dump({"eval_loss": eval_loss,
                       "params_sum": repr(params_sum)}, f)
        jax.distributed.shutdown()
        return

    src, tgt = next(tr.train_dataset.batches(
        cfg.batch_size, process_index=pid, process_count=nproc
    ))
    out = tr._train_step(
        tr.state, tr.opt_state, tr._device_put(np.array(src)),
        tr._device_put(np.array(tgt)), jnp.asarray(0.01, jnp.float32),
        jnp.asarray(1e-3, jnp.float32), jnp.asarray(1e-4, jnp.float32),
        jax.random.key(0),
    )
    train_loss = float(out[2])
    eval_loss = tr.compute_eval_loss()

    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump({"train_loss": train_loss, "eval_loss": eval_loss}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
