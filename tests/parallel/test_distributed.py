"""Two-process ``jax.distributed`` smoke test (VERDICT r2 next-step 6).

``initialize_distributed`` / the trainer's multi-process data path were
previously tested only single-process with simulated process indices. Here
two REAL processes (4 virtual CPU devices each, one 8-device global mesh)
run a D3STN data-parallel train step — each process feeds only its own shard
of the global batch through ``Trainer._device_put``'s
``make_array_from_process_local_data`` assembly — plus a process-local eval
aggregated with ``process_concat``. Both processes must agree with each
other bit-for-bit (same global computation) and with a single-process
8-device run of the same global batch to float tolerance.

Reference bar: the launch recipe this replaces is
``example/D3STN/README.md:53-59`` (DrownFish19/PaddleXDE).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


@pytest.mark.slow
def test_two_process_mini_epoch(tmp_path):
    """Full Trainer.train() mini-epoch over 2 real processes (VERDICT r4
    next-step 6): per-process shard feeding + jitted DP steps + eval, final
    state bit-equal across processes (same global computation)."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path),
             "epoch"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            msg = out.decode(errors="replace")[-2000:]
            if "distributed" in msg.lower() and (
                "unimplemented" in msg.lower() or "unavailable" in msg.lower()
            ):
                pytest.skip(f"jax.distributed unsupported here: {msg[-200:]}")
            raise AssertionError(f"worker {p.args} failed:\n{msg}")

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))
    # bit-equal final state across processes; finite eval
    assert results[0]["params_sum"] == results[1]["params_sum"], results
    assert np.isfinite(results[0]["eval_loss"])
    np.testing.assert_allclose(results[0]["eval_loss"],
                               results[1]["eval_loss"], rtol=1e-6)


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            msg = out.decode(errors="replace")[-2000:]
            if "distributed" in msg.lower() and (
                "unimplemented" in msg.lower() or "unavailable" in msg.lower()
            ):
                pytest.skip(f"jax.distributed unsupported here: {msg[-200:]}")
            raise AssertionError(f"worker {p.args} failed:\n{msg}")

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))
    # both processes see the same global computation
    assert results[0] == results[1], results

    # single-process reference on the same global batch (the parent already
    # has 8 CPU devices via conftest): batch_size 8 == 2 processes x 4
    import jax
    import jax.numpy as jnp

    from paddlexde_tpu.models.d3stn import Trainer, synthetic_traffic_npz
    from paddlexde_tpu.models.d3stn.config import D3STNConfig
    from paddlexde_tpu.parallel import make_mesh

    n_nodes = 8
    cfg = D3STNConfig(
        dataset_name="SYNTH", num_nodes=n_nodes, his_len=64, tgt_len=12,
        encoder_num_layers=1, decoder_num_layers=1, d_model=16, d_proj=8,
        d_sect=4, d_adaptive=0, head=2, top_k=3, attention="Corr",
        batch_size=8, train_epochs=1, finetune_epochs=0,
        save_dir=str(tmp_path / "ref"),
    )
    data = synthetic_traffic_npz(num_nodes=n_nodes, seq_len=288 * 3)
    rng = np.random.RandomState(0)
    adj = ((rng.rand(n_nodes, n_nodes) < 0.5)).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    sc = rng.rand(n_nodes, n_nodes).astype(np.float32)
    tr = Trainer(cfg, data=data, adj_matrix=adj, sc_matrix=sc,
                 mesh=make_mesh({"data": 8}))
    src, tgt = next(tr.train_dataset.batches(8))
    out = tr._train_step(
        tr.state, tr.opt_state, tr._device_put(np.array(src)),
        tr._device_put(np.array(tgt)), jnp.asarray(0.01, jnp.float32),
        jnp.asarray(1e-3, jnp.float32), jnp.asarray(1e-4, jnp.float32),
        jax.random.key(0),
    )
    # same sample SET (strided interleave vs prefix — the mean is
    # permutation-invariant), so the losses agree to reduction-order noise
    np.testing.assert_allclose(results[0]["train_loss"], float(out[2]),
                               rtol=1e-5)
    assert np.isfinite(results[0]["eval_loss"])
