"""prefetch: ordering, buffer-snapshot semantics, error propagation."""

import numpy as np
import pytest

from paddlexde_tpu.utils import prefetch


def test_order_and_snapshot():
    buf = np.zeros(3)

    def gen():
        for i in range(5):
            buf[:] = i  # reused buffer, like the dataset
            yield (buf,)

    got = [float(item[0][0]) for item in prefetch(gen(), depth=2)]
    assert got == [0.0, 1.0, 2.0, 3.0, 4.0]  # device_put snapshots each item


def test_error_propagates():
    def gen():
        yield (np.zeros(1),)
        raise RuntimeError("boom")

    it = prefetch(gen(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_early_termination_stops_producer():
    import threading
    import time

    n_before = threading.active_count()

    def gen():
        for i in range(1000):
            yield (np.full(3, i),)

    it = prefetch(gen(), depth=2)
    next(it)
    it.close()  # abandon early
    deadline = time.time() + 5
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before


def test_depth_zero_rejected():
    with pytest.raises(ValueError):
        next(prefetch(iter([(np.zeros(1),)]), depth=0))


def test_time_major_layout():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from paddlexde_tpu.models.d3stn import (
        D3STNConfig,
        TrafficFlowDataset,
        synthetic_traffic_npz,
    )

    cfg = D3STNConfig(dataset_name="S", num_nodes=4, his_len=32, tgt_len=12,
                      d_model=16, d_proj=8, d_sect=4, d_adaptive=0)
    ds = TrafficFlowDataset(cfg, "train", data=synthetic_traffic_npz(4, 288 * 2))
    his_tm, tgt_tm = next(ds.batches(3, time_major=True))
    his, tgt = next(ds.batches(3))
    np.testing.assert_array_equal(his_tm.transpose(0, 2, 1, 3), his)
    np.testing.assert_array_equal(tgt_tm.transpose(0, 2, 1, 3), tgt)
