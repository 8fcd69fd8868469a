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
