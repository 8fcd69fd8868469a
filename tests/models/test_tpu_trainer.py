"""On-chip flagship regression (@pytest.mark.tpu): the D3STN train step with
Mosaic-compiled kernels must produce the SAME loss with and without a mesh
(the custom_partitioning path, VERDICT r2 next-step 1 — a 1-device mesh still
exercises the full Shardy partition + per-shard lowering + Mosaic pipeline).

Runs via tools/run_tpu_tests.sh; delegates to tools/verify_mesh_kernels.py
(the round-3 verification recipe) so the manual tool and the regression net
cannot drift apart.
"""

import os
import sys

import jax
import pytest

pytestmark = pytest.mark.tpu


def test_mesh_trainer_step_matches_no_mesh():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("real TPU required")
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "..", "tools")
    )
    import verify_mesh_kernels

    verify_mesh_kernels.main()  # asserts internally
