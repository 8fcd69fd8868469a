"""Pin bench.py's JSON contract (VERDICT r3 next-step 7).

The r02->r03 headline change (per-call -> device-side steps/s) made the
cross-round trend unreadable without both series. This pins that EVERY
future BENCH_rNN.json carries: the device-side headline ("value"), the
per-call series, the dispatch floor, the eager baseline, and the flagship
D3STN bs-32 device step — bench.main() asserts REQUIRED_RECORD_KEYS before
printing, and this test pins the constant's contents so neither side can
drift silently.
"""

import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_required_keys_pinned():
    required = set(bench.REQUIRED_RECORD_KEYS)
    # the three solver series + driver contract + flagship step
    assert {"metric", "value", "unit", "vs_baseline"} <= required
    assert "call_steps_per_sec" in required       # r02 per-call definition
    assert "dispatch_floor_ms" in required        # what a single-solve user feels
    assert "eager_steps_per_sec" in required      # the baseline stand-in
    assert "d3stn_bs32_device_ms_per_step" in required
    assert "d3stn_bs32_samples_per_sec" in required


def test_main_asserts_before_print():
    """main() must check REQUIRED_RECORD_KEYS against the record before the
    final print — verified structurally (running main needs the TPU)."""
    src = open(os.path.join(os.path.dirname(bench.__file__) or ".",
                            "bench.py")).read()
    tree = ast.parse(src)
    main_fn = next(n for n in tree.body
                   if isinstance(n, ast.FunctionDef) and n.name == "main")
    dump = ast.dump(main_fn)
    assert "REQUIRED_RECORD_KEYS" in dump, (
        "bench.main() no longer consults REQUIRED_RECORD_KEYS before printing"
    )
    assert dump.count("Assert") >= 1
