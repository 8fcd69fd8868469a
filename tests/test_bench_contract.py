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
    # r5: adjoint ratio became device-side (chained marginal) WITH spread;
    # the per-call series continues under _call so the r02-r04 trend stays
    # readable (same discipline as the r03 headline redefinition)
    assert "adjoint_bwd_fwd_ratio" in required
    assert "adjoint_ratio_spread" in required
    assert "adjoint_bwd_fwd_ratio_call" in required


class _FakeProc:
    def __init__(self, rc=0, stdout="", stderr=""):
        self.returncode, self.stdout, self.stderr = rc, stdout, stderr


def test_d3stn_runner_retries_and_records_stderr(monkeypatch):
    """VERDICT r4 weak-1: one empty-stdout child must NOT null the flagship
    keys — the runner probes the device, waits out the wedge window, retries
    once, and on total failure records the child's stderr tail."""
    import subprocess

    calls = {"run": 0, "probe": 0, "sleep": []}
    monkeypatch.setattr(bench, "_device_probe",
                        lambda t: calls.__setitem__("probe",
                                                    calls["probe"] + 1) or True)
    monkeypatch.setattr(bench.time, "sleep",
                        lambda s: calls["sleep"].append(s))

    def fake_run(cmd, **kw):
        calls["run"] += 1
        if calls["run"] == 1:  # the BENCH_r04 failure mode: empty stdout
            return _FakeProc(rc=1, stdout="", stderr="wedged claim tail")
        return _FakeProc(stdout='{"device_ms_per_step": 60.1, '
                                '"device_samples_per_sec": 532.4, '
                                '"backend": "tpu"}')

    monkeypatch.setattr(subprocess, "run", fake_run)
    rec = bench._run_d3stn_bench()
    assert calls["run"] == 2 and calls["sleep"]  # retried after wedge wait
    assert rec["d3stn_bs32_device_ms_per_step"] == 60.1
    assert rec["d3stn_bs32_samples_per_sec"] == 532.4
    assert rec["d3stn_attempts"] == 2 and "d3stn_error" not in rec


def test_d3stn_runner_total_failure_is_diagnosable(monkeypatch):
    import subprocess

    monkeypatch.setattr(bench, "_device_probe", lambda t: True)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        subprocess, "run",
        lambda cmd, **kw: _FakeProc(rc=1, stdout="",
                                    stderr="XlaRuntimeError: claim held"))
    rec = bench._run_d3stn_bench()
    assert rec["d3stn_bs32_device_ms_per_step"] is None
    assert rec["d3stn_attempts"] == 2
    # the artifact must say WHY — rc + stderr tail, not a bare IndexError
    assert "rc=1" in rec["d3stn_error"]
    assert "claim held" in rec["d3stn_error"]


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
