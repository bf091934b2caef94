"""Smoke test: bench.py must emit its JSON line no matter what.

Round 3's official benchmark record was lost to an UnboundLocalError in the
host-load *warning* branch (local ``import sys`` statements shadowed the
module-level import). This test drives ``bench.main`` end-to-end on tiny
shapes with the load warning forced ON, and asserts the one-line JSON
contract the driver consumes.
"""

import io
import json
import os
from contextlib import redirect_stdout

import bench


def test_bench_main_emits_json_line(monkeypatch):
    # Force the host-load warning branch (the line that crashed round 3).
    monkeypatch.setattr(os, "getloadavg", lambda: (1e9, 1e9, 1e9))
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main(tiny=True)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert lines, "bench.main printed nothing to stdout"
    rec = json.loads(lines[-1])
    assert rec["metric"] == "dense_infer_patches_per_sec_per_chip"
    assert rec["unit"] == "patches/s/chip"
    assert isinstance(rec["value"], (int, float)) and rec["value"] > 0
    assert rec["vs_baseline"] > 0
    assert rec["platform"] == "cpu"
