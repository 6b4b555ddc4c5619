"""bench.py supervisor: a sick TPU tunnel must still yield ONE JSON line.

The driver records bench.py stdout as BENCH_rN.json; during the
2026-08-17 axon outage a hung remote compile would have produced nothing.
The supervisor runs the live measurement in a watchdogged child and falls
back to a line rebuilt from the recorded on-chip results
(bench_results/*.json) marked `degraded: true`.
"""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_degraded_output_from_recorded():
    recorded = bench._load_recorded()
    assert "recorded_profile_paged_gather_ms" in recorded  # checked-in result
    out = bench._degraded_output(recorded, "unit test")
    assert out["degraded"] is True
    assert out["metric"] == "mixtral_decode_hbm_bandwidth_utilization"
    # headline rebuilt from the recorded fused step; active bytes match the
    # live path's param-tree accounting (BENCH_r02: active_gb_per_step 2.0)
    assert out["active_gb_per_step"] == 2.0
    assert 0.5 < out["value"] < 1.0
    assert out["vs_baseline"] == out["value"]
    for k in recorded:
        assert k in out


def test_degraded_output_without_recordings():
    out = bench._degraded_output({}, "no recordings")
    assert out["degraded"] is True and out["value"] == 0.0


def test_supervisor_emits_json_on_watchdog_timeout():
    env = dict(os.environ, VITA_BENCH_WATCHDOG_S="1")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )
    assert p.returncode == 0
    out = json.loads(p.stdout.strip().splitlines()[-1])
    assert out["degraded"] is True
    assert "watchdog" in out["degraded_reason"]
