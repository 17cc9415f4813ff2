"""bench.py backend-availability gate (VERDICT r3 item 1).

The TPU tunnel has documented multi-hour outages; round-3's driver bench
capture crashed on one (BENCH_r03.json rc=1, "Unable to initialize backend").
These tests pin the probe/retry logic with fake backends — no jax involved
(bench.py imports jax only inside the workload functions).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench


def _fake_clock_and_sleep(start=0.0):
    """A monotonic clock advanced only by sleep(); returns (clock, sleep, log)."""
    state = {"t": start}
    log = []

    def clock():
        return state["t"]

    def sleep(s):
        log.append(s)
        state["t"] += s

    return clock, sleep, log


def test_probe_success_first_try():
    ok, attempts = bench.wait_for_backend(
        window_s=10, probe_timeout_s=5, interval_s=1,
        probe_cmd=["/bin/true"],
    )
    assert ok and attempts == 1


def test_probe_failing_backend_exhausts_window():
    clock, sleep, log = _fake_clock_and_sleep()
    ok, attempts = bench.wait_for_backend(
        window_s=10, probe_timeout_s=5, interval_s=1,
        probe_cmd=["/bin/false"], sleep=sleep, clock=clock,
    )
    assert not ok
    assert attempts >= 3  # retried, not a single-shot failure
    # backoff doubles: 1, 2, 4, then clipped to the remaining window
    assert log[0] == 1 and log[1] == 2 and log[2] == 4
    assert sum(log) <= 10 + 1e-9  # never sleeps past the deadline


def test_probe_hanging_backend_times_out():
    # a probe that HANGS (tunnel half-dead: device ops never return) must be
    # killed by the subprocess timeout, not block the gate forever
    clock, sleep, _ = _fake_clock_and_sleep()
    ok, attempts = bench.wait_for_backend(
        window_s=1, probe_timeout_s=0.2, interval_s=10,
        probe_cmd=["/bin/sleep", "30"], sleep=sleep, clock=clock,
    )
    assert not ok and attempts >= 1


def test_probe_recovers_mid_window(tmp_path):
    # fails twice, then succeeds — models the tunnel coming back up
    marker = tmp_path / "n"
    script = (
        f"f='{marker}'\n"
        "import os\n"
        "n = int(open(f).read()) if os.path.exists(f) else 0\n"
        "open(f, 'w').write(str(n + 1))\n"
        "raise SystemExit(0 if n >= 2 else 1)\n"
    )
    clock, sleep, _ = _fake_clock_and_sleep()
    # probe_timeout_s is REAL seconds (subprocess timeout) even though the
    # retry clock is faked — keep it generous so interpreter startup under a
    # loaded one-core host can't add spurious timed-out attempts (seen live
    # while a TPU bench traced concurrently).
    ok, attempts = bench.wait_for_backend(
        window_s=100, probe_timeout_s=60, interval_s=1,
        probe_cmd=[sys.executable, "-c", script], sleep=sleep, clock=clock,
    )
    assert ok and attempts == 3


def test_main_gate_emits_tunnel_down_json():
    # end-to-end through __main__: fake failing backend, tiny window ->
    # rc=1 and the LAST stdout line is the distinguishable JSON error record
    env = dict(
        os.environ,
        BENCH_PROBE_CMD="exit 1",
        BENCH_PROBE_WINDOW_S="0.2",
        BENCH_PROBE_TIMEOUT_S="1",
        BENCH_PROBE_INTERVAL_S="0.05",
        BENCH_METRIC="train",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 1
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["error"] == "tpu_tunnel_down"
    assert rec["metric"] == "train_step_time_batch16"
    assert rec["probe_attempts"] >= 1


def test_unknown_metric_still_rejected_before_probe():
    env = dict(os.environ, BENCH_METRIC="ddpm-1000", BENCH_PROBE_CMD="exit 1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode != 0
    assert "unknown BENCH_METRIC" in r.stderr
