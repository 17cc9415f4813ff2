"""Pin the DRIVER entry points in ``__graft_entry__.py``.

The driver invokes ``dryrun_multichip(n)`` in a fresh interpreter whose
sitecustomize force-selects the single-TPU tunnel backend — so the entry must
self-provision its virtual CPU mesh.  We reproduce that exact situation with a
subprocess whose env carries NO JAX_PLATFORMS / XLA_FLAGS overrides (round-1
regression: the entry asserted instead of provisioning, MULTICHIP_r01.json
``ok: false``).
"""

import os
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow  # full-UNet/e2e XLA compiles: skip with -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_subprocess_driver_env():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    # keep repeat runs fast; the dryrun model is tiny
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout
    # all seven layouts must execute: dp / dp x tp / fsdp TRAIN steps, the
    # dp + fsdp DISTILLATION steps (frozen-teacher traced-arg protocol), plus
    # the dp-sharded and ZeRO-3-weights SAMPLING paints (VERDICT r3 item 6)
    assert proc.stdout.count("dryrun_multichip OK") == 7, proc.stdout
    assert "dp distillation step" in proc.stdout, proc.stdout
    assert "fsdp distillation step" in proc.stdout, proc.stdout
    assert "dp-sharded DDIM paint" in proc.stdout, proc.stdout
    assert "ZeRO-3-sharded weights" in proc.stdout, proc.stdout


def test_dryrun_provisioning_respects_larger_existing_flag():
    """If XLA_FLAGS already asks for MORE virtual devices, keep it."""
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g, os; g._provision_virtual_cpu_mesh(8); "
            "assert '=16' in os.environ['XLA_FLAGS'], os.environ['XLA_FLAGS']; "
            "import jax; assert len(jax.devices('cpu')) == 16",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"


def test_dryrun_multichip_cold_budget(tmp_path):
    """VERDICT r4 item 1: the 7-pin dryrun must fit the driver's COLD budget.

    MULTICHIP_r04 was rc=124 because the round-4 pins added ~5 full-size
    128x128 XLA compiles to a cold one-core run.  Round-5 fixes: compile-speed
    XLA flags (2.1x) + pins 4-7 at 32x32 (2.3x) + persistent-cache default.
    This test scrubs the cache so every compile is real, then asserts the wall
    time stays at the r03-proven scale (r03's 3-pin run, the last the driver
    accepted, cost ~820 s of compiles on this host; the full 7-pin run now
    measures ~855 s under concurrent host load).  Budget 1400 s = measured
    + ~60% load headroom, still far below the old 7-pin cost (~2400 s).
    """
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "scrubbed_cache")
    t0 = time.monotonic()
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    elapsed = time.monotonic() - t0
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert proc.stdout.count("dryrun_multichip OK") == 7, proc.stdout
    assert elapsed < 1400, (
        f"cold 7-pin dryrun took {elapsed:.0f}s — regressing toward the "
        f"driver-timeout budget.  Pin trace:\n{proc.stdout}"
    )
