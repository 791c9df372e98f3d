"""The driver-facing entry points must work exactly as the driver calls them.

``dryrun_multichip`` is invoked by the driver in a fresh process with NO
environment preparation — it must self-configure the virtual CPU mesh
(round-1 failure: it ran against the pinned axon TPU platform and crashed,
MULTICHIP_r01.json ok=false).  We reproduce the driver's calling convention
in a clean subprocess so the in-process conftest CPU forcing can't mask a
regression.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_fresh_process():
    """Marked slow (383 s: a second full flagship-shape compile over the
    8-device mesh): the driver itself runs EXACTLY this calling convention
    every round and records MULTICHIP_r0N.json, so the fast suite keeps
    only the in-process variant; this one guards the self-configuration
    path (env scrubbing) for full-suite runs."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # driver gives us nothing; we must self-set
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(n_devices=8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        # ~430 s alone on the 1-core host; 1200 gives headroom when the
        # slow lane's other compile-heavy tests share the core (600 timed
        # out under that contention in the r5 full-suite run)
        timeout=1200,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip(8): ok" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_inprocess():
    """Also callable under the test harness' pre-forced 8-CPU platform.

    Marked slow (430 s measured r5: the flagship-shape sections compile
    the full hybrid/hybrid2k steppers on the 1-core host): the SAME
    entry point runs fresh-process in the slow lane above AND is executed
    by the driver's own MULTICHIP artifact every round — the fast lane
    keeps `test_force_cpu_mesh_raises_when_short` plus the sharded-path
    coverage in tests/test_parallel.py."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_force_cpu_mesh_raises_when_short():
    import __graft_entry__ as g

    with pytest.raises(RuntimeError, match="virtual CPU devices"):
        g._force_cpu_mesh(1024)
