"""The example scripts must stay runnable (they are user-facing docs)."""

import pathlib
import subprocess
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parents[1] / "examples"
REPO = str(EXAMPLES.parent)


@pytest.mark.parametrize(
    "script",
    ["01_basic_solve.py", "02_multi_device.py", "03_amg_and_mixed_precision.py",
     "04_transient.py", "05_fem_flux_bcs.py",
     pytest.param("06_distributed_amg.py", marks=pytest.mark.slow),
     pytest.param("07_sharded_f64_refinement.py", marks=pytest.mark.slow)],
)
def test_example_runs(script):
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES / script)],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
