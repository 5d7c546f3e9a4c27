"""Compile-budget guard for the multichip dryrun (the driver's gate).

Round 4 regressed the gate to a cold-compile timeout (MULTICHIP_r04.json
rc=124): the dryrun's value-init compiled the full train forward a second
time and the train-step compile ran at full XLA:CPU optimization. The fix
(shape-only init + --xla_backend_optimization_level=0 in the dryrun child)
brought a cold run to ~5 min on this single-core box. This test pins that:
it runs the REAL dryrun_multichip(8) with a FRESH compilation cache under a
hard wall-clock budget, so a graph change that blows up compile time fails
the suite instead of the driver gate.

Marked slow: costs one full cold compile (~5 min).
"""

import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import pytest

BUDGET_S = 560  # the driver window is ~590 s; leave margin for its overhead


@pytest.mark.slow
def test_dryrun_multichip_cold_compile_budget():
    repo = Path(__file__).resolve().parent.parent
    with tempfile.TemporaryDirectory() as cache:
        env = dict(os.environ)
        env["JAX_COMPILATION_CACHE_DIR"] = cache  # fresh == cold
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8)"],
            cwd=repo,
            env=env,
            timeout=BUDGET_S,
            capture_output=True,
            text=True,
        )
        elapsed = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
    print(f"cold dryrun_multichip(8): {elapsed:.0f}s (budget {BUDGET_S}s)")
