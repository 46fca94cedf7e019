"""Multi-host (DCN) scaffolding test (SURVEY §2c comm-backend row).

Runs tools/multihost_dryrun.py: two OS processes join one
``jax.distributed`` cluster over localhost (gloo CPU collectives), build a
single global 8-device mesh, pull disjoint TrainLoader slices, assemble the
global batch via ``jax.make_array_from_process_local_data``, and execute one
SPMD train step.  The asserted invariant — both processes report the
IDENTICAL loss scalar — only holds if the cross-process gradient/loss
reduction really ran.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # 2 concurrent CPU compiles of the tiny model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_train_step(tmp_path):
    # write to a temp path: a run that fails (e.g. coordination timeout on
    # an overloaded CI host) must not clobber the committed artifact
    out = tmp_path / "MULTIHOST_DCN.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_dryrun.py")],
        capture_output=True, text=True, timeout=2400,
        env={**os.environ, "UWCV_MH_TIMEOUT": "2200",
             "UWCV_MH_OUT": str(out)}, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    with open(out) as f:
        payload = json.load(f)
    assert payload["ok"] is True
    assert payload["n_processes"] == 2
    assert payload["loss_agreement"] is True
    assert len(payload["losses"]) == 2
