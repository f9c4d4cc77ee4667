"""Multi-host DCN dry-run: two jax.distributed CPU processes, channels
sharded across hosts, halo within host, frame-set equality on each rank
(SURVEY §2.5 DCN row; tools/dcn_dryrun.py)."""

import subprocess
import sys

from tests.conftest import REPO


def test_dcn_two_process_equality():
    r = subprocess.run(
        [sys.executable, "tools/dcn_dryrun.py"],
        cwd=str(REPO), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "dcn_dryrun OK" in r.stdout
