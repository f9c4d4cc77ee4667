"""CPR pipeline counter parity vs the reference binary on one capture.

Runs both implementations over the same synthetic multi-aircraft capture
(with positions and real kinematics) and compares the CPR accounting.
Global decode counts must match exactly.  Local CPR: this implementation
accepts receiver-relative decodes for pre-first-fix positions that the
reference rejects - tracked as a known gap (see tracker._do_local_cpr).
"""

import re
import subprocess
import sys

import pytest

from tests.conftest import REFERENCE_BIN, REPO


@pytest.fixture(scope="module")
def capture_pos(tmp_path_factory):
    from tools.synth import build_standard_capture

    d = tmp_path_factory.mktemp("cappos")
    cap = build_standard_capture(duration_s=3.0, n_aircraft=4, seed=9)
    p = str(d / "pos.uc8.dat")
    cap.write_uc8(p)
    return p


def _ref_cpr(path):
    r = subprocess.run(
        [str(REFERENCE_BIN), "--device-type", "ifile", "--ifile", path,
         "--iformat", "uc8", "--quiet", "--stats", "--lat", "47.5", "--lon", "8.5"],
        capture_output=True, text=True, timeout=600,
    )
    out = r.stderr + r.stdout
    def grab(pat):
        m = re.search(pat, out)
        return int(m.group(1)) if m else None
    return {
        "pos": grab(r"(\d+) airborne position messages"),
        "global_ok": grab(r"(\d+) global CPR attempts with valid"),
        "global_bad": grab(r"(\d+) global CPR attempts with bad data"),
    }


def test_cpr_counters_match_reference(capture_pos):
    if not REFERENCE_BIN.exists():
        pytest.skip("reference binary not built")
    ref = _ref_cpr(capture_pos)
    assert ref["global_ok"] is not None

    out = subprocess.run(
        [sys.executable, "-m", "readsb_tpu.app.main", "--device-type", "ifile",
         "--ifile", capture_pos, "--iformat", "uc8", "--quiet", "--stats",
         "--lat", "47.5", "--lon", "8.5"],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
    ).stderr
    m = re.search(r"CPR: (\d+) global ok, (\d+) global bad, (\d+) local ok", out)
    assert m, out[-1500:]
    got_ok, got_bad = int(m.group(1)), int(m.group(2))

    assert got_ok == ref["global_ok"], (got_ok, ref)
    assert got_bad == ref["global_bad"], (got_bad, ref)
