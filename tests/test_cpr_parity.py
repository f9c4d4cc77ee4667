"""CPR pipeline parity vs the reference binary on one capture.

Runs both implementations over the same synthetic multi-aircraft capture
(with positions and real kinematics) and compares (a) the CPR stats
counters and (b) the full accepted-position SET via each side's
per-position json output port (jsonPositionOutput, net_io.c:3407) on a
throttled replay.  The round-2 local-CPR divergence (receiver-relative
decodes the reference refuses) is closed: _do_local_cpr now replicates
track.c:843-966's gating including the max-range cell-ambiguity fold.
"""

import os
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
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    ).stderr
    m = re.search(r"CPR: (\d+) global ok, (\d+) global bad, (\d+) local ok", out)
    assert m, out[-1500:]
    got_ok, got_bad = int(m.group(1)), int(m.group(2))

    assert got_ok == ref["global_ok"], (got_ok, ref)
    assert got_bad == ref["global_bad"], (got_bad, ref)


def _collect_positions(cmd, port, timeout_s=90, stdin_path=None):
    """Run a readsb-style process with --net-json-port, collect accepted
    positions as [(hex, lat, lon)] from the per-position json stream.

    The capture is fed through stdin only after the collector has
    connected, so no position can be emitted before we are listening
    (otherwise startup-speed differences make the comparison racy)."""
    import json
    import socket
    import threading
    import time

    proc = subprocess.Popen(
        cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, cwd=str(REPO),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        stdin=subprocess.PIPE if stdin_path else None,
    )

    def feeder():
        with open(stdin_path, "rb") as f:
            try:
                proc.stdin.write(f.read())
                proc.stdin.close()
            except (BrokenPipeError, OSError):
                pass
    sock = None
    deadline = time.time() + 15
    try:
        while time.time() < deadline and sock is None:
            try:
                sock = socket.create_connection(("127.0.0.1", port), timeout=1)
            except OSError:
                if proc.poll() is not None:
                    raise AssertionError("process exited before listening")
                time.sleep(0.2)
        assert sock is not None, "could not connect to json position port"
        if stdin_path:
            threading.Thread(target=feeder, daemon=True).start()
        sock.settimeout(2)
        buf = b""
        end = time.time() + timeout_s
        while time.time() < end:
            try:
                chunk = sock.recv(65536)
            except socket.timeout:
                if proc.poll() is not None:
                    break
                continue
            if not chunk:
                break
            buf += chunk
        out = []
        for line in buf.split(b"\n"):
            line = line.strip()
            if not line:
                continue
            o = json.loads(line)
            if "lat" in o:
                out.append((o["hex"], round(o["lat"], 4), round(o["lon"], 4)))
        return out
    finally:
        if sock is not None:
            sock.close()
        proc.kill()
        proc.wait()


def test_cpr_accepted_position_sets_match(capture_pos):
    """Accepted-position-set parity on a throttled replay (track.c:843-966)."""
    if not REFERENCE_BIN.exists():
        pytest.skip("reference binary not built")
    ref_pos = _collect_positions(
        [str(REFERENCE_BIN), "--device-type", "ifile", "--ifile", "/dev/stdin",
         "--iformat", "uc8", "--throttle", "--quiet", "--net",
         "--net-json-port", "31947", "--lat", "47.5", "--lon", "8.5"],
        31947, stdin_path=capture_pos,
    )
    got_pos = _collect_positions(
        [sys.executable, "-m", "readsb_tpu.app.main", "--device-type", "ifile",
         "--ifile", "-", "--iformat", "uc8", "--throttle", "--quiet",
         "--net", "--net-json-port", "31948", "--lat", "47.5", "--lon", "8.5"],
        31948, stdin_path=capture_pos,
    )
    assert len(ref_pos) > 10
    assert sorted(got_pos) == sorted(ref_pos)
