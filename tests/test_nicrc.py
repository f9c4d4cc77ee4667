"""NIC/Rc derivation parity (track.c:1387-1674).

An aircraft with an ADS-B v2 opstatus (NIC-A set) transmitting metype-11
positions with NIC-B set must report nic=9/rc=75; a v0 aircraft on the
same metype must report nic=8/rc=186 with backfilled NACp/SIL
(ED-102A tables N-7/N-8).  Values are additionally cross-checked against
the reference binary's aircraft.json when the oracle is built.
"""

import json
import os
import subprocess

import pytest

from readsb_tpu.decode.fields import decode_frame
from readsb_tpu.pipeline import demodulate_file
from readsb_tpu.track.tracker import Tracker
from tests.conftest import REFERENCE_BIN
from tools import synth

A_V2 = 0x440001  # v2, NIC-A, NIC-B positions
B_V0 = 0x440002  # no opstatus => assumed v0


@pytest.fixture(scope="module")
def capture_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("nicrc")
    path = str(d / "cap")
    cap = synth.CaptureBuilder(duration_s=1.2, seed=9)
    t = 0.03
    cap.add_frame(synth.encode_df17_opstatus(A_V2, version=2, nic_a=1, nac_p=10), t)
    for i in range(8):
        t += 0.05
        # moving aircraft: identical repeated CPR pairs would trip the
        # reference's duplicate cache (track.c:312-421) and never decode
        cap.add_frame(
            synth.encode_df17_position(
                A_V2, 47.3 + i * 0.0001, 8.2, 30000, odd=i % 2, metype=11, nic_b=1
            ),
            t,
        )
        t += 0.02
        cap.add_frame(
            synth.encode_df17_position(
                B_V0, 47.9 + i * 0.0001, 8.9, 31000, odd=i % 2, metype=11, nic_b=0
            ),
            t,
        )
    cap.write_uc8(path + ".uc8.dat")
    return path


def test_nic_rc_values(capture_path):
    frames, _ = demodulate_file(capture_path + ".uc8.dat", fmt="uc8")
    tracker = Tracker()
    for f in frames:
        tracker.update(decode_frame(f))
    a = tracker.aircraft[A_V2]
    b = tracker.aircraft[B_V0]
    assert a.seen_pos and b.seen_pos
    # v2 + NIC-A + NIC-B on metype 11 -> nic 9, rc 75 (track.c:1431-1436,1519-1524)
    assert a.adsb_version == 2
    assert (a.pos_nic, a.pos_rc) == (9, 75)
    # v0 metype 11 -> nic 8, rc 186; NACp/SIL backfilled (track.c:1596-1663)
    assert b.adsb_version == 0
    assert (b.pos_nic, b.pos_rc) == (8, 186)
    assert b.nac_p == 8
    assert b.sil == 2


def test_nic_rc_reference_parity(capture_path, tmp_path):
    if not os.path.exists(REFERENCE_BIN):
        pytest.skip("reference readsb binary not built")
    jdir = tmp_path / "json"
    jdir.mkdir()
    # the shutdown-time aircraft.json is empty (the synthetic ifile clock
    # jumps to wall time at exit, staling every aircraft), so replay
    # throttled and keep the last populated snapshot written during the run
    proc = subprocess.Popen(
        [str(REFERENCE_BIN), "--device-type", "ifile",
         "--ifile", capture_path + ".uc8.dat", "--iformat", "uc8", "--throttle",
         "--quiet", "--write-json", str(jdir), "--write-json-every", "0.1",
         "--json-location-accuracy", "2"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    import time

    ref = {}
    deadline = time.time() + 60
    while time.time() < deadline:
        if os.path.exists(jdir / "aircraft.json"):
            try:
                data = json.load(open(jdir / "aircraft.json"))
                for a in data.get("aircraft", []):
                    if "nic" in a:
                        ref[int(a["hex"], 16)] = a
            except (json.JSONDecodeError, ValueError):
                pass  # mid-write
        if proc.poll() is not None and ref:
            break
        time.sleep(0.05)
    proc.kill()
    proc.wait()
    assert A_V2 in ref and B_V0 in ref, sorted(map(hex, ref))

    frames, _ = demodulate_file(capture_path + ".uc8.dat", fmt="uc8")
    tracker = Tracker()
    for f in frames:
        tracker.update(decode_frame(f))
    for addr in (A_V2, B_V0):
        r, ours = ref[addr], tracker.aircraft[addr]
        assert (ours.pos_nic, ours.pos_rc) == (r["nic"], r["rc"]), hex(addr)
        if "nac_p" in r:
            assert ours.nac_p == r["nac_p"], hex(addr)
        if "sil" in r:
            assert ours.sil == r["sil"], hex(addr)
