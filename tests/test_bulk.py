"""BulkTracker (columnar, arena v2) == dict Tracker, field for field.

Replays the same demodulated capture through both paths and diffs all
tracked columns exactly: positions (through the full CPR + speed-check
chain), reliability counters, NIC/Rc, CPR pair state, lattice fields,
and the CPR stats counters.
"""

import numpy as np
import pytest

from readsb_tpu.decode.batch import decode_columns
from readsb_tpu.decode.fields import decode_frame
from readsb_tpu.pipeline import demodulate_file
from readsb_tpu.track.bulk import BulkTracker
from readsb_tpu.track.tracker import Tracker

LAT, LON = 47.5, 8.5


@pytest.fixture(scope="module")
def replay(tmp_path_factory):
    from tools.synth import build_standard_capture

    d = tmp_path_factory.mktemp("bulkcap")
    cap = build_standard_capture(duration_s=3.0, n_aircraft=4, seed=9)
    p = str(d / "cap.uc8.dat")
    cap.write_uc8(p)
    frames, _ = demodulate_file(p, fmt="uc8")
    return frames


def _run_oracle(frames):
    tr = Tracker(receiver_lat=LAT, receiver_lon=LON)
    for f in frames:
        tr.update(decode_frame(f))
    return tr


def _run_bulk(frames, chunk=150):
    msgs = np.zeros((len(frames), 14), np.uint8)
    ts = np.zeros(len(frames), np.int64)
    addrs = np.zeros(len(frames), np.int64)
    for i, f in enumerate(frames):
        b = f.msg
        msgs[i, : len(b)] = np.frombuffer(b, np.uint8)
        ts[i] = f.timestamp // 12000  # decode_frame's sys clock
        addrs[i] = f.addr
    bulk = BulkTracker(LAT, LON)
    for a in range(0, len(frames), chunk):
        cols = decode_columns(msgs[a : a + chunk], ts[a : a + chunk], addrs[a : a + chunk])
        bulk.update_batch(cols)
    return bulk


def test_bulk_equivalence(replay):
    assert len(replay) > 50
    tr = _run_oracle(replay)
    bulk = _run_bulk(replay)

    # counters
    for k in (
        "cpr_surface", "cpr_airborne", "cpr_global_ok", "cpr_global_bad",
        "cpr_global_skipped", "cpr_local_ok", "cpr_local_skipped",
        "cpr_global_speed_checks", "cpr_local_speed_checks", "messages_total",
    ):
        assert getattr(bulk, k) == getattr(tr, k), k

    slot_of = {int(bulk.cols.addr[i]): i for i in range(bulk.n_slots)}
    assert set(slot_of) == set(tr.aircraft)

    n_pos = 0
    for addr, a in tr.aircraft.items():
        i = slot_of[addr]
        c = bulk.cols
        assert c.messages[i] == a.messages, hex(addr)
        assert c.seen[i] == a.seen, hex(addr)
        if a.seen_pos:
            n_pos += 1
            assert c.seen_pos[i] == a.seen_pos, hex(addr)
            assert c.lat[i] == a.lat and c.lon[i] == a.lon, hex(addr)
            assert c.pos_nic[i] == a.pos_nic, hex(addr)
            assert c.pos_rc[i] == a.pos_rc, hex(addr)
        assert c.rel_odd[i] == a.pos_reliable_odd, hex(addr)
        assert c.rel_even[i] == a.pos_reliable_even, hex(addr)
        assert c.su[i] == a.speed_unreliable and c.tu[i] == a.track_unreliable
        # CPR pair state
        for par, pair in ((0, a.cpr_even), (1, a.cpr_odd)):
            if pair.valid.source:
                assert c.c_lat[i, par] == pair.lat and c.c_lon[i, par] == pair.lon
                assert c.c_nic[i, par] == pair.nic and c.c_rc[i, par] == pair.rc
                assert c.c_ts[i, par] == pair.valid.updated
        # lattice fields
        if a.gs_valid.source:
            assert c.gs[i] == a.gs and c.gs_ts[i] == a.gs_valid.updated
        if a.track_valid.source:
            assert c.track[i] == a.track
        if a.baro_alt_valid.source and isinstance(a.baro_alt, int):
            assert c.alt[i] == a.baro_alt
        if a.callsign_valid.source and a.callsign:
            got = bytes(c.cs[i]).decode("latin1").rstrip("\x00")
            assert got == a.callsign, (got, a.callsign)
    assert n_pos >= 3  # the chain actually decoded positions
