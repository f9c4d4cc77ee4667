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
    corrected = np.zeros(len(frames), np.int64)
    for i, f in enumerate(frames):
        b = f.msg
        msgs[i, : len(b)] = np.frombuffer(b, np.uint8)
        ts[i] = f.timestamp // 12000  # decode_frame's sys clock
        addrs[i] = f.addr
        corrected[i] = f.correctedbits
    bulk = BulkTracker(LAT, LON)
    for a in range(0, len(frames), chunk):
        cols = decode_columns(msgs[a : a + chunk], ts[a : a + chunk], addrs[a : a + chunk], corrected[a : a + chunk])
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
            assert c.alt_reliable[i] == a.alt_reliable, hex(addr)
        if a.baro_rate_valid.source:
            assert c.baro_rate[i] == a.baro_rate
        if a.geom_rate_valid.source:
            assert c.geom_rate[i] == a.geom_rate
        # squawk double-confirmation state (track.c:2071-2092)
        assert c.squawk[i] == (a.squawk if a.squawk is not None else -1), hex(addr)
        assert c.squawk_tent[i] == (
            a.squawk_tentative if a.squawk_tentative is not None else -1
        ), hex(addr)
        if a.callsign_valid.source and a.callsign:
            got = bytes(c.cs[i]).decode("latin1").rstrip("\x00")
            assert got == a.callsign, (got, a.callsign)
    assert n_pos >= 3  # the chain actually decoded positions


def _mkframe(msg: bytes, ts_ms: int, addr: int):
    from readsb_tpu.decode.score import RawFrame

    return RawFrame(
        msg=msg, msgbits=len(msg) * 8, timestamp=ts_ms * 12000, score=0,
        phase=0, correctedbits=0, addr=addr, signal_power=1.0, iid=0,
    )


def test_bulk_altitude_outliers_and_squawk(tmp_path):
    """Adversarial stream: altitude excursions, rate context, squawk churn.

    Checks (a) dict tracker == bulk tracker on every touched column and
    (b) the outlier logic actually rejects an implausible jump
    (updateAltitude, track.c:1709) while the squawk double-confirmation
    (track.c:2071) delays a changed code until its second sighting.
    """
    from tools.synth import (
        encode_df4,
        encode_df5,
        encode_df17_position,
        encode_df17_velocity,
    )

    addr = 0x4A0001
    frames = []
    t = 1_000
    alt = 10_000.0
    # build reliability: steady climbs at 1000 fpm with known baro rate
    for i in range(25):
        frames.append(_mkframe(encode_df17_velocity(addr, 250, 90, 1000), t, addr))
        t += 100
        frames.append(
            _mkframe(encode_df17_position(addr, 47.0 + i * 1e-4, 8.0, alt, i & 1), t, addr)
        )
        t += 900
        alt += 1000 / 60 * 1.0  # 1 s at 1000 fpm
    # implausible jump: +25000 ft in one second (fpm way out of window)
    frames.append(_mkframe(encode_df17_position(addr, 47.01, 8.0, alt + 25000, 0), t, addr))
    t += 1000
    # normal again
    frames.append(_mkframe(encode_df17_position(addr, 47.011, 8.0, alt + 50, 1), t, addr))
    t += 1000
    # DF4 (MODE_S source, lower priority) with a bogus altitude: must not
    # override the reliable ADS-B altitude
    frames.append(_mkframe(encode_df4(addr, 1_000), t, addr))
    t += 500
    # squawk: tentative via DF5, confirm after >750 ms (track.c:2081-2087),
    # then change (tentative again) and confirm the change
    frames.append(_mkframe(encode_df5(addr, 0x1200), t, addr)); t += 800
    frames.append(_mkframe(encode_df5(addr, 0x1200), t, addr)); t += 500
    frames.append(_mkframe(encode_df5(addr, 0x7700), t, addr)); t += 800
    mid_frames = list(frames)
    frames.append(_mkframe(encode_df5(addr, 0x7700), t, addr)); t += 500

    def both(fr):
        return _run_oracle(fr), _run_bulk(fr, chunk=7)

    tr_mid, bulk_mid = both(mid_frames)
    a = tr_mid.aircraft[addr]
    i = int(np.nonzero(bulk_mid.cols.addr[: bulk_mid.n_slots] == addr)[0][0])
    # changed squawk is tentative only after first sighting
    assert a.squawk == 0x1200 and a.squawk_tentative == 0x7700
    assert bulk_mid.cols.squawk[i] == 0x1200
    assert bulk_mid.cols.squawk_tent[i] == 0x7700

    tr, bulk = both(frames)
    a = tr.aircraft[addr]
    i = int(np.nonzero(bulk.cols.addr[: bulk.n_slots] == addr)[0][0])
    # outlier rejected: altitude never took the +25000 excursion, and the
    # plausible follow-up was accepted
    assert abs(a.baro_alt - (alt + 50)) < 100, a.baro_alt
    # DF4 bogus altitude rejected by reliability (not by source priority:
    # MODE_S < ADSB takes the stale-window path, then the fpm window)
    assert a.baro_alt > 9000
    # confirmed squawk; the tentative is NOT cleared on confirm
    assert a.squawk == 0x7700 and a.squawk_tentative == 0x7700

    # full dict == bulk equality on the touched columns
    c = bulk.cols
    assert c.alt[i] == a.baro_alt
    assert c.alt_reliable[i] == a.alt_reliable
    assert c.alt_ts[i] == a.baro_alt_valid.updated
    assert c.baro_rate[i] == a.baro_rate
    assert c.squawk[i] == a.squawk
    assert c.squawk_tent[i] == 0x7700
    assert c.gs[i] == a.gs
