"""End-to-end tracking: capture -> demod -> decode -> aircraft states."""

import json

import pytest

from readsb_tpu.decode.fields import decode_frame
from readsb_tpu.pipeline import demodulate_file
from readsb_tpu.track.tracker import Tracker


@pytest.fixture(scope="module")
def tracked(capture_small):
    frames, demod = demodulate_file(capture_small + ".uc8.dat", fmt="uc8")
    tracker = Tracker()
    for f in frames:
        mm = decode_frame(f)
        tracker.update(mm)
    truth = json.load(open(capture_small + ".truth.json"))
    return tracker, truth, frames


def test_positions_recovered(tracked):
    tracker, truth, frames = tracked
    # every synthetic aircraft transmits pos pairs; expect positions for all
    with_pos = [a for a in tracker.aircraft.values() if a.seen_pos > 0]
    assert len(with_pos) >= 3, [hex(a.addr) for a in tracker.aircraft.values()]
    for a in with_pos:
        # aircraft start at lat 47+k*0.3, lon 8+k*0.5 and barely move in 1s
        k = (a.addr - 0x400000) // 0x1111
        assert a.lat == pytest.approx(47.0 + 0.3 * k, abs=0.05), hex(a.addr)
        assert a.lon == pytest.approx(8.0 + 0.5 * k, abs=0.05)
        assert tracker.cpr_global_ok > 0


def test_fields_tracked(tracked):
    tracker, truth, frames = tracked
    a = next(iter(tracker.aircraft.values()))
    for a in tracker.aircraft.values():
        k = (a.addr - 0x400000) // 0x1111
        if a.callsign_valid.source.value:
            assert a.callsign.strip() == f"TPU{k:03d}"
        if a.gs_valid.source.value:
            assert a.gs == pytest.approx(250 + 10 * k, abs=3)
        if a.baro_alt_valid.source.value:
            assert a.baro_alt == pytest.approx(10000 + 2000 * k, abs=25)


def test_stale_removal(tracked):
    tracker, truth, frames = tracked
    n_before = len(tracker.aircraft)
    assert n_before > 0
    last = max(a.seen for a in tracker.aircraft.values())
    # nothing stale yet
    assert tracker.remove_stale(last + 1000) == 0
    assert len(tracker.aircraft) == n_before
    # 6 minutes later everything is gone
    removed = tracker.remove_stale(last + 6 * 60 * 1000)
    assert removed == n_before
    assert len(tracker.aircraft) == 0


def test_speed_check_rejects_jump(tracked):
    tracker, truth, frames = tracked
    from readsb_tpu.track.tracker import Aircraft, Tracker as T

    t = Tracker()
    from readsb_tpu.decode.fields import ModesMessage, Source, CprType
    from tools.synth import encode_df17_position
    from readsb_tpu.decode.score import RawFrame

    def mk(lat, lon, odd, ts_ms):
        msg = encode_df17_position(0xABCDEF, lat, lon, 30000, odd)
        f = RawFrame(msg=msg, msgbits=112, timestamp=ts_ms * 12000, score=1800,
                     phase=4, correctedbits=0, addr=0xABCDEF, signal_power=0.1)
        return decode_frame(f)

    # establish a position
    t.update(mk(47.0, 8.0, 0, 1000))
    t.update(mk(47.0, 8.0, 1, 1500))
    a = t.aircraft[0xABCDEF]
    assert a.seen_pos > 0
    lat0 = a.lat
    # a 500 km jump 1 s later must be rejected
    t.update(mk(51.5, 8.0, 0, 2500))
    t.update(mk(51.5, 8.0, 1, 2600))
    assert a.lat == pytest.approx(lat0, abs=0.01)
