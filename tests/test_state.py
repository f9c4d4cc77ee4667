"""Checkpoint/resume round-trip."""

from readsb_tpu.decode.fields import decode_frame
from readsb_tpu.io import state as state_io
from readsb_tpu.pipeline import demodulate_file
from readsb_tpu.track.tracker import Tracker


def test_state_roundtrip(capture_small, tmp_path):
    frames, _ = demodulate_file(capture_small + ".uc8.dat", fmt="uc8")
    t1 = Tracker()
    for f in frames:
        t1.update(decode_frame(f))
    n = state_io.save_state(t1, str(tmp_path), now_ms=0)
    assert n == len(t1.aircraft)

    t2 = Tracker()
    loaded = state_io.load_state(t2, str(tmp_path))
    assert loaded == len(t1.aircraft)
    for addr, a1 in t1.aircraft.items():
        a2 = t2.aircraft[addr]
        assert a2.lat == a1.lat and a2.lon == a1.lon
        assert a2.callsign == a1.callsign
        assert a2.baro_alt == a1.baro_alt
        assert a2.messages == a1.messages
        assert a2.position_valid.updated == a1.position_valid.updated
        assert a2.position_valid.source == a1.position_valid.source


def test_state_preserves_traces(tmp_path):
    """Restart must keep trace history (globe_index.c:2656-2938)."""
    from readsb_tpu.io import state as state_io
    from readsb_tpu.track.tracker import Tracker
    from readsb_tpu.track.traces import State

    from readsb_tpu.track.traces import Trace

    t = Tracker(keep_traces=True)
    a = t.get_or_create(0xABCDEF, 1000)
    a.seen = 1000
    a.trace = Trace()
    for i in range(600):  # enough to freeze a compressed chunk
        a.trace._commit(State(timestamp=1000 + i * 1000, lat=52_000_000 + i,
                              lon=4_000_000, gs=4500))
    n_before = len(a.trace)
    full_before = [(s.timestamp, s.lat) for s in a.trace.full()]
    assert a.trace.chunks, "test should cover the compressed-chunk path"

    state_io.save_state(t, str(tmp_path), 2_000_000)

    t2 = Tracker(keep_traces=True)
    state_io.load_state(t2, str(tmp_path))
    a2 = t2.aircraft[0xABCDEF]
    assert len(a2.trace) == n_before
    assert [(s.timestamp, s.lat) for s in a2.trace.full()] == full_before
