"""Globe tiling, traces, mark_legs, heatmap binary format."""

import gzip
import json
import os
import struct

import numpy as np
import pytest

from readsb_tpu.decode.fields import AirGround, ModesMessage, Source
from readsb_tpu.track import globe
from readsb_tpu.track.traces import (
    SFOUR,
    State,
    Trace,
    mark_legs,
    trace_json,
)
from readsb_tpu.track.tracker import Aircraft, Tracker, Validity


def test_globe_index_special_tiles():
    # Arctic tile 0: 60..90 north, -126..0
    assert globe.globe_index(75.0, -60.0) == 0
    # North Pacific tile 3 wraps the dateline (west 150 > east -126)
    assert globe.globe_index(30.0, 170.0) == 3
    assert globe.globe_index(30.0, -150.0) == 3
    # central Europe is NOT special: falls in the 3-degree grid
    idx = globe.globe_index(48.1, 11.5)
    assert idx >= globe.GLOBE_MIN_INDEX
    i = (48 + 90) // 3  # floor to 3-degree grid
    j = (9 + 180) // 3  # 11.5 -> grid lon 9
    assert idx == i * globe.GLOBE_LAT_MULT + j + globe.GLOBE_MIN_INDEX


def test_globe_index_np_matches_scalar():
    rng = np.random.default_rng(5)
    lat = rng.uniform(-89.9, 89.9, 500)
    lon = rng.uniform(-179.9, 179.9, 500)
    vec = globe.globe_index_np(lat, lon)
    for k in range(500):
        assert vec[k] == globe.globe_index(lat[k], lon[k]), (lat[k], lon[k])


def test_globe_indexes_list():
    idxs = globe.globe_indexes()
    assert set(range(len(globe.SPECIAL_TILES))).issubset(set(idxs))
    # grid tiles shadowed by special tiles are excluded
    assert globe.globe_index(75.1, -60.1) not in [
        i for i in idxs if i >= globe.GLOBE_MIN_INDEX
        and (i - globe.GLOBE_MIN_INDEX) // globe.GLOBE_LAT_MULT * 3 - 90 == 75
    ]


def _aircraft_with_pos(addr=0xABC123):
    a = Aircraft(addr=addr)
    a.lat, a.lon = 48.0, 11.0
    a.addrtype = 0
    return a


def _fresh(a, now, fields):
    for f in fields:
        v: Validity = getattr(a, f + "_valid")
        v.updated = now
        v.source = Source.ADSB
        v.last_source = Source.ADSB


def test_trace_add_and_json():
    a = _aircraft_with_pos()
    tr = Trace()
    now = 1_000_000
    a.gs = 450.0
    a.track = 90.0
    a.baro_alt = 35000
    a.callsign = "TEST123"
    for i in range(40):
        t = now + i * 5000
        a.lat = 48.0 + i * 0.01
        a.lon = 11.0 + i * 0.012
        _fresh(a, t, ["gs", "track", "baro_alt", "callsign", "position"])
        tr.add(a, t, json_trace_interval=8000)
    assert len(tr) >= 20  # every ~8 s -> roughly 24+ points committed
    states = tr.full()
    # every SFOUR-th committed point carries the full snapshot
    snap_idx = [i for i, s in enumerate(states) if s.all is not None]
    assert snap_idx[0] == 0 and all(i % SFOUR == 0 for i in snap_idx)
    assert states[0].all.get("flight") == "TEST123"

    doc = trace_json(a, states, now + 300_000)
    assert doc["icao"] == "abc123"
    row = doc["trace"][1]
    assert row[3] == 35000  # quantized /6.25 round-trips exactly
    assert abs(row[4] - 450.0) < 0.05
    assert abs(row[5] - 90.0) < 0.005
    assert row[9] == "adsb_icao"


def test_trace_speed_change_forces_point():
    a = _aircraft_with_pos()
    tr = Trace()
    now = 1_000_000
    a.gs = 200.0
    a.baro_alt = 5000
    _fresh(a, now, ["gs", "baro_alt", "position"])
    tr.add(a, now, json_trace_interval=30000)
    # 1 s later with a big speed change: must commit despite min interval
    a.gs = 250.0
    a.lat += 0.01
    _fresh(a, now + 1000, ["gs", "baro_alt", "position"])
    tr.add(a, now + 1000, json_trace_interval=30000)
    assert len(tr) == 2


def test_trace_chunk_compression():
    a = _aircraft_with_pos()
    tr = Trace()
    now = 1_000_000
    a.gs = 400.0
    for i in range(600):
        t = now + i * 40_000
        a.lat = 48.0 + (i % 100) * 0.01
        _fresh(a, t, ["gs", "position"])
        tr.add(a, t, json_trace_interval=8000)
    assert tr.chunks, "old history must freeze into zstd chunks"
    assert len(tr.full()) == len(tr)
    mid_ts = now + 300 * 40_000
    assert all(s.timestamp >= mid_ts for s in tr.since(mid_ts))


def test_mark_legs_two_flights():
    # synthetic: climb, cruise, descent, 40 min gap on ground, climb again
    states = []
    t = 1_000_000_000

    def pt(ts, alt, ground=False):
        s = State(timestamp=ts, lat=48_000_000, lon=11_000_000, on_ground=ground)
        if not ground:
            s.baro_alt = int(alt / 6.25)
        return s

    for i in range(40):  # climb to 30000
        states.append(pt(t, i * 750))
        t += 20_000
    for i in range(40):  # cruise
        states.append(pt(t, 30000))
        t += 20_000
    for i in range(40):  # descent
        states.append(pt(t, 30000 - i * 750))
        t += 20_000
    for i in range(5):  # on ground
        states.append(pt(t, 0, ground=True))
        t += 60_000
    t += 40 * 60_000  # 40 min gap
    for i in range(40):  # next flight climb
        states.append(pt(t, i * 750))
        t += 20_000
    legs = mark_legs(states)
    assert legs >= 1
    assert any(s.leg_marker for s in states)


def test_heatmap_binary(tmp_path):
    from readsb_tpu.io.history import HEAT_ENTRY, write_heatmap

    tr = Tracker(keep_traces=True, json_trace_interval=8000)
    now = 1_700_000_000_000
    a = tr.get_or_create(0xABC123, now)
    a.trace = Trace()
    a.lat, a.lon = 48.0, 11.0
    a.gs = 400.0
    a.baro_alt = 30000
    a.callsign = "HEAT01"
    a.squawk = 0x1234
    for i in range(60):
        t = now + i * 10_000
        a.lat = 48.0 + i * 0.01
        _fresh(a, t, ["gs", "baro_alt", "callsign", "squawk", "position"])
        a.trace.add(a, t, json_trace_interval=8000)

    path = write_heatmap(tr, str(tmp_path), now, now + 30 * 60 * 1000,
                         interval_ms=30_000)
    raw = gzip.decompress(open(path, "rb").read())
    assert len(raw) % HEAT_ENTRY.size == 0
    num_slices = 60
    entries = [HEAT_ENTRY.unpack_from(raw, i * HEAT_ENTRY.size)
               for i in range(len(raw) // HEAT_ENTRY.size)]
    # index entries point at slice starts; first slice starts after index
    assert entries[0][0] == num_slices
    sauce = entries[num_slices]
    assert sauce[0] == 0xE7F7C9D
    ts = ((sauce[1] & 0xFFFFFFFF) << 32) | (sauce[2] & 0xFFFFFFFF)
    assert ts == now
    # at least one real position entry with our altitude
    got_alt = [e[3] for e in entries[num_slices:] if e[0] != 0xE7F7C9D and not (e[1] & (1 << 30))]
    assert any(abs(alt - 30000 // 25) <= 1 for alt in got_alt)


def test_tracker_trace_integration():
    tr = Tracker(json_reliable=-1, keep_traces=True, json_trace_interval=8000)
    now = 1_000_000
    # two CPR messages -> global decode -> position -> trace point
    from tools.synth import cpr_encode_airborne

    lat, lon = 48.2, 11.4
    for odd in (0, 1):
        clat, clon = cpr_encode_airborne(lat, lon, odd)
        mm = ModesMessage(
            msgtype=17, addr=0xABCDEF, source=Source.ADSB,
            sys_timestamp_ms=now + odd * 300, cpr_valid=True, cpr_odd=odd,
            cpr_lat=clat, cpr_lon=clon,
        )
        a = tr.update(mm)
    assert a.seen_pos
    assert a.trace is not None and len(a.trace) >= 1
    assert a.globe_index == globe.globe_index(a.lat, a.lon)


def test_write_traces_budget_rotates_cursor(tmp_path):
    """A tick that exhausts its time budget resumes from the cursor on
    the next tick, so the tail of the aircraft table never starves
    (reference's part-rotating tracePool sweep, readsb.c:975-1114)."""
    from readsb_tpu.io.history import write_traces

    tr = Tracker(keep_traces=True, json_trace_interval=8000)
    now = 1_700_000_000_000
    addrs = [0x100000 + i for i in range(6)]
    for addr in addrs:
        a = tr.get_or_create(addr, now)
        a.trace = Trace()
        a.lat, a.lon = 40.0 + (addr & 0xF) * 0.1, 9.0
        a.gs, a.baro_alt = 300.0, 20000
        for i in range(3):
            t = now + i * 10_000
            a.lat += 0.01
            _fresh(a, t, ["gs", "baro_alt", "position"])
            a.trace.add(a, t, json_trace_interval=8000)
        assert a.trace.dirty

    # zero budget: exactly one aircraft per tick, rotation covers all
    seen = []
    cursor = 0
    for _ in range(len(addrs)):
        before = {x for x in addrs if tr.aircraft[x].trace.dirty}
        n, cursor = write_traces(tr, str(tmp_path), now,
                                 time_budget_s=1e-12, cursor=cursor)
        assert n == 1
        after = {x for x in addrs if tr.aircraft[x].trace.dirty}
        seen.extend(sorted(before - after))
    assert seen == addrs  # full rotation in order, no starvation
    assert not any(a.trace.dirty for a in tr.aircraft.values())

    # everything clean: nothing written, cursor keeps rotating
    n, cursor = write_traces(tr, str(tmp_path), now, cursor=cursor)
    assert n == 0


def test_write_traces_hist_only_mask(tmp_path):
    from readsb_tpu.io.history import write_traces

    tr = Tracker(keep_traces=True, json_trace_interval=8000)
    now = 1_700_000_000_000
    a = tr.get_or_create(0x500500, now)
    a.trace = Trace()
    a.lat, a.lon, a.gs, a.baro_alt = 50.0, 10.0, 300.0, 20000
    for i in range(3):
        t = now + i * 10_000
        a.lat += 0.01
        _fresh(a, t, ["gs", "baro_alt", "position"])
        a.trace.add(a, t, json_trace_interval=8000)

    write_traces(tr, str(tmp_path), now, time_budget_s=None, hist_only=1)
    shard = tmp_path / "traces" / "00"
    assert not (shard / "trace_recent_500500.json").exists()
    assert (shard / "trace_full_500500.json").exists()
