"""Arena (device SoA aircraft store) vs the dict tracker as oracle.

Replays the same time-ordered message stream through both and diffs the
final per-aircraft field states (value, source, freshness).
"""

import numpy as np
import pytest

from readsb_tpu.decode.fields import ModesMessage, Source
from readsb_tpu.track.arena import ATTR_OF, Arena, FIELDS
from readsb_tpu.track.tracker import TRACK_EXPIRE, Tracker


def make_msgs(seed=5, n_aircraft=40, n_msgs=3000, t0=1_000_000):
    rng = np.random.default_rng(seed)
    addrs = rng.integers(0x400000, 0x500000, n_aircraft)
    msgs = []
    t = t0
    for i in range(n_msgs):
        t += int(rng.integers(5, 80))
        addr = int(addrs[rng.integers(0, n_aircraft)])
        src = int(rng.choice([Source.MODE_S, Source.ADSB, Source.MLAT, Source.TISB]))
        mm = ModesMessage(msgtype=17, addr=addr, source=Source(src),
                          sys_timestamp_ms=t)
        for name in FIELDS:
            if rng.random() < 0.25:
                setattr(mm, ATTR_OF[name], float(np.float32(rng.uniform(-500, 500))))
        if rng.random() < 0.1:
            mm.callsign = "FL" + str(int(rng.integers(100, 999)))
        msgs.append(mm)
    return msgs


def test_arena_matches_tracker():
    msgs = make_msgs()
    now = msgs[-1].sys_timestamp_ms

    tracker = Tracker()
    for mm in msgs:
        tracker.update(mm)

    arena = Arena(n=4096)
    # feed in batches of uneven sizes (exercises cross-batch state carry)
    i = 0
    rng = np.random.default_rng(1)
    while i < len(msgs):
        j = min(len(msgs), i + int(rng.integers(50, 700)))
        arena.update_batch(msgs[i:j])
        i = j

    snap = arena.snapshot(now)
    checked_fields = 0
    for addr, a in tracker.aircraft.items():
        row = snap.get(addr)
        assert row is not None, hex(addr)
        for name in FIELDS:
            v = getattr(a, name, None)
            valid = getattr(a, name + "_valid", None)
            fresh = valid is not None and valid.valid(now)
            if fresh:
                assert name in row, (hex(addr), name)
                got_v, got_src = row[name]
                assert got_v == pytest.approx(v), (hex(addr), name)
                assert got_src == int(valid.source), (hex(addr), name)
                checked_fields += 1
            else:
                assert name not in row, (hex(addr), name)
    assert checked_fields > 100


def test_arena_sweep():
    msgs = make_msgs(n_aircraft=10, n_msgs=200)
    arena = Arena(n=512)
    arena.update_batch(msgs)
    now = msgs[-1].sys_timestamp_ms
    assert len(arena.slot_of) == len({m.addr for m in msgs})
    freed = arena.sweep(now + 10 * TRACK_EXPIRE)
    assert freed == len({m.addr for m in msgs})
    assert not arena.slot_of
    assert arena.snapshot(now) == {}


def test_arena_altitude_and_squawk_fuzz():
    """Arena v2 on-device accept logic == dict tracker: altitude outlier
    rejection (track.c:1709) and squawk double-confirmation (track.c:2071)
    on a fuzzed stream with excursions, churn and mixed sources."""
    rng = np.random.default_rng(17)
    addrs = [0x4D0000 + i for i in range(25)]
    alt_state = {a: 10_000 + 500 * i for i, a in enumerate(addrs)}
    sq_state = {a: 0o1200 + i for i, a in enumerate(addrs)}
    msgs = []
    t = 2_000_000
    for i in range(4000):
        t += int(rng.integers(20, 200))
        addr = addrs[int(rng.integers(len(addrs)))]
        mm = ModesMessage(msgtype=17, addr=addr, source=Source.ADSB,
                          sys_timestamp_ms=t)
        k = rng.integers(10)
        if k < 4:
            # normal climb with occasional implausible excursion
            alt_state[addr] += int(rng.integers(-200, 300))
            mm.baro_alt = alt_state[addr]
            if rng.random() < 0.08:
                mm.baro_alt += int(rng.choice([-30000, 25000, 40000]))
            mm.alt_q_bit = 1
            mm.crc = 0 if rng.random() < 0.7 else 1
            if rng.random() < 0.2:
                mm.source = Source.MODE_S
                mm.msgtype = 4
        elif k < 6:
            mm.baro_rate = int(rng.integers(-40, 40)) * 64
        elif k < 8:
            if rng.random() < 0.15:
                sq_state[addr] = int(rng.integers(0, 0o7777))
            mm.squawk_hex = int(oct(sq_state[addr])[2:], 16)
            if rng.random() < 0.4:
                mm.msgtype = 5
                mm.source = Source.MODE_S
        else:
            mm.gs_selected = float(np.float32(rng.uniform(0, 600)))
        msgs.append(mm)

    tracker = Tracker()
    for mm in msgs:
        tracker.update(mm)

    arena = Arena(n=2048)
    i = 0
    while i < len(msgs):
        j = min(len(msgs), i + int(rng.integers(100, 900)))
        arena.update_batch(msgs[i:j])
        i = j

    now = msgs[-1].sys_timestamp_ms
    snap = arena.snapshot(now)
    n_alt = n_sq = 0
    for addr, a in tracker.aircraft.items():
        row = snap[addr]
        if a.baro_alt_valid.source != Source.INVALID and isinstance(a.baro_alt, int):
            got = row.get("baro_alt")
            assert got is not None, hex(addr)
            assert got[0] == a.baro_alt, (hex(addr), got, a.baro_alt)
            assert got[1] == int(a.baro_alt_valid.source)
            assert row["alt_reliable"] == a.alt_reliable, hex(addr)
            n_alt += 1
        sq = row.get("squawk")
        assert (sq[0] if sq else None) == a.squawk, hex(addr)
        assert row.get("squawk_tentative") == a.squawk_tentative, hex(addr)
        if a.squawk is not None:
            n_sq += 1
    assert n_alt >= 20 and n_sq >= 15
    # outliers were actually rejected somewhere (reliability dipped)
    assert any(
        row.get("alt_reliable", 20) < 20 for row in snap.values()
    )


def test_arena_device_cpr_matches_host_chain():
    """The arena's on-device global airborne CPR decode (exact-int core +
    reference f64 map) must reproduce every _do_global_cpr result of the
    dict tracker on the same replay, bit for bit (VERDICT r5 #5 stage 2)."""
    from readsb_tpu.decode.fields import CprType

    rng = np.random.default_rng(31)
    addrs = [0x4E0000 + i for i in range(12)]
    base = {a: (47.0 + 0.3 * i, 7.0 + 0.4 * i) for i, a in enumerate(addrs)}
    msgs = []
    t = 3_000_000
    from readsb_tpu.decode.cpr import encode_cpr

    for step in range(160):
        t += int(rng.integers(80, 400))
        addr = addrs[int(rng.integers(len(addrs)))]
        lat0, lon0 = base[addr]
        lat = lat0 + step * 2e-4
        lon = lon0 + step * 1e-4
        odd = step & 1
        clat, clon = encode_cpr(lat, lon, odd)
        mm = ModesMessage(msgtype=17, addr=addr, source=Source.ADSB,
                          sys_timestamp_ms=t)
        mm.cpr_valid = True
        mm.cpr_odd = bool(odd)
        mm.cpr_type = CprType.AIRBORNE
        mm.cpr_lat = clat
        mm.cpr_lon = clon
        mm.metype = 11
        msgs.append(mm)

    # host oracle: record each global decode result
    tracker = Tracker(receiver_lat=47.0, receiver_lon=8.0)
    host_decodes = []
    orig = tracker._do_global_cpr

    def spy(a, mm):
        out = orig(a, mm)
        if out is not None and mm.cpr_type != CprType.SURFACE:
            host_decodes.append(
                (a.addr, mm.sys_timestamp_ms, bool(mm.cpr_odd), out[0], out[1],
                 min(a.cpr_even.nic, a.cpr_odd.nic),
                 max(a.cpr_even.rc, a.cpr_odd.rc))
            )
        return out

    tracker._do_global_cpr = spy
    for mm in msgs:
        tracker.update(mm)

    arena = Arena(n=512)
    i = 0
    rng2 = np.random.default_rng(5)
    while i < len(msgs):
        j = min(len(msgs), i + int(rng2.integers(20, 90)))
        arena.update_batch(msgs[i:j])
        i = j

    assert len(host_decodes) > 100
    assert arena.cpr_decodes == host_decodes


def test_arena_device_cpr_surface_matches_host_chain():
    """With a fixed receiver location, the arena decodes SURFACE global
    CPR on device too (exact-int core + host quadrant thresholds + the
    450 km reference gate): every surface _do_global_cpr result of the
    dict tracker must be reproduced bit for bit."""
    from readsb_tpu.decode.cpr import encode_cpr
    from readsb_tpu.decode.fields import CprType

    rng = np.random.default_rng(53)
    reflat, reflon = 47.0, 8.0
    addrs = [0x3C0000 + i for i in range(10)]
    base = {a: (reflat - 0.4 + 0.08 * i, reflon - 0.5 + 0.1 * i)
            for i, a in enumerate(addrs)}
    msgs = []
    t = 7_000_000
    for step in range(200):
        t += int(rng.integers(80, 400))
        addr = addrs[int(rng.integers(len(addrs)))]
        lat0, lon0 = base[addr]
        lat = lat0 + step * 4e-5
        lon = lon0 + step * 2e-5
        odd = step & 1
        clat, clon = encode_cpr(lat, lon, odd, surface=True)
        mm = ModesMessage(msgtype=17, addr=addr, source=Source.ADSB,
                          sys_timestamp_ms=t)
        mm.cpr_valid = True
        mm.cpr_odd = bool(odd)
        mm.cpr_type = CprType.SURFACE
        mm.cpr_lat = clat
        mm.cpr_lon = clon
        mm.metype = 6
        msgs.append(mm)

    tracker = Tracker(receiver_lat=reflat, receiver_lon=reflon)
    host_decodes = []
    orig = tracker._do_global_cpr

    def spy(a, mm):
        out = orig(a, mm)
        if out is not None:
            host_decodes.append(
                (a.addr, mm.sys_timestamp_ms, bool(mm.cpr_odd), out[0], out[1],
                 min(a.cpr_even.nic, a.cpr_odd.nic),
                 max(a.cpr_even.rc, a.cpr_odd.rc))
            )
        return out

    tracker._do_global_cpr = spy
    for mm in msgs:
        tracker.update(mm)

    arena = Arena(n=512, receiver_lat=reflat, receiver_lon=reflon)
    i = 0
    rng2 = np.random.default_rng(7)
    while i < len(msgs):
        j = min(len(msgs), i + int(rng2.integers(20, 90)))
        arena.update_batch(msgs[i:j])
        i = j

    assert len(host_decodes) > 120
    assert arena.cpr_decodes == host_decodes
