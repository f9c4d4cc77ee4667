"""Arena (device SoA aircraft store) vs the dict tracker as oracle.

Replays the same time-ordered message stream through both and diffs the
final per-aircraft field states (value, source, freshness).
"""

import numpy as np
import pytest

from readsb_tpu.decode.fields import ModesMessage, Source
from readsb_tpu.track.arena import Arena, FIELDS
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
            attr = "gs_selected" if name == "gs" else name
            if rng.random() < 0.25:
                setattr(mm, attr, float(np.float32(rng.uniform(-500, 500))))
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
