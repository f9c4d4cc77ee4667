"""BulkTracker vs dict Tracker on an adversarial randomized stream.

test_bulk proves equivalence on a well-behaved synthetic capture; this
stream stresses the tracking edge cases instead: position outliers that
must fail the speed check, exact duplicates, stale-parity CPR pairs,
interleaved fleets, and bursts landing on the same timestamp (intra-
batch ordering).  The columnar tracker must agree with the dict tracker
on every counter and per-aircraft position regardless."""

import numpy as np
import pytest

from readsb_tpu.decode.batch import decode_columns
from readsb_tpu.decode.fields import decode_frame
from readsb_tpu.decode.score import RawFrame
from readsb_tpu.track.bulk import BulkTracker
from readsb_tpu.track.tracker import Tracker
from tools.synth import (
    encode_df17_ident,
    encode_df17_position,
    encode_df17_velocity,
)

LAT, LON = 47.0, 8.0


def _stream(seed: int, n_aircraft: int = 12, n_msgs: int = 3000):
    rng = np.random.default_rng(seed)
    fleet = []
    for k in range(n_aircraft):
        fleet.append({
            "addr": 0x3C0000 + k * 0x111,
            "lat": LAT + rng.uniform(-1, 1),
            "lon": LON + rng.uniform(-1, 1),
            "alt": float(rng.integers(4, 380) * 100),
            "gs": float(rng.uniform(80, 480)),
            "trk": float(rng.uniform(0, 360)),
        })
    msgs = []
    t = 1_700_000_000_000
    for i in range(n_msgs):
        ac = fleet[int(rng.integers(0, n_aircraft))]
        t += int(rng.integers(0, 3)) * int(rng.integers(1, 120))
        kind = rng.random()
        if kind < 0.55:
            odd = int(rng.integers(0, 2))
            lat, lon = ac["lat"], ac["lon"]
            r = rng.random()
            if r < 0.08:
                lat += rng.uniform(2.5, 5.0)  # outlier: speed check must trip
            elif r < 0.16:
                pass  # exact duplicate position (dup cache territory)
            else:
                ac["lat"] += rng.uniform(-1, 1) * 1e-3
                ac["lon"] += rng.uniform(-1, 1) * 1e-3
                lat, lon = ac["lat"], ac["lon"]
            msg = encode_df17_position(ac["addr"], lat, lon, ac["alt"], odd)
        elif kind < 0.8:
            msg = encode_df17_velocity(ac["addr"], ac["gs"], ac["trk"], 0.0)
        else:
            msg = encode_df17_ident(ac["addr"], f"ADV{ac['addr'] & 0xFFF:03X}")
        msgs.append((msg, ac["addr"], t))
    return msgs


@pytest.mark.parametrize("seed", [3, 9])
def test_bulk_adversarial_equivalence(seed):
    stream = _stream(seed)

    tr = Tracker(receiver_lat=LAT, receiver_lon=LON)
    for msg, addr, ts in stream:
        frame = RawFrame(
            msg=msg, msgbits=112, timestamp=ts * 12000, score=0, phase=0,
            correctedbits=0, addr=addr, signal_power=0.0, iid=0,
        )
        mm = decode_frame(frame, epoch_ms=0)
        tr.update(mm)

    bulk = BulkTracker(LAT, LON)
    n = len(stream)
    msgs = np.zeros((n, 14), np.uint8)
    ts = np.zeros(n, np.int64)
    addrs = np.zeros(n, np.int64)
    for i, (msg, addr, t) in enumerate(stream):
        msgs[i] = np.frombuffer(msg, np.uint8)
        ts[i] = t
        addrs[i] = addr
    for a in range(0, n, 257):  # odd chunk size: bursts straddle batches
        cols = decode_columns(msgs[a:a + 257], ts[a:a + 257], addrs[a:a + 257])
        bulk.update_batch(cols)

    for k in (
        "cpr_airborne", "cpr_global_ok", "cpr_global_bad",
        "cpr_global_skipped", "cpr_local_ok", "cpr_local_skipped",
        "cpr_global_speed_checks", "cpr_local_speed_checks",
        "messages_total",
    ):
        assert getattr(bulk, k) == getattr(tr, k), k
    assert bulk.cpr_global_speed_checks + tr.cpr_local_speed_checks > 0, (
        "outliers never exercised the speed check — stream too tame"
    )

    slot_of = {int(bulk.cols.addr[i]): i for i in range(bulk.n_slots)}
    assert set(slot_of) == set(tr.aircraft)
    for addr, a in tr.aircraft.items():
        i = slot_of[addr]
        c = bulk.cols
        if a.seen_pos:
            assert c.seen_pos[i] == a.seen_pos, hex(addr)
            assert abs(c.lat[i] - a.lat) < 1e-9, hex(addr)
            assert abs(c.lon[i] - a.lon) < 1e-9, hex(addr)
        if a.baro_alt is not None:
            assert c.alt[i] == a.baro_alt, hex(addr)
