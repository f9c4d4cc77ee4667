"""Aircraft DB ingest (aircraft.c:465-890) and range outline (track.c:252-300)."""

import gzip
import json
import os

import numpy as np

from readsb_tpu.track.acdb import AircraftDb, is_mil_range
from readsb_tpu.track.outline import RangeOutline
from readsb_tpu.track.tracker import Tracker

NMI = 1852.0


def _write_db(path):
    lines = [
        "a12345;N123AB;B738;00100;BOEING 737-800;2001;SOME AIRLINE\n",
        "4ca123;EI-ABC;A320;10;AIRBUS A320;;\n",
        "000000;BAD;;;;;\n",  # addr 0 skipped
        "zzz;JUNK;;;;;\n",  # unparsable skipped
    ]
    with gzip.open(path, "wt") as f:
        f.writelines(lines)


def test_db_load_and_join(tmp_path):
    p = str(tmp_path / "aircraft.csv.gz")
    _write_db(p)
    db = AircraftDb(p)
    assert db.maybe_reload()
    assert len(db.entries) == 2
    e = db.lookup(0xA12345)
    assert e.registration == "N123AB"
    assert e.type_code == "B738"
    assert e.db_flags == 0b100  # LSB-first bitstring "00100"
    assert e.type_long == "BOEING 737-800"
    assert db.lookup(0x4CA123).db_flags == 1
    # unchanged mtime -> no reload
    assert not db.maybe_reload()


def test_db_join_on_create(tmp_path):
    p = str(tmp_path / "aircraft.csv.gz")
    _write_db(p)
    t = Tracker()
    t.db = AircraftDb(p)
    t.db.maybe_reload()
    a = t.get_or_create(0xA12345, 1000)
    assert a.registration == "N123AB" and a.type_code == "B738"
    # unknown aircraft gets blank details but mil-range flag
    b = t.get_or_create(0xAE0001, 1000)  # US military block
    assert b.registration == "" and b.db_flags & 1


def test_mil_ranges():
    assert is_mil_range(0xAE0000)
    assert is_mil_range(0xADF7C8)
    assert is_mil_range(0x43C500)  # UK mil
    assert not is_mil_range(0x400040)  # UK civilian (just past mil_1)
    assert not is_mil_range(0xA00001)  # US civilian


def test_outline_update_and_json():
    o = RangeOutline()
    now = 1_000_000
    o.update(now, 100 * NMI, 45.0, 41.0, -73.0, 35000, reliable=True)
    o.update(now, 80 * NMI, 45.4, 40.9, -73.1, 30000, reliable=True)  # shorter: ignored
    o.update(now, 120 * NMI, 190.0, 38.5, -75.5, 37000, reliable=True)
    doc = json.loads(o.outline_json())
    pts = doc["actualRange"]["last24h"]["points"]
    assert [41.0, -73.0, 35000] in pts
    assert [38.5, -75.5, 37000] in pts
    assert len(pts) == 2


def test_outline_unreliable_jump_rejected():
    o = RangeOutline()
    now = 1_000_000
    o.update(now, 100 * NMI, 10.0, 41.0, -73.0, 35000, reliable=True)
    # unreliable position 300 nmi out in the same direction: > record+50nmi
    o.update(now, 300 * NMI, 10.0, 43.0, -70.0, 35000, reliable=False)
    assert float(o.distance.max()) == 100 * NMI
    # within the 50 nmi allowance: accepted
    o.update(now, 140 * NMI, 10.0, 41.5, -72.5, 35000, reliable=False)
    assert float(o.distance.max()) == 140 * NMI


def test_outline_interval_reset_and_persistence(tmp_path):
    o = RangeOutline(duration_ms=64_000)  # ~1s per interval
    o.update(1000, 100 * NMI, 0.0, 41.0, -73.0, 0, reliable=True)
    ival0 = o.last_ival
    # much later: lands in a different interval, which is zeroed first
    o.update(30_000, 50 * NMI, 0.0, 40.0, -74.0, 0, reliable=True)
    assert o.last_ival != ival0
    # persistence round-trip
    p = str(tmp_path / "rangeDirs.gz")
    o.save(p)
    o2 = RangeOutline()
    assert o2.load(p)
    assert np.array_equal(o2.distance, o.distance)
    assert o2.last_ival == o.last_ival
    assert not RangeOutline().load(str(tmp_path / "missing.gz"))


def test_tracker_outline_via_position(tmp_path):
    """Positions flowing through _set_position feed the polar histogram."""
    from readsb_tpu.decode.fields import ModesMessage, Source, CprType

    t = Tracker(receiver_lat=40.0, receiver_lon=-74.0)
    a = t.get_or_create(0xABC123, 1000)
    a.pos_reliable_odd = a.pos_reliable_even = 2.0  # proven position
    mm = ModesMessage(msg=b"\x00" * 14, msgbits=112)
    mm.source = Source.ADSB
    mm.cpr_type = CprType.AIRBORNE
    mm.cpr_odd = 0
    t._set_position(a, mm, 41.0, -73.0, 1000, from_global=True)
    assert t.distance_max > 0
    assert float(t.outline.distance.max()) > 0
