"""Per-feeder receiver quality DB (receiver.c analog)."""

from readsb_tpu.decode.fields import CprType, ModesMessage, Source
from readsb_tpu.track.receiver import (
    RANGE_BAD,
    RANGE_GOOD,
    RANGE_UNCLEAR,
    ReceiverStore,
)
from readsb_tpu.track.tracker import Aircraft


def _mm(rid=0x42, source=Source.ADSB):
    return ModesMessage(receiver_id=rid, source=source, cpr_type=CprType.AIRBORNE)


def _reliable_aircraft():
    a = Aircraft(addr=0xABC123)
    a.pos_reliable_odd = 4.0
    a.pos_reliable_even = 4.0
    return a


def test_extent_growth_and_reference():
    rs = ReceiverStore()
    a = _reliable_aircraft()
    now = 1000
    # unreliable aircraft positions never modify the receiver
    bad_a = Aircraft(addr=0x111111)
    assert rs.position_received(bad_a, _mm(), 48.0, 11.0, now) == RANGE_UNCLEAR
    assert rs.get(0x42) is None

    for i in range(120):
        st = rs.position_received(a, _mm(), 48.0 + i * 0.001, 11.0, now + i)
        assert st == RANGE_GOOD
    ref = rs.get_reference(0x42)
    assert ref is not None
    lat, lon = ref
    assert abs(lat - 48.06) < 0.01 and abs(lon - 11.0) < 1e-9

    # under 100 positions -> no reference
    rs2 = ReceiverStore()
    rs2.position_received(a, _mm(), 48.0, 11.0, now)
    assert rs2.get_reference(0x42) is None


def test_range_bad_and_bad_extent():
    rs = ReceiverStore()
    a = _reliable_aircraft()
    now = 1000
    for i in range(10):
        rs.position_received(a, _mm(), 48.0, 11.0, now + i)
    # a position on another continent: RANGE_BAD
    far = Aircraft(addr=0x222222)
    far.pos_reliable_odd = far.pos_reliable_even = 4.0
    assert rs.position_received(far, _mm(), -33.0, 151.0, now + 20) == RANGE_BAD
    r = rs.get(0x42)
    assert not r.bad_extent  # one aircraft alone does not poison the extent
    # three more distinct far aircraft -> extent flagged
    for j, addr in enumerate((0x333333, 0x444444, 0x555555, 0x666666)):
        fa = Aircraft(addr=addr)
        fa.pos_reliable_odd = fa.pos_reliable_even = 4.0
        rs.position_received(fa, _mm(), -33.0, 151.0, now + 30 + j)
    assert r.bad_extent
    assert rs.get_reference(0x42) is None


def test_quarantine():
    rs = ReceiverStore()
    now = 5000
    for _ in range(7):
        rs.bad(0x99, 0xABCDEF, now)
    assert rs.check_bad(0x99, now)
    assert not rs.check_bad(0x99, now + 13_000)  # 12 s timeout expired


def test_maintenance_drops_idle():
    rs = ReceiverStore()
    a = _reliable_aircraft()
    rs.position_received(a, _mm(), 48.0, 11.0, 0)
    assert rs.get(0x42) is not None
    rs.maintenance(25 * 3600 * 1000)
    assert rs.get(0x42) is None


def test_receivers_json():
    rs = ReceiverStore()
    a = _reliable_aircraft()
    rs.position_received(a, _mm(), 48.0, 11.0, 1000)
    doc = rs.receivers_json(2000)
    assert doc["now"] == 2.0
    assert len(doc["receivers"]) == 1
    row = doc["receivers"][0]
    assert row[0] == f"{0x42:016x}"
    assert row[3] == 48.0 and row[8] == 48.0
