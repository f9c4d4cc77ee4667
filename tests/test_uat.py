"""UAT -> synthetic DF18 translation, planefinder, gpsd, VRS output tests.

Reference behaviors: uat2esnt/uat_decode.c (MDB unpack),
uat2esnt/uat2esnt.c (DF18 synthesis), net_io.c:3995-4103 (planefinder),
net_io.c:3609-3717 (gpsd), json_out.c:2059 (VRS).
"""

import math

import numpy as np
import pytest

from readsb_tpu.decode import cpr as cpr_mod
from readsb_tpu.decode.fields import decode_frame
from readsb_tpu.decode.score import RawFrame
from readsb_tpu.io import gpsd as gpsd_io
from readsb_tpu.io import planefinder as pf_io
from readsb_tpu.io import uat as uat_io
from readsb_tpu.ops import crc as crc_ops


def _setbits(frame, first, last, value):
    uat_io._setbits(frame, 0, first, last, value)


def make_uat_frame(
    addr=0xA12345,
    lat=40.0,
    lon=-75.0,
    alt_ft=10000,
    ns_vel=100,
    ew_vel=100,
    vert_rate=640,
    callsign="N123AB",
    mdb_type=1,
    address_qualifier=0,
    airground=uat_io.AG_SUBSONIC,
):
    """Pack a LONG UAT downlink payload per uat_decode.c bit layout."""
    f = bytearray(uat_io.LONG_FRAME_DATA_BYTES)
    f[0] = ((mdb_type & 0x1F) << 3) | (address_qualifier & 7)
    f[1], f[2], f[3] = (addr >> 16) & 0xFF, (addr >> 8) & 0xFF, addr & 0xFF

    raw_lat = round((lat % 360.0) * 16777216.0 / 360.0) & 0xFFFFFF
    raw_lon = round((lon % 360.0) * 16777216.0 / 360.0) & 0xFFFFFF
    f[4] = (raw_lat >> 15) & 0xFF
    f[5] = (raw_lat >> 7) & 0xFF
    f[6] = ((raw_lat << 1) & 0xFE) | ((raw_lon >> 23) & 1)
    f[7] = (raw_lon >> 15) & 0xFF
    f[8] = (raw_lon >> 7) & 0xFF
    f[9] = (raw_lon << 1) & 0xFE  # bit0 = altitude type (0 = baro)

    raw_alt = (alt_ft + 1000) // 25 + 1
    f[10] = (raw_alt >> 4) & 0xFF
    f[11] = ((raw_alt & 0xF) << 4) | 8  # NIC=8

    raw_ns = (abs(ns_vel) + 1) | (0x400 if ns_vel < 0 else 0)
    raw_ew = (abs(ew_vel) + 1) | (0x400 if ew_vel < 0 else 0)
    f[12] = ((airground & 3) << 6) | ((raw_ns >> 6) & 0x1F)
    f[13] = ((raw_ns & 0x3F) << 2) | ((raw_ew >> 9) & 3)
    f[14] = (raw_ew >> 1) & 0xFF
    raw_vv = (abs(vert_rate) // 64 + 1) | (0x200 if vert_rate < 0 else 0) | 0x400  # baro source
    f[15] = ((raw_ew & 1) << 7) | ((raw_vv >> 4) & 0x7F)
    f[16] = (raw_vv & 0xF) << 4

    # MS section: base-40 callsign + flags
    b40 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ  .."
    cs = (callsign + "        ")[:8]
    emitter = 1  # light aircraft

    def b40i(ch):
        i = b40.find(ch)
        return i if i >= 0 else 36

    v1 = emitter * 1600 + b40i(cs[0]) * 40 + b40i(cs[1])
    v2 = b40i(cs[2]) * 1600 + b40i(cs[3]) * 40 + b40i(cs[4])
    v3 = b40i(cs[5]) * 1600 + b40i(cs[6]) * 40 + b40i(cs[7])
    f[17], f[18] = (v1 >> 8) & 0xFF, v1 & 0xFF
    f[19], f[20] = (v2 >> 8) & 0xFF, v2 & 0xFF
    f[21], f[22] = (v3 >> 8) & 0xFF, v3 & 0xFF
    f[23] = (0 << 5) | (2 << 2) | 3  # no emergency, UAT v2, SIL 3
    f[25] = (10 << 4) | (2 << 1) | 1  # NACp 10, NACv 2, NICbaro 1
    f[26] = 0x02  # CSID=1: callsign field holds a callsign
    return bytes(f)


def test_decode_mdb_fields():
    m = uat_io.decode_adsb_mdb(make_uat_frame())
    assert m.address == 0xA12345
    assert m.position_valid
    assert abs(m.lat - 40.0) < 1e-4
    assert abs(m.lon - (-75.0)) < 1e-4
    assert m.altitude == 10000
    assert m.altitude_type == uat_io.ALT_BARO
    assert m.ns_vel == 100 and m.ew_vel == 100
    assert m.speed == int(math.sqrt(2) * 100)
    assert m.vert_rate == 640
    assert m.callsign == "N123AB"
    assert m.callsign_type == uat_io.CS_CALLSIGN
    assert m.nic == 8
    assert m.nac_p == 10
    assert m.sil == 3


def test_esnt_frames_valid_crc_and_df18():
    m = uat_io.decode_adsb_mdb(make_uat_frame())
    frames = uat_io.mdb_to_esnt(m)
    # air position even+odd, velocity, ident
    assert len(frames) == 4
    for fr in frames:
        assert len(fr) == 14
        assert fr[0] >> 3 == 18
        assert crc_ops.checksum(fr, 112) == 0
        assert int.from_bytes(fr[1:4], "big") == 0xA12345
        # CF=6 -> ADS-B rebroadcast for AQ_ADSB_ICAO
        assert fr[0] & 7 == 6


def test_esnt_position_roundtrip():
    m = uat_io.decode_adsb_mdb(make_uat_frame(lat=40.0, lon=-75.0))
    frames = uat_io.mdb_to_esnt(m)
    even, odd = frames[0], frames[1]
    me_even, me_odd = even[4:11], odd[4:11]
    assert (me_even[0] >> 3) == 18  # TC=18 baro airborne position

    def cpr_fields(me):
        lat17 = ((me[2] & 3) << 15) | (me[3] << 7) | (me[4] >> 1)
        lon17 = ((me[4] & 1) << 16) | (me[5] << 8) | me[6]
        return lat17, lon17

    elat, elon = cpr_fields(me_even)
    olat, olon = cpr_fields(me_odd)
    pos = cpr_mod.decode_airborne(elat, elon, olat, olon, fflag=1)
    assert pos is not None
    lat, lon = pos
    assert abs(lat - 40.0) < 0.001
    assert abs(lon - (-75.0)) < 0.001


def test_esnt_velocity_decodes():
    m = uat_io.decode_adsb_mdb(make_uat_frame(ns_vel=-300, ew_vel=400, vert_rate=-1280))
    frames = uat_io.mdb_to_esnt(m)
    vel = [f for f in frames if (f[4] >> 3) == 19]
    assert len(vel) == 1
    mm = decode_frame(
        RawFrame(
            msg=vel[0], msgbits=112, timestamp=0, score=1800, phase=4,
            correctedbits=0, addr=0xA12345, signal_power=0.1,
        )
    )
    assert mm.gs_selected is not None
    assert abs(mm.gs_selected - 500.0) < 2.0
    # uat2esnt encodes ALT_BARO as VR-source bit 0 (uat2esnt.c:447-449),
    # which the Mode-S decoder reads as geometric — reference quirk chain
    # preserved for wire parity.
    assert mm.geom_rate == -1280


def test_esnt_ident_decodes():
    m = uat_io.decode_adsb_mdb(make_uat_frame(callsign="N123AB"))
    frames = uat_io.mdb_to_esnt(m)
    ident = [f for f in frames if 1 <= (f[4] >> 3) <= 4]
    assert len(ident) == 1
    mm = decode_frame(
        RawFrame(
            msg=ident[0], msgbits=112, timestamp=0, score=1800, phase=4,
            correctedbits=0, addr=0xA12345, signal_power=0.1,
        )
    )
    assert mm.callsign.strip() == "N123AB"


def test_convert_line_end_to_end():
    hexpart = make_uat_frame().hex().upper()
    frames, sig = uat_io.convert_line(("-" + hexpart + ";rssi=-12.0;").encode())
    assert len(frames) == 4
    assert 1 <= sig <= 255
    # uplink and junk lines ignored
    assert uat_io.convert_line(b"+ABCDEF;")[0] == []
    assert uat_io.convert_line(b"garbage")[0] == []


def test_surface_position_frames():
    m = uat_io.decode_adsb_mdb(
        make_uat_frame(airground=uat_io.AG_GROUND, lat=52.0, lon=4.0)
    )
    frames = uat_io.mdb_to_esnt(m)
    surf = [f for f in frames if 5 <= (f[4] >> 3) <= 8]
    assert len(surf) == 2  # even + odd
    for fr in surf:
        assert crc_ops.checksum(fr, 112) == 0


def test_tisb_address_gating():
    m = uat_io.decode_adsb_mdb(make_uat_frame(address_qualifier=uat_io.AQ_TISB_ICAO))
    assert all(f[0] & 7 == 2 for f in uat_io.mdb_to_esnt(m))
    assert uat_io.mdb_to_esnt(m, use_tisb=False) == []
    # vehicles/beacons ARE forwarded, with CF=1 and IMF=1 (should_send's
    # default case returns 1; encode_cf default 1 — uat2esnt.c:242-257,701)
    m2 = uat_io.decode_adsb_mdb(make_uat_frame(address_qualifier=uat_io.AQ_VEHICLE))
    frames2 = uat_io.mdb_to_esnt(m2)
    assert frames2, "vehicle/beacon traffic must not be dropped"
    assert all(f[0] & 7 == 1 for f in frames2)  # CF=1


# ---------------------------------------------------------------------------
# planefinder
# ---------------------------------------------------------------------------


def _pf_stuff(payload: bytes) -> bytes:
    out = bytearray([pf_io.DLE, 0xC1])
    for b in payload:
        out.append(b)
        if b == pf_io.DLE:
            out.append(pf_io.DLE)
    out += bytes([pf_io.DLE, pf_io.ETX])
    return bytes(out)


def test_planefinder_deframe_and_decode():
    msg = bytes.fromhex("8d4840d6202cc371c32ce0576098")
    payload = bytes([0, 0x02, 0x80]) + (1_700_000_000).to_bytes(4, "big") + (500_000_000).to_bytes(4, "big") + msg
    wire = _pf_stuff(payload)
    d = pf_io.PfDeframer()
    got = list(d.feed(wire))
    assert len(got) == 1
    assert got[0].msg == msg
    assert got[0].signal_byte == 0x80
    assert got[0].timestamp_ns == 1_700_000_000 * 10**9 + 500_000_000
    assert not got[0].is_modeac


def test_planefinder_dle_escapes_and_split_feed():
    # message containing DLE bytes in payload, fed in two chunks
    msg = bytes([pf_io.DLE] * 7)
    payload = bytes([0, 0x01, pf_io.DLE]) + bytes(8) + msg
    wire = _pf_stuff(payload)
    d = pf_io.PfDeframer()
    got = list(d.feed(wire[:9]))
    got += list(d.feed(wire[9:]))
    assert len(got) == 1
    assert got[0].msg == msg
    assert got[0].signal_byte == pf_io.DLE


# ---------------------------------------------------------------------------
# gpsd
# ---------------------------------------------------------------------------


def test_gpsd_tpv_parse():
    line = b'{"class":"TPV","mode":3,"lat":51.47,"lon":-0.45,"alt":32.5}'
    assert gpsd_io.parse_tpv_line(line) == (51.47, -0.45, 32.5)
    assert gpsd_io.parse_tpv_line(b'{"class":"SKY"}') is None
    assert gpsd_io.parse_tpv_line(b'{"class":"TPV","lat":0.01,"lon":0.01}') is None
    assert gpsd_io.parse_tpv_line(b'{"class":"TPV","lat":95.0,"lon":10.0}') is None
    assert gpsd_io.parse_tpv_line(b"not json") is None


# ---------------------------------------------------------------------------
# VRS
# ---------------------------------------------------------------------------


def test_vrs_output():
    import json

    from readsb_tpu.io.vrs import generate_vrs
    from readsb_tpu.track.tracker import Tracker
    from readsb_tpu.decode.fields import Source

    t = Tracker()
    now = 100_000
    a = t.get_or_create(0xABCDEF, now)
    a.seen = now
    a.lat, a.lon = 40.0, -75.0
    a.position_valid.updated = now; a.position_valid.source = Source.ADSB
    a.baro_alt = 10000
    a.baro_alt_valid.updated = now; a.baro_alt_valid.source = Source.ADSB
    a.callsign = "TEST123"
    a.callsign_valid.updated = now; a.callsign_valid.source = Source.ADSB
    doc = json.loads(generate_vrs(t, now))
    assert doc["totalAc"] == 1
    ac = doc["acList"][0]
    assert ac["Icao"] == "ABCDEF"
    assert ac["Lat"] == 40.0 and ac["Long"] == -75.0
    assert ac["Alt"] == 10000
    assert ac["Call"] == "TEST123"
    # stale aircraft excluded
    assert json.loads(generate_vrs(t, now + 60_000))["totalAc"] == 0
