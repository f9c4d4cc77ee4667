"""Field decode + CPR codec tests (round-trips against tools/synth encoders)."""

import numpy as np
import pytest

from readsb_tpu.decode import cpr
from readsb_tpu.decode.fields import (
    AirGround,
    CprType,
    HeadingType,
    decode_ac12,
    decode_ac13,
    decode_frame,
    decode_id13,
    mode_a_to_mode_c,
)
from readsb_tpu.decode.score import RawFrame
from tools.synth import (
    altitude_to_ac12,
    cpr_encode_airborne,
    encode_df11,
    encode_df17_ident,
    encode_df17_position,
    encode_df17_velocity,
)


def _frame(msg: bytes) -> RawFrame:
    return RawFrame(
        msg=msg, msgbits=len(msg) * 8, timestamp=1000, score=1800, phase=4,
        correctedbits=0, addr=(msg[1] << 16) | (msg[2] << 8) | msg[3],
        signal_power=0.1,
    )


def test_cpr_airborne_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(200):
        lat = float(rng.uniform(-85, 85))
        lon = float(rng.uniform(-179, 179))
        ela, elo = cpr_encode_airborne(lat, lon, 0)
        ola, olo = cpr_encode_airborne(lat, lon, 1)
        lon_tol = 360.0 / max(cpr.nl(lat) - 1, 1) / 131072 * 1.5
        for ff in (0, 1):
            out = cpr.decode_airborne(ela, elo, ola, olo, ff)
            assert out is not None, (lat, lon)
            dlat, dlon = out
            assert abs(dlat - lat) < 1e-4, (lat, dlat)
            assert abs(dlon - lon) < lon_tol, (lon, dlon, lon_tol)


def test_cpr_relative_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(100):
        lat = float(rng.uniform(-60, 60))
        lon = float(rng.uniform(-170, 170))
        lon_tol = 360.0 / max(cpr.nl(lat) - 1, 1) / 131072 * 1.5
        for ff in (0, 1):
            cla, clo = cpr_encode_airborne(lat, lon, ff)
            out = cpr.decode_relative(lat + 0.3, lon - 0.4, cla, clo, ff, False)
            assert out is not None
            dlat, dlon = out
            assert abs(dlat - lat) < 1e-4
            assert abs(dlon - lon) < lon_tol


def test_cpr_nl_boundaries():
    assert cpr.nl(0) == 59
    assert cpr.nl(87.1) == 1
    assert cpr.nl(-52.0) == 36
    assert cpr.nl(10.4704712) == 59
    assert cpr.nl(10.4704714) == 58


def test_altitude_codecs():
    # Q-bit AC12 round trip
    for alt in (0, 1000, 10000, 38000, 49000):
        ac12 = altitude_to_ac12(alt)
        out, unit, q = decode_ac12(ac12)
        assert unit == "ft" and q == 1
        assert abs(out - alt) <= 12.5
    # Gillham: mode A 0040 -> -800ft? use known pair: 1200 ft has known code
    assert mode_a_to_mode_c(decode_id13(0)) is None


def test_decode_ident():
    msg = encode_df17_ident(0x4840D6, "KLM1023", 0xA3)
    mm = decode_frame(_frame(msg))
    assert mm.callsign == "KLM1023 "
    assert mm.callsign_valid
    assert mm.category == 0xA3
    assert mm.metype == 4


def test_decode_velocity():
    msg = encode_df17_velocity(0x4840D6, 450, 85.0, -1280)
    mm = decode_frame(_frame(msg))
    assert mm.gs_selected == pytest.approx(450, abs=2)
    assert mm.heading == pytest.approx(85.0, abs=1)
    assert mm.heading_type == HeadingType.GROUND_TRACK
    assert mm.baro_rate == pytest.approx(-1280, abs=64)


def test_decode_position():
    msg = encode_df17_position(0x4840D6, 52.2572, 3.91937, 38000, odd=0)
    mm = decode_frame(_frame(msg))
    assert mm.cpr_valid
    assert mm.cpr_type == CprType.AIRBORNE
    assert mm.cpr_odd == 0
    assert mm.baro_alt == pytest.approx(38000, abs=12.5)
    assert mm.airground == AirGround.AIRBORNE  # CA=5


def test_decode_df11():
    msg = encode_df11(0xA1B2C3)
    mm = decode_frame(_frame(msg))
    assert mm.msgtype == 11
    assert mm.CA == 5


def test_decode_pair_to_position():
    lat, lon = 47.51, 9.72
    even = encode_df17_position(0x4840D6, lat, lon, 30000, odd=0)
    odd = encode_df17_position(0x4840D6, lat, lon, 30000, odd=1)
    me = decode_frame(_frame(even))
    mo = decode_frame(_frame(odd))
    out = cpr.decode_airborne(me.cpr_lat, me.cpr_lon, mo.cpr_lat, mo.cpr_lon, 1)
    dlat, dlon = out
    assert abs(dlat - lat) < 1e-4
    assert abs(dlon - lon) < 1e-4
