"""Fuzz parity: columnar decode_columns vs the scalar decoder on random
frame bytes — every covered row's fields must match decode_frame's view
of the same bits (decodePool batching must not change decode results)."""

import numpy as np

from readsb_tpu.decode.batch import decode_columns
from readsb_tpu.decode.fields import decode_frame
from readsb_tpu.decode.score import RawFrame


def _scalar(msg: bytes, addr: int, ts: int):
    frame = RawFrame(
        msg=msg, msgbits=len(msg) * 8, timestamp=ts * 12000, score=0,
        phase=0, correctedbits=0, addr=addr, signal_power=0.0, iid=0,
    )
    return decode_frame(frame, epoch_ms=0)


def test_decode_columns_fuzz_parity():
    rng = np.random.default_rng(11)
    n = 4000
    msgs = rng.integers(0, 256, size=(n, 14), dtype=np.int64).astype(np.uint8)
    # force a plausible DF mix (columnar path's hot set + some long tail)
    dfs = rng.choice([0, 4, 5, 11, 17, 18, 20, 21, 24], size=n)
    msgs[:, 0] = (dfs << 3 | (msgs[:, 0] & 7)).astype(np.uint8)
    addrs = rng.integers(1, 1 << 24, size=n, dtype=np.int64)
    ts = np.arange(n, dtype=np.int64) * 7 + 1_700_000_000_000

    cols = decode_columns(msgs, ts, addrs)

    checked = 0
    for i in range(n):
        short = dfs[i] < 16
        mm = _scalar(bytes(msgs[i, : 7 if short else 14]), int(addrs[i]), int(ts[i]))
        assert cols["addr"][i] == (addrs[i] & 0xFFFFFF)
        if cols["alt_valid"][i]:
            assert mm.baro_alt is not None, i
            assert cols["alt"][i] == mm.baro_alt, i
            checked += 1
        if cols["squawk_valid"][i]:
            assert mm.squawk_hex is not None, i
            assert int(cols["squawk"][i]) == mm.squawk_hex, i
            checked += 1
        if cols["cpr_valid"][i]:
            assert mm.cpr_valid, i
            assert int(cols["cpr_lat"][i]) == mm.cpr_lat, i
            assert int(cols["cpr_lon"][i]) == mm.cpr_lon, i
            assert bool(cols["cpr_odd"][i]) == bool(mm.cpr_odd), i
            from readsb_tpu.decode.fields import CprType

            assert bool(cols["cpr_surface"][i]) == (mm.cpr_type == CprType.SURFACE), i
            checked += 1
        if cols["gs_valid"][i]:
            assert mm.gs_selected is not None, i
            assert abs(float(cols["gs"][i]) - mm.gs_selected) < 1e-6, i
            checked += 1
        if cols["track_valid"][i]:
            assert mm.heading is not None, i
            assert abs(float(cols["track"][i]) - mm.heading) < 1e-9, i
            checked += 1
        if cols["callsign_valid"][i]:
            assert mm.callsign is not None, i
            assert bytes(cols["callsign"][i]).decode("latin1") == mm.callsign, i
            checked += 1
    assert checked > 200  # the random fleet hits every compared field
