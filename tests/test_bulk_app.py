"""App-level scalar-vs-bulk equivalence + ingest throughput floor.

The same recorded beast stream drains through two in-process Apps — the
default per-message scalar path and --net-bulk-drain (the decodePool
analog) — and the aircraft.json objects must agree on every bulk-owned
field.  A throughput floor guards the point of the exercise.
"""

import time

import numpy as np
import pytest

from readsb_tpu.app.config import parse_args
from readsb_tpu.app.main import App
from readsb_tpu.io import beast as beast_io
from readsb_tpu.io.json_out import aircraft_dict
from tools.synth import (
    encode_df5,
    encode_df11,
    encode_df17_position,
    encode_df17_velocity,
)

N_AC = 1500  # aggregator-scale fleet: the regime the bulk drain is for


def _stream(n=30000):
    msgs = []
    for i in range(n):
        ac = i % N_AC
        addr = 0x450000 + ac
        seq = i // N_AC
        k = seq % 7
        lat = 49.0 + (ac % 8) * 0.2 + seq * 0.0003
        lon = 3.0 + (ac // 8) * 0.2
        if k == 5:
            msgs.append(encode_df11(addr))
        elif k == 6:
            msgs.append(encode_df5(addr, 0x1000 + ac * 4))
        elif k == 4:
            msgs.append(encode_df17_velocity(addr, 180 + ac, (ac * 23) % 360, 512))
        else:
            msgs.append(
                encode_df17_position(addr, lat, lon, 20000 + ac * 100, seq & 1)
            )
    return [
        beast_io.BeastFrame(
            msg=m, timestamp=i * 6000, signal_byte=40 + (i % 20),
            msg_type=0, receiver_id=0, synthetic_ms=1_000_000 + i // 4,
        )
        for i, m in enumerate(msgs)
    ]


def _run(frames, bulk: bool):
    argv = ["--net-only", "--quiet", "--lat", "49.5", "--lon", "3.5"]
    # bulk drain is auto-enabled by default (VERDICT r5 #7); the scalar
    # leg must opt out explicitly
    argv.append("--net-bulk-drain" if bulk else "--no-net-bulk-drain")
    app = App(parse_args(argv))
    scorer = app._net_scorer()
    t0 = time.perf_counter()
    for bf in frames:
        app._handle_net_frame(scorer, bf)
    app.drain_net_queue()
    dt = time.perf_counter() - t0
    if bulk:
        from readsb_tpu.app.bulk_drain import materialize

        materialize(app, app.now_ms())
    return app, dt


def test_bulk_app_equivalence_and_rate():
    frames = _stream()
    app_s, dt_s = _run(frames, bulk=False)
    app_b, dt_b = _run(frames, bulk=True)

    assert app_s.messages == app_b.messages > 5000
    assert set(app_s.tracker.aircraft) == set(app_b.tracker.aircraft)

    now = 1_000_000 + len(frames) // 4
    ncmp = 0
    for addr, a_s in app_s.tracker.aircraft.items():
        a_b = app_b.tracker.aircraft[addr]
        d_s = aircraft_dict(app_s.tracker, a_s, now)
        d_b = aircraft_dict(app_b.tracker, a_b, now)
        for key in (
            "hex", "flight", "alt_baro", "gs", "track", "baro_rate",
            "squawk", "lat", "lon", "nic", "rc", "seen", "seen_pos",
            "messages", "rssi",
        ):
            assert d_s.get(key) == d_b.get(key), (hex(addr), key, d_s.get(key), d_b.get(key))
        ncmp += 1
    assert ncmp == N_AC

    # ingest speed: the columnar drain must beat the scalar loop hard
    rate_s = len(frames) / dt_s
    rate_b = len(frames) / dt_b
    assert rate_b > 3 * rate_s, (rate_s, rate_b)


def test_bulk_app_wire_bytes_path():
    """Beast WIRE BYTES through the native columnar deframer -> columnar
    drain == the scalar per-frame path, on the same stream."""
    import asyncio

    frames = _stream(20000)
    wire = b"".join(
        beast_io.encode_synthetic_ts(bf.synthetic_ms)
        + beast_io.encode_receiver_id(bf.receiver_id)
        + beast_io.encode_frame(bf.msg, bf.timestamp, bf.signal_level)
        for bf in frames
    )

    app_s, _ = _run(frames, bulk=False)

    app_b = App(parse_args([
        "--net-only", "--quiet", "--lat", "49.5", "--lon", "3.5",
        "--net-bulk-drain",
    ]))
    conn = app_b._beast_input_factory()()
    assert conn.cols_mode

    async def pump():
        i = 0
        while i < len(wire):
            await conn.feed(wire[i : i + 65536])
            i += 65536

    asyncio.run(pump())
    app_b.drain_net_queue()
    from readsb_tpu.app.bulk_drain import materialize

    materialize(app_b, app_b.now_ms())

    assert app_s.messages == app_b.messages > 15000
    assert set(app_s.tracker.aircraft) == set(app_b.tracker.aircraft)
    now = 1_000_000 + len(frames) // 4
    for addr, a_s in app_s.tracker.aircraft.items():
        a_b = app_b.tracker.aircraft[addr]
        d_s = aircraft_dict(app_s.tracker, a_s, now)
        d_b = aircraft_dict(app_b.tracker, a_b, now)
        for key in (
            "alt_baro", "gs", "track", "baro_rate", "squawk", "lat", "lon",
            "nic", "rc", "messages", "rssi", "flight",
        ):
            assert d_s.get(key) == d_b.get(key), (hex(addr), key)


def test_device_arena_app_equivalence():
    """--device-arena: the device SoA arena runs in the live drain and the
    serving output is identical to the host-only columnar path; the
    device CPR decoded real positions along the way (VERDICT r5 #5)."""
    frames = _stream(12000)
    app_h, _ = _run(frames, bulk=True)

    app_a = App(parse_args([
        "--net-only", "--quiet", "--lat", "49.5", "--lon", "3.5",
        "--net-bulk-drain", "--device-arena",
    ]))
    assert app_a.arena is not None
    scorer = app_a._net_scorer()
    for bf in frames:
        app_a._handle_net_frame(scorer, bf)
    app_a.drain_net_queue()
    from readsb_tpu.app.bulk_drain import materialize, materialize_arena

    materialize(app_a, app_a.now_ms())
    materialize_arena(app_a, app_a.now_ms())

    # the arena actually ran on this stream
    import numpy as np

    st = app_a.arena.state
    assert int(np.asarray(st.messages).sum()) > 10000
    assert len(app_a.arena.cpr_decodes) > 1000  # device CPR produced fixes

    # device-arena serving output == host-only serving output
    assert set(app_h.tracker.aircraft) == set(app_a.tracker.aircraft)
    now = 1_000_000 + len(frames) // 4
    for addr, a_h in app_h.tracker.aircraft.items():
        a_a = app_a.tracker.aircraft[addr]
        d_h = aircraft_dict(app_h.tracker, a_h, now)
        d_a = aircraft_dict(app_a.tracker, a_a, now)
        for key in (
            "hex", "flight", "alt_baro", "gs", "track", "baro_rate",
            "squawk", "lat", "lon", "seen", "messages",
        ):
            assert d_h.get(key) == d_a.get(key), (hex(addr), key)

    # the device CPR fixes agree with the served (host-chain) positions
    last_fix = {}
    for addr, ts, ff, lat, lon, _nic, _rc in app_a.arena.cpr_decodes:
        last_fix[addr] = (lat, lon)
    n_match = 0
    for addr, (lat, lon) in last_fix.items():
        a = app_a.tracker.aircraft.get(addr)
        if a is not None and a.lat is not None and a.seen_pos:
            # the tracker's last position is its last *accepted* decode;
            # compare where the device fix is the most recent accepted one
            if a.lat == lat and a.lon == lon:
                n_match += 1
    assert n_match > len(last_fix) * 0.8, (n_match, len(last_fix))
