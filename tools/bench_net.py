"""Aggregator ingest throughput: beast frames -> decode -> track (msgs/s).

The reference decodes network frames on a threadpool (net_io.c:5365-5474)
at roughly 0.5-1M msgs/s/core in C; here the CRC stage is one vectorized
numpy batch per drain and the accept/track stage is host python.

Run: python tools/bench_net.py [n_msgs]
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")

from readsb_tpu.app.config import parse_args
from readsb_tpu.app.main import App
from readsb_tpu.io import beast as beast_io
from readsb_tpu.ops import crc as crc_ops
from tools.synth import encode_df17_position, encode_df11

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

# realistic aggregator frame mix: 5000 aircraft, alternating odd/even
# moving positions + DF11 (so the full CPR chain runs)
N_AC = 5000
rng = np.random.default_rng(0)
msgs = []
for i in range(N):
    ac = i % N_AC
    addr = 0x400000 + ac
    seq = i // N_AC  # per-aircraft message counter
    if seq % 5 == 4:
        msgs.append(encode_df11(addr))
    else:
        lat = 45.0 + (ac % 70) * 0.1 + seq * 0.0002
        lon = -5.0 + (ac // 70) * 0.1
        msgs.append(
            encode_df17_position(addr, lat, lon, 30000 + ac % 1000, seq % 2)
        )

# multi-feeder: 50 feeders, one per aircraft stripe (exercises the
# receiver-quality DB + CPR duplicate cache on the measured path)
N_FEED = 50
frames = [
    beast_io.BeastFrame(msg=m, timestamp=i * 500, signal_byte=40,
                        msg_type=0,
                        receiver_id=0x1000_0000 + (i % N_AC) % N_FEED,
                        synthetic_ms=1_000_000 + i // 100)
    for i, m in enumerate(msgs)
]

app = App(parse_args(["--net-only", "--quiet", "--no-net-bulk-drain"]))
scorer = app._net_scorer()

t0 = time.perf_counter()
for bf in frames:
    app._handle_net_frame(scorer, bf)
app.drain_net_queue()
dt = time.perf_counter() - t0
print(
    f"net ingest: {N} msgs in {dt*1e3:.0f} ms -> {N/dt/1e3:.0f}k msgs/s "
    f"({len(app.tracker.aircraft)} aircraft, {app.messages} tracked)"
)


# ---------------------------------------------------------------------------
# Columnar path (BulkTracker): the production aggregator rate
# ---------------------------------------------------------------------------

def bench_bulk(n=N):
    from readsb_tpu.decode.batch import decode_columns
    from readsb_tpu.track.bulk import BulkTracker

    msgs_np = np.zeros((len(msgs), 14), np.uint8)
    for i, m in enumerate(msgs):
        msgs_np[i, : len(m)] = np.frombuffer(m, np.uint8)
    ts = (1_000_000 + np.arange(len(msgs)) // 100).astype(np.int64)
    addrs = np.array([0x400000 + (i % 5000) for i in range(len(msgs))], np.int64)
    rids = (0x1000_0000 + (addrs - 0x400000) % N_FEED).astype(np.uint64)

    # aggregator mode: no receiver location; feeder extent boxes, CPR
    # duplicate cache and receiverPositionReceived all active (v3 scope)
    bulk = BulkTracker(None, None)
    chunk = 8192  # one drain batch
    t0 = time.perf_counter()
    for a in range(0, len(msgs), chunk):
        cols = decode_columns(msgs_np[a : a + chunk], ts[a : a + chunk], addrs[a : a + chunk])
        cols["receiver_id"] = rids[a : a + chunk]
        cols["remote"] = True
        bulk.update_batch(cols)
    dt = time.perf_counter() - t0
    rate = len(msgs) / dt
    print(
        f"bulk ingest: {len(msgs)} msgs in {dt*1e3:.0f} ms -> {rate/1e3:.0f}k msgs/s "
        f"({bulk.n_slots} aircraft, global_ok={bulk.cpr_global_ok})"
    )
    return rate


rate_bulk = bench_bulk()

import json, os
art = {
    "scalar_msgs_per_s": round(N / dt),
    "bulk_msgs_per_s": round(rate_bulk),
    "n_msgs": N,
    "note": "aggregator ingest, multi-feeder (50 receiverIds), receiver DB + CPR dup cache active; scalar = per-message Python path, bulk = columnar BulkTracker aggregator mode",
}
with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_NET.json"), "w") as f:
    json.dump(art, f, indent=1)
print("artifact: BENCH_NET.json", art)


# ---------------------------------------------------------------------------
# App-level bulk path (--net-bulk-drain): beast WIRE BYTES -> native
# columnar deframer -> columnar accept/decode/track -> aircraft.json
# ---------------------------------------------------------------------------

def bench_bulk_app():
    import asyncio

    from readsb_tpu.app.bulk_drain import materialize
    from readsb_tpu.io.json_out import aircraft_dict

    # wire stream with synthetic timestamps + per-frame feeder switches
    # (0xE3 receiverId prefixes), like an aggregator's multiplexed ingest
    parts = []
    rid_cache = {
        r: beast_io.encode_receiver_id(0x1000_0000 + r) for r in range(N_FEED)
    }
    for i, m in enumerate(msgs):
        if i % 100 == 0:
            parts.append(beast_io.encode_synthetic_ts(1_000_000 + i // 100))
        parts.append(rid_cache[(i % N_AC) % N_FEED])
        parts.append(beast_io.encode_frame(m, i * 500, 0.04))
    wire = b"".join(parts)

    # aggregator deployment: no receiver location, bulk drain on by default
    app2 = App(parse_args(["--net-only", "--quiet"]))
    assert app2.bulk is not None, "bulk drain should be on by default"
    conn = app2._beast_input_factory()()

    async def pump():
        i = 0
        while i < len(wire):
            await conn.feed(wire[i : i + (1 << 20)])
            i += 1 << 20

    t0 = time.perf_counter()
    asyncio.run(pump())
    app2.drain_net_queue()
    materialize(app2, app2.now_ms())
    now = app2.now_ms()
    snapshot = [
        aircraft_dict(app2.tracker, a, now)
        for a in app2.tracker.aircraft.values()
    ]
    dt = time.perf_counter() - t0
    rate = app2.messages / dt
    n_pos = sum(1 for d in snapshot if "lat" in d)
    print(
        f"bulk APP e2e (wire bytes -> aircraft.json): {app2.messages} msgs in "
        f"{dt*1e3:.0f} ms -> {rate/1e3:.0f}k msgs/s "
        f"({len(snapshot)} aircraft, {n_pos} with positions)"
    )
    return rate


rate_app = bench_bulk_app()
art["bulk_app_msgs_per_s"] = round(rate_app)
art["note"] += "; bulk_app = wire bytes -> native columnar deframer -> columnar accept/decode/track -> aircraft.json snapshot (--net-bulk-drain)"
with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_NET.json"), "w") as f:
    json.dump(art, f, indent=1)
print("artifact updated: BENCH_NET.json", art)
