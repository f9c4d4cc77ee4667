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

# build a realistic mixed frame set: 200 aircraft, positions + DF11
rng = np.random.default_rng(0)
msgs = []
for i in range(N):
    addr = 0x400000 + (i % 200)
    if i % 5 == 0:
        msgs.append(encode_df11(addr))
    else:
        lat = 50.0 + (addr % 100) * 0.01
        msgs.append(
            encode_df17_position(addr, lat, 4.0 + (i % 7) * 0.01, 30000 + i % 1000, i % 2)
        )

frames = [
    beast_io.BeastFrame(msg=m, timestamp=i * 500, signal_byte=40,
                        msg_type=0, receiver_id=0, synthetic_ms=1_000_000 + i // 100)
    for i, m in enumerate(msgs)
]

app = App(parse_args(["--net-only", "--quiet"]))
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
