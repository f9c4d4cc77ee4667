"""Checkpoint at reference design scale: 1M aircraft save/load timing.

The reference's design point is 1M+ aircraft (2^20 hash buckets,
readsb.h:310-313) checkpointed as 256 zstd blobs loaded by parallel
threads (globe_index.c:3565-3761).  This measures our v2 blob format at
that scale; the number is recorded in BASELINE.md.  Run:

    python tools/state_scale_1m.py [N]
"""

import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")
from readsb_tpu.decode.fields import Source  # noqa: E402
from readsb_tpu.io import state as state_io  # noqa: E402
from readsb_tpu.track.tracker import Aircraft, Tracker, Validity  # noqa: E402
from readsb_tpu.track.traces import State, Trace  # noqa: E402


def build_fleet(tracker: Tracker, n: int, traces_every: int = 20) -> None:
    rng = np.random.default_rng(5)
    lat = rng.uniform(-60, 70, n)
    lon = rng.uniform(-180, 180, n)
    alt = rng.integers(0, 45000, n)
    for i in range(n):
        addr = 0x100000 + i
        a = Aircraft(addr=addr)
        a.seen = 1_000_000 + i
        a.messages = int(alt[i]) % 997
        a.lat, a.lon = float(lat[i]), float(lon[i])
        a.seen_pos = a.seen
        a.baro_alt = int(alt[i])
        a.baro_alt_valid = Validity(updated=a.seen, source=Source.ADSB,
                                    last_source=Source.ADSB)
        a.callsign = f"TST{i % 1000:03d}"
        if i % traces_every == 0:
            tr = Trace()
            tr.points = [
                State(timestamp=a.seen - 1000 * k, lat=a.lat, lon=a.lon,
                      baro_alt=a.baro_alt)
                for k in range(8)
            ]
            a.trace = tr
        tracker.aircraft[addr] = a


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    tr = Tracker()
    t0 = time.perf_counter()
    build_fleet(tr, n)
    print(f"fleet build: {time.perf_counter() - t0:.1f}s ({n} aircraft)")

    d = tempfile.mkdtemp(prefix="state1m_") + "/state"
    t0 = time.perf_counter()
    saved = state_io.save_state(tr, d, now_ms=2_000_000)
    dt_save = time.perf_counter() - t0
    import os

    size = sum(
        os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
    )
    print(f"save: {dt_save:.2f}s  ({saved} aircraft, {size / 1e6:.0f} MB, "
          f"{saved / dt_save / 1e3:.0f}k aircraft/s)")

    del tr
    tr2 = Tracker()
    t0 = time.perf_counter()
    loaded = state_io.load_state(tr2, d)
    dt_load = time.perf_counter() - t0
    print(f"load: {dt_load:.2f}s  ({loaded} aircraft, "
          f"{loaded / dt_load / 1e3:.0f}k aircraft/s)")
    assert loaded == n

    # spot round-trip
    a = tr2.aircraft[0x100000 + n - 1]
    assert a.callsign.startswith("TST")
    print("roundtrip spot-check ok")


if __name__ == "__main__":
    main()
