"""Serving-tick benchmark at aggregator scale (VERDICT r5 #6).

The reference's upkeep/json/globeBin threads regenerate the serving
surfaces on a ~1 s cadence (readsb.c:228 cadence; json writers
readsb.c:532-717, api.c:859).  This measures one full serving tick for a
50k-aircraft fleet with live positions and traces:

  aircraft.json   generate + gzip write (json_out.c:1321 analog)
  binCraft        full-fleet zstd record file (json_out.c:1017)
  globe binCraft  per-tile files (json_out.c:1106; 1/8 of tiles per tick
                  in the reference — we time ALL tiles and report /8)
  traces          budgeted trace writer sweep (writeTraces analog)
  API snapshot    double-buffer rebuild (apiUpdate, api.c:859)

Run: python tools/bench_serving.py [n_aircraft]
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from readsb_tpu.decode.fields import Source  # noqa: E402
from readsb_tpu.io import history as history_io  # noqa: E402
from readsb_tpu.io.bincraft import write_bincraft_zst  # noqa: E402
from readsb_tpu.io.json_out import generate_aircraft_json, write_json_atomic  # noqa: E402
from readsb_tpu.track import globe as globe_mod  # noqa: E402
from readsb_tpu.track.tracker import Aircraft, Tracker, Validity  # noqa: E402
from readsb_tpu.track.traces import Trace  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
NOW = 10_000_000


def build_fleet(tr: Tracker, n: int) -> None:
    rng = np.random.default_rng(7)
    lat = rng.uniform(-60, 70, n)
    lon = rng.uniform(-180, 180, n)
    alt = rng.integers(1000, 43000, n)
    gs = rng.uniform(80, 520, n)
    trk = rng.uniform(0, 360, n)
    for i in range(n):
        a = Aircraft(addr=0x400000 + i)
        a.seen = NOW - int(rng.integers(0, 5000))
        a.messages = 50 + i % 997
        a.lat, a.lon = float(lat[i]), float(lon[i])
        a.seen_pos = a.seen
        a.pos_nic, a.pos_rc = 8, 186.0
        a.pos_reliable_odd = a.pos_reliable_even = 4.0
        a.baro_alt = int(alt[i])
        a.gs = float(gs[i])
        a.track = float(trk[i])
        a.callsign = f"BNC{i % 10000:04d}"
        a.squawk = 0x1000 + (i % 0o7777)
        for v in ("baro_alt_valid", "gs_valid", "track_valid",
                  "position_valid", "callsign_valid", "squawk_valid"):
            setattr(a, v, Validity(updated=a.seen, source=Source.ADSB,
                                   last_source=Source.ADSB))
        a.globe_index = globe_mod.globe_index(a.lat, a.lon)
        # every 5th aircraft carries a live trace (recent points)
        if i % 5 == 0:
            t = Trace()
            for k in range(30):
                t.add(a, a.seen - (30 - k) * 4000,
                      json_trace_interval=1000)
            t.dirty = True
            a.trace = t
        tr.aircraft[a.addr] = a


def main() -> None:
    tr = Tracker(keep_traces=True)
    t0 = time.perf_counter()
    build_fleet(tr, N)
    print(f"fleet: {N} aircraft (+{N//5} traces) in "
          f"{time.perf_counter()-t0:.1f}s")
    out = tempfile.mkdtemp(prefix="serving_")

    t0 = time.perf_counter()
    doc = generate_aircraft_json(tr, NOW)
    write_json_atomic(doc, os.path.join(out, "aircraft.json"), gzip_level=1)
    t_json = time.perf_counter() - t0

    t0 = time.perf_counter()
    write_bincraft_zst(tr, os.path.join(out, "aircraft.binCraft.zst"), NOW)
    t_bin = time.perf_counter() - t0

    t0 = time.perf_counter()
    ntiles = history_io.write_globe_bincraft(tr, out, NOW)
    t_globe = time.perf_counter() - t0

    t0 = time.perf_counter()
    ntr, _cursor = history_io.write_traces(tr, out, NOW, time_budget_s=None)
    t_traces = time.perf_counter() - t0

    from readsb_tpu.io.api import ApiSnapshot

    t0 = time.perf_counter()
    snap = ApiSnapshot(tr, NOW)
    t_api = time.perf_counter() - t0
    assert snap.n_pos > 0

    # the reference writes 1/8 of globe tiles and a budgeted slice of
    # traces per tick; scale those for the per-tick figure
    tick = t_json + t_bin + t_globe / 8 + t_traces / 8 + t_api
    print(f"aircraft.json:  {t_json*1e3:7.0f} ms ({len(doc['aircraft'])} rows)")
    print(f"binCraft full:  {t_bin*1e3:7.0f} ms")
    print(f"globe binCraft: {t_globe*1e3:7.0f} ms ALL {ntiles} tiles "
          f"(/8 per tick: {t_globe/8*1e3:.0f} ms)")
    print(f"traces:         {t_traces*1e3:7.0f} ms ALL {ntr} dirty "
          f"(/8 per tick: {t_traces/8*1e3:.0f} ms)")
    print(f"api snapshot:   {t_api*1e3:7.0f} ms")
    print(f"SERVING_TICK {{'n': {N}, 'tick_ms': {tick*1e3:.0f}, "
          f"'budget_ms': 1000}}")


if __name__ == "__main__":
    main()
