"""Columnar network drain: the production aggregator ingest path.

The reference's decodePool (net_io.c:5365-5474) is its production path:
N threads decode frames under staged decode/track/output locks.  Here one
drain batch flows through numpy columns end to end:

  frames -> checksum_batch -> accept_columns (decode/netaccept.py)
         -> decode_columns (decode/batch.py) -> BulkTracker.update_batch

Messages whose shape the columnar decoder does not cover (Comm-B, target
state, opstatus, ...) additionally pass through the scalar
decode_frame -> Tracker.update for their exotic fields; `materialize`
then syncs the authoritative columnar state into the dict Aircraft
objects each tick so every serving surface (aircraft.json, binCraft,
API, traces, outline) keeps reading the same store it always did.

Field ownership: the columns own seen/messages and the covered field
groups (position chain, baro alt, gs, track, rates, squawk, callsign,
airground); sync overwrites a dict field only when the column timestamp
is newer, so scalar-path sources (e.g. TIS-B via DF18 CF variants) are
never clobbered by stale column state.
"""

from __future__ import annotations

import time

import numpy as np

from ..decode.fields import AirGround, Source, decode_frame
from ..decode.netaccept import accept_columns
from ..decode.score import RawFrame
from ..ops import crc as crc_ops
from ..track.tracker import Validity


def make_bulk(app):
    from ..track.bulk import BulkTracker

    if app.args.lat is None or app.args.lon is None:
        raise SystemExit("--net-bulk-drain requires --lat/--lon")
    return BulkTracker(
        app.args.lat, app.args.lon,
        max_range_km=app.args.max_range * 1.852,
        json_reliable=app.tracker.json_reliable,
    )


def drain_bulk(app, q: list) -> None:
    """Columnar replacement for App.drain_net_queue's per-message loop."""
    from ..io import beast as beast_io
    from ..io import raw as raw_io

    t0 = time.perf_counter()
    m = len(q)
    msgs = np.zeros((m, 14), dtype=np.uint8)
    ts = np.zeros(m, np.int64)
    rts = np.zeros(m, np.int64)
    rids = np.zeros(m, np.uint64)
    sig = np.zeros(m)
    now_default = app.now_ms()
    for i, bf in enumerate(q):
        b = bf.msg[:14]
        msgs[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        ts[i] = bf.synthetic_ms or now_default
        rts[i] = bf.timestamp
        rids[i] = bf.receiver_id
        sig[i] = bf.signal_level

    syn112 = crc_ops.checksum_batch(msgs, 112)
    syn56 = crc_ops.checksum_batch(np.ascontiguousarray(msgs[:, :7]), 56)
    scorer = app._net_scorer()
    acc = accept_columns(scorer, msgs, syn112, syn56)
    res = acc["result"]

    # receiver quarantine (net_io.c:3943-3961), checked once per feeder
    ok = res == 0
    garbage = np.zeros(m, bool)
    for rid in np.unique(rids[ok]):
        if rid and app.tracker.receivers.check_bad(int(rid), int(now_default)):
            garbage |= rids == rid
    ok &= ~garbage
    rows = np.nonzero(ok)[0]
    app.messages += len(rows)
    app.remote_modes += len(rows)

    fixed = acc["msgs"]
    if app.out_garbage.clients:
        for i in np.nonzero(garbage & (res == 0))[0]:
            nb = int(acc["msgbits"][i]) // 8
            app.out_garbage.send(
                beast_io.encode_frame(bytes(fixed[i][:nb]), int(rts[i]), float(sig[i]))
            )

    # per-message wire forwarding straight from bytes (only when clients
    # are attached; SBS/json-position lanes need decoded fields and are
    # served by the scalar path — documented bulk-mode scope)
    if app.out_raw.clients or app.out_beast.clients:
        verbatim = app.args.net_verbatim
        for i in rows:
            nb = int(acc["msgbits"][i]) // 8
            mb = bytes(fixed[i][:nb])
            if app.out_raw.clients and (acc["corrected"][i] < 2 or verbatim):
                app.out_raw.send(raw_io.encode_line(mb, int(rts[i]) or None))
            if app.out_beast.clients:
                app.out_beast.send(
                    beast_io.encode_frame(mb, int(rts[i]), float(sig[i]))
                )

    # columnar decode + track for ALL accepted rows (uncovered rows still
    # update seen/messages through the column store)
    from ..decode.batch import decode_columns

    cols = decode_columns(
        fixed[rows], ts[rows], acc["addr"][rows], acc["corrected"][rows]
    )
    app.bulk.update_batch(cols)

    # exotic-shape rows take the scalar field decoder for their extra
    # fields; covered fields they also set are reconciled by materialize
    sc_rows = rows[~cols["covered"]]
    for i in sc_rows:
        nb = int(acc["msgbits"][i]) // 8
        frame = RawFrame(
            msg=bytes(fixed[i][:nb]), msgbits=int(acc["msgbits"][i]),
            timestamp=int(rts[i]), score=0, phase=0,
            correctedbits=int(acc["corrected"][i]), addr=int(acc["addr"][i]),
            signal_power=float(sig[i]), iid=int(acc["iid"][i]),
        )
        mm = decode_frame(frame, epoch_ms=0)
        mm.sys_timestamp_ms = int(ts[i])
        mm.remote = True
        mm.receiver_id = int(rids[i])
        app.tracker.update(mm)

    for ad in acc["learned"]:
        scorer.icao.add(int(ad))
    app.stats_collector.cpu["net"] += (time.perf_counter() - t0) * 1e3


_GROUPS = (
    # (column prefix, aircraft value attr, aircraft validity attr)
    ("gs", "gs", "gs_valid"),
    ("track", "track", "track_valid"),
    ("baro_rate", "baro_rate", "baro_rate_valid"),
    ("geom_rate", "geom_rate", "geom_rate_valid"),
)


def materialize(app, now: int) -> None:
    """Sync the columnar store into the dict Aircraft views (per tick)."""
    bulk = app.bulk
    tr = app.tracker
    c = bulk.cols
    n = bulk.n_slots
    last = getattr(app, "_bulk_sync_ts", -1)
    active = np.nonzero(c.seen[:n] > last)[0]
    if len(active) == 0:
        return
    app._bulk_sync_ts = int(c.seen[:n].max())

    for i in active:
        i = int(i)
        addr = int(c.addr[i])
        a = tr.get_or_create(addr, int(c.seen[i]))
        a.seen = int(c.seen[i])
        a.messages = int(c.messages[i])

        for pref, vattr, valattr in _GROUPS:
            src = int(getattr(c, pref + "_src")[i])
            tsv = int(getattr(c, pref + "_ts")[i])
            v: Validity = getattr(a, valattr)
            if src != int(Source.INVALID) and tsv > v.updated:
                setattr(a, vattr, _pyval(getattr(c, pref)[i]))
                v.updated = tsv
                v.source = Source(src)
                v.last_source = Source(src)
        # altitude (+ outlier score), squawk (+ tentative), callsign, airground
        if int(c.alt_src[i]) != int(Source.INVALID) and int(c.alt_ts[i]) > a.baro_alt_valid.updated:
            a.baro_alt = int(c.alt[i])
            a.alt_reliable = int(c.alt_reliable[i])
            _setv(a.baro_alt_valid, int(c.alt_ts[i]), int(c.alt_src[i]))
        if int(c.squawk_src[i]) != int(Source.INVALID) and int(c.squawk_ts[i]) > a.squawk_valid.updated:
            a.squawk = int(c.squawk[i]) if c.squawk[i] >= 0 else None
            a.squawk_tentative = (
                int(c.squawk_tent[i]) if c.squawk_tent[i] >= 0 else None
            )
            _setv(a.squawk_valid, int(c.squawk_ts[i]), int(c.squawk_src[i]))
        if int(c.cs_src[i]) != int(Source.INVALID) and int(c.cs_ts[i]) > a.callsign_valid.updated:
            a.callsign = bytes(c.cs[i]).decode("latin1").rstrip("\x00").rstrip()
            _setv(a.callsign_valid, int(c.cs_ts[i]), int(c.cs_src[i]))
        if int(c.ag_src[i]) != int(Source.INVALID) and int(c.ag_ts[i]) > a.airground_valid.updated:
            a.airground = AirGround(int(c.ag[i]))
            _setv(a.airground_valid, int(c.ag_ts[i]), int(c.ag_src[i]))

        # position chain (+ serving-layer side effects the scalar setter did)
        if int(c.pv_src[i]) != int(Source.INVALID) and int(c.pv_ts[i]) > a.position_valid.updated:
            prev_seen_pos = a.seen_pos
            a.prev_lat, a.prev_lon = a.lat or 0.0, a.lon or 0.0
            a.prev_pos_time = a.seen_pos
            a.lat = float(c.lat[i])
            a.lon = float(c.lon[i])
            a.seen_pos = int(c.seen_pos[i])
            a.pos_surface = bool(c.pos_surface[i])
            a.pos_nic = int(c.pos_nic[i])
            a.pos_rc = float(c.pos_rc[i])
            a.gs_last_pos = float(c.gs_last_pos[i])
            a.pos_reliable_odd = float(c.rel_odd[i])
            a.pos_reliable_even = float(c.rel_even[i])
            v = a.position_valid
            v.updated = int(c.pv_ts[i])
            v.source = Source(int(c.pv_src[i]))
            v.last_source = Source(int(c.pv_last[i])) if int(c.pv_last[i]) >= 0 else v.source
            from ..track import globe as globe_mod
            from ..track.tracker import TRACK_STALE, bearing, greatcircle

            a.globe_index = globe_mod.globe_index(a.lat, a.lon)
            if tr.receiver_lat is not None:
                dist = greatcircle(tr.receiver_lat, tr.receiver_lon, a.lat, a.lon)
                tr.outline.update(
                    a.seen_pos, dist,
                    bearing(tr.receiver_lat, tr.receiver_lon, a.lat, a.lon),
                    a.lat, a.lon,
                    a.baro_alt if a.baro_alt is not None else (a.geom_alt or 0),
                    reliable=a.pos_reliable_odd >= 2 and a.pos_reliable_even >= 2,
                    json_reliable=tr.json_reliable,
                )
                tr.distance_max = max(tr.distance_max, dist)
                tr.distance_min = min(tr.distance_min, dist)
            if tr.keep_traces:
                if a.trace is None:
                    from ..track.traces import Trace

                    a.trace = Trace()
                stale = bool(prev_seen_pos) and a.seen_pos > prev_seen_pos + 2 * TRACK_STALE
                a.trace.add(a, a.seen_pos, stale=stale,
                            json_trace_interval=tr.json_trace_interval)


def _setv(v: Validity, ts: int, src: int) -> None:
    v.updated = ts
    v.source = Source(src)
    v.last_source = Source(src)


def _pyval(x):
    return x.item() if hasattr(x, "item") else x
