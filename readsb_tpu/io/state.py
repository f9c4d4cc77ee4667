"""Checkpoint / resume: persist the aircraft store across restarts.

The reference writes 256 round-robin zstd "blobs" of raw aircraft structs
(globe_index.c:2656-3081, readsb.c:2545-2568).  Here the store is a
pytree-of-dataclasses, so the checkpoint is N gzip'd JSON blobs sharded by
address (same round-robin continuous-write pattern; orbax-style sharding
of the device arena plugs in at the arena layer).
"""

from __future__ import annotations

import dataclasses
import gzip
import json
import os
from typing import Optional

from ..decode.fields import AddrType, AirGround, HeadingType, Source
from ..track.tracker import Aircraft, CprPair, Tracker, Validity

STATE_BLOBS = 64
STATE_MAGIC = "readsb-tpu-state-v1"


def _validity_to_list(v: Validity) -> list:
    return [v.updated, int(v.source), int(v.last_source)]


def _validity_from_list(x: list) -> Validity:
    return Validity(updated=x[0], source=Source(x[1]), last_source=Source(x[2]))


_SKIP = {"signal_ring", "trace"}  # trace serialized separately (see below)


def _trace_to_dict(tr) -> Optional[dict]:
    """Persist a Trace incl. compressed chunks (globe_index.c:2656-2938
    keeps trace chunks in the state blobs; restart must not lose them)."""
    import base64

    if tr is None or (not tr.points and not tr.chunks):
        return None
    return {
        "points": [dataclasses.asdict(s) for s in tr.points],
        "chunks": [base64.b64encode(c).decode() for c in tr.chunks],
        "chunk_meta": [list(m) for m in tr.chunk_meta],
        "len_total": tr.len_total,
        "next_marker": tr.next_marker,
    }


def _trace_from_dict(d: Optional[dict]):
    import base64

    from ..track.traces import State, Trace

    if not d:
        return None
    tr = Trace()
    tr.points = [State(**p) for p in d["points"]]
    tr.chunks = [base64.b64decode(c) for c in d["chunks"]]
    tr.chunk_meta = [tuple(m) for m in d["chunk_meta"]]
    tr.len_total = d["len_total"]
    tr.next_marker = d.get("next_marker", 0)
    return tr


def _aircraft_to_dict(a: Aircraft) -> dict:
    out = {}
    tr = _trace_to_dict(getattr(a, "trace", None))
    if tr is not None:
        out["__trace"] = tr
    for f in dataclasses.fields(a):
        val = getattr(a, f.name)
        if f.name in _SKIP:
            continue
        if isinstance(val, Validity):
            out[f.name] = _validity_to_list(val)
        elif isinstance(val, CprPair):
            out[f.name] = [
                val.lat, val.lon, int(val.type), _validity_to_list(val.valid),
                val.nic, val.rc,
            ]
        elif isinstance(val, (Source, AddrType, AirGround, HeadingType)):
            out[f.name] = int(val)
        elif isinstance(val, bytes):
            out[f.name] = {"__hex": val.hex()}
        else:
            out[f.name] = val
    return out


def _aircraft_from_dict(d: dict) -> Aircraft:
    a = Aircraft(addr=d["addr"])
    for f in dataclasses.fields(Aircraft):
        if f.name not in d or f.name in _SKIP:
            continue
        val = d[f.name]
        cur = getattr(a, f.name)
        if isinstance(cur, Validity):
            setattr(a, f.name, _validity_from_list(val))
        elif isinstance(cur, CprPair):
            pair = CprPair(
                lat=val[0], lon=val[1], type=val[2],
                valid=_validity_from_list(val[3]),
            )
            if len(val) >= 6:  # nic/rc added round 3
                pair.nic, pair.rc = val[4], val[5]
            setattr(a, f.name, pair)
        elif isinstance(cur, AirGround):
            setattr(a, f.name, AirGround(val))
        elif isinstance(cur, AddrType):
            setattr(a, f.name, AddrType(val))
        elif isinstance(cur, HeadingType):
            setattr(a, f.name, HeadingType(val))
        elif isinstance(val, dict) and "__hex" in val:
            setattr(a, f.name, bytes.fromhex(val["__hex"]))
        else:
            setattr(a, f.name, val)
    tr = _trace_from_dict(d.get("__trace"))
    if tr is not None:
        a.trace = tr
    return a


def save_blob(tracker: Tracker, directory: str, blob: int) -> int:
    """Write one round-robin blob (aircraft with addr % STATE_BLOBS == blob)."""
    os.makedirs(directory, exist_ok=True)
    records = [
        _aircraft_to_dict(a)
        for addr, a in tracker.aircraft.items()
        if addr % STATE_BLOBS == blob
    ]
    doc = {"magic": STATE_MAGIC, "blob": blob, "aircraft": records}
    path = os.path.join(directory, f"blob_{blob:02d}.json.gz")
    tmp = path + ".tmp"
    with gzip.open(tmp, "wt") as f:
        json.dump(doc, f)
    os.rename(tmp, path)
    return len(records)


def save_state(tracker: Tracker, directory: str, now_ms: int) -> int:
    """Full checkpoint (writeInternalState analog)."""
    n = 0
    for blob in range(STATE_BLOBS):
        n += save_blob(tracker, directory, blob)
    # polar range table rides along (writeRangeDirs, globe_index.c:3460)
    tracker.outline.save(os.path.join(directory, "rangeDirs.gz"))
    return n


def load_state(tracker: Tracker, directory: str) -> int:
    """Parallel-loadable startup restore (readInternalState analog)."""
    n = 0
    for blob in range(STATE_BLOBS):
        path = os.path.join(directory, f"blob_{blob:02d}.json.gz")
        if not os.path.exists(path):
            continue
        try:
            with gzip.open(path, "rt") as f:
                doc = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if doc.get("magic") != STATE_MAGIC:
            continue
        for rec in doc.get("aircraft", []):
            a = _aircraft_from_dict(rec)
            tracker.aircraft[a.addr] = a
            n += 1
    rd = os.path.join(directory, "rangeDirs.gz")
    if os.path.exists(rd):
        tracker.outline.load(rd)
    return n
