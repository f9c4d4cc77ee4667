"""/re-api query endpoint: HTTP/1.1-subset server over the aircraft store.

Query grammar mirrors the reference (README-json.md:122-202, parseFetch
api.c:1081-1357): ?circle=lat,lon,radius_nmi  ?closest=lat,lon,radius
?box=latS,latN,lonW,lonE  ?all  ?all_with_pos  ?find_hex=h1,h2  ?find_callsign=
?find_reg=  ?find_type=  with &filter_squawk / &above_alt_baro /
&below_alt_baro / &filter_with_pos / &filter_callsign_prefix / &jv2 modifiers,
and ?status health check.  Responses carry now / resultCount / ptime; circle
queries add per-aircraft dst (nmi) and dir.

The reference double-buffers a lat-sorted snapshot (apiUpdate api.c:859);
here queries run over the live dict store — the snapshot/arena path comes
with the device arena.
"""

from __future__ import annotations

import asyncio
import json
import time
from typing import Optional
from urllib.parse import parse_qsl, unquote, urlsplit

from ..track.tracker import TRACK_EXPIRE, bearing, greatcircle
from .json_out import aircraft_dict


class ApiServer:
    def __init__(self, app):
        self.app = app
        self.server: Optional[asyncio.AbstractServer] = None

    async def listen(self, port: int, host: str = "0.0.0.0") -> None:
        self.server = await asyncio.start_server(self.handle, host, port)

    async def handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        try:
            while True:
                line = await reader.readline()
                if not line:
                    return
                parts = line.decode("latin1").split()
                if len(parts) < 2:
                    return
                target = parts[1]
                # drain headers
                while True:
                    h = await reader.readline()
                    if not h or h in (b"\r\n", b"\n"):
                        break
                body, status = self.respond(target)
                head = (
                    f"HTTP/1.1 {status}\r\nContent-Type: application/json\r\n"
                    f"Content-Length: {len(body)}\r\nConnection: keep-alive\r\n\r\n"
                )
                writer.write(head.encode() + body)
                await writer.drain()
        except (ConnectionError, asyncio.IncompleteReadError):
            pass
        finally:
            try:
                writer.close()
            except Exception:
                pass

    # ------------------------------------------------------------------

    def respond(self, target: str) -> tuple[bytes, str]:
        t0 = time.perf_counter()
        now = self.app.now_ms()
        split = urlsplit(target)
        qs = split.query or (split.path.lstrip("/?") if "=" in split.path or split.path.strip("/?") in ("all", "all_with_pos", "status") else "")
        q = dict(parse_qsl(qs, keep_blank_values=True))
        # bare tokens like "?all" arrive as keys with empty values
        tracker = self.app.tracker

        if "status" in q:
            return b'{"status": "ok"}', "200 OK"

        matches = None
        is_circle = False
        circle_ref = None

        def with_pos():
            return [a for a in tracker.aircraft.values() if a.seen_pos and tracker.pos_reliable(a)]

        def active():
            return [a for a in tracker.aircraft.values() if now < a.seen + TRACK_EXPIRE]

        try:
            if "all" in q:
                matches = active()
            elif "all_with_pos" in q:
                matches = with_pos()
            elif "box" in q:
                lat_s, lat_n, lon_w, lon_e = map(float, q["box"].split(","))
                matches = [
                    a for a in with_pos()
                    if lat_s <= a.lat <= lat_n and lon_w <= a.lon <= lon_e
                ]
            elif "circle" in q or "closest" in q:
                key = "circle" if "circle" in q else "closest"
                lat, lon, radius = map(float, q[key].split(","))
                radius_m = radius * 1852.0
                is_circle = True
                circle_ref = (lat, lon)
                cand = [
                    (a, greatcircle(lat, lon, a.lat, a.lon)) for a in with_pos()
                ]
                cand = [(a, d) for a, d in cand if d <= radius_m]
                cand.sort(key=lambda x: x[1])
                if key == "closest":
                    cand = cand[:1]
                matches = [a for a, d in cand]
                dists = {a.addr: d for a, d in cand}
            elif "find_hex" in q or "hexlist" in q:
                hexes = (q.get("find_hex") or q.get("hexlist")).split(",")[:1000]
                want = set()
                for h in hexes:
                    try:
                        want.add(int(h.strip().lstrip("~"), 16))
                    except ValueError:
                        pass
                matches = [a for a in tracker.aircraft.values() if (a.addr & 0xFFFFFF) in want]
            elif "find_callsign" in q:
                want = {c.strip().upper() for c in q["find_callsign"].split(",")}
                matches = [a for a in active() if a.callsign.strip().upper() in want]
            elif "find_reg" in q:
                want = {c.strip().upper() for c in q["find_reg"].split(",")}
                matches = [a for a in active() if a.registration.upper() in want]
            elif "find_type" in q:
                want = {c.strip().upper() for c in q["find_type"].split(",")}
                matches = [a for a in active() if a.type_code.upper() in want]
            else:
                return b'{"error": "query not understood"}', "400 Bad Request"
        except (ValueError, KeyError):
            return b'{"error": "bad query"}', "400 Bad Request"

        # modifiers
        if "filter_squawk" in q and q["filter_squawk"]:
            try:
                sq = int(q["filter_squawk"], 16)
                matches = [a for a in matches if a.squawk == sq]
            except ValueError:
                pass
        if "filter_with_pos" in q:
            matches = [a for a in matches if a.seen_pos and tracker.pos_reliable(a)]
        if "filter_callsign_prefix" in q and q["filter_callsign_prefix"]:
            pref = q["filter_callsign_prefix"].upper()
            matches = [a for a in matches if a.callsign.upper().startswith(pref)]
        if "filter_callsign_exact" in q and q["filter_callsign_exact"]:
            want = q["filter_callsign_exact"].strip().upper()
            matches = [a for a in matches if a.callsign.strip().upper() == want]
        if "above_alt_baro" in q and q["above_alt_baro"]:
            try:
                alt = int(q["above_alt_baro"])
                matches = [a for a in matches if isinstance(a.baro_alt, int) and a.baro_alt >= alt]
            except ValueError:
                pass
        if "below_alt_baro" in q and q["below_alt_baro"]:
            try:
                alt = int(q["below_alt_baro"])
                matches = [a for a in matches if isinstance(a.baro_alt, int) and a.baro_alt <= alt]
            except ValueError:
                pass
        if "filter_mil" in q:
            matches = [a for a in matches if a.db_flags & 1]

        objs = []
        for a in matches:
            o = aircraft_dict(tracker, a, now)
            if is_circle:
                d = greatcircle(circle_ref[0], circle_ref[1], a.lat, a.lon)
                o["dst"] = round(d / 1852.0, 3)
                o["dir"] = round(bearing(circle_ref[0], circle_ref[1], a.lat, a.lon), 1)
            objs.append(o)

        ptime = (time.perf_counter() - t0) * 1000.0
        jv2 = "jv2" in q
        if jv2:
            doc = {
                "ac": objs, "msg": "No error", "now": now, "total": len(objs),
                "ctime": now, "ptime": round(ptime),
            }
        else:
            doc = {
                "now": round(now / 1000.0, 3),
                "aircraft": objs,
                "resultCount": len(objs),
                "ptime": round(ptime, 3),
            }
        return json.dumps(doc).encode(), "200 OK"
