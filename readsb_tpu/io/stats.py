"""Stats / metrics outputs: stats.json, status.prom, Prometheus file.

Mirrors the reference's metric surface (stats.c:656-907, readsb_* names)
for drop-in Prometheus scraping.
"""

from __future__ import annotations

import json
import os
import tempfile
import time


def collect(app, now_ms: int) -> dict:
    t = app.tracker
    with_pos = sum(1 for a in t.aircraft.values() if a.seen_pos > 0)
    d = {
        "now": now_ms / 1000.0,
        "messages": app.messages,
        "aircraft_total": len(t.aircraft),
        "aircraft_with_pos": with_pos,
        "cpr_global_ok": t.cpr_global_ok,
        "cpr_global_bad": t.cpr_global_bad,
        "cpr_global_skipped": t.cpr_global_skipped,
        "cpr_local_ok": t.cpr_local_ok,
        "cpr_surface": t.cpr_surface,
        "cpr_airborne": t.cpr_airborne,
    }
    if app._demod is not None:
        st = app._demod.stats
        d.update(
            {
                "samples_processed": app._demod.scan_global,
                "demod_preambles": st.preambles,
                "demod_rejected_bad": st.rejected_bad,
                "demod_rejected_unknown_icao": st.rejected_unknown_icao,
                "demod_accepted": list(st.accepted),
            }
        )
    return d


def generate_stats_json(app, now_ms: int) -> dict:
    return collect(app, now_ms)


PROM_TEMPLATE = """\
readsb_aircraft_with_position {with_pos}
readsb_aircraft_total {total}
readsb_messages_valid {messages}
readsb_cpr_global_ok {cpr_global_ok}
readsb_cpr_global_bad {cpr_global_bad}
readsb_cpr_local_ok {cpr_local_ok}
readsb_uptime_seconds {uptime:.1f}
"""


def generate_prom(app, now_ms: int) -> str:
    t = app.tracker
    lines = [
        "# readsb-tpu prometheus metrics",
        f"readsb_aircraft_with_position {sum(1 for a in t.aircraft.values() if a.seen_pos > 0)}",
        f"readsb_aircraft_total {len(t.aircraft)}",
        f"readsb_messages_valid {app.messages}",
        f"readsb_cpr_global_ok {t.cpr_global_ok}",
        f"readsb_cpr_global_bad {t.cpr_global_bad}",
        f"readsb_cpr_local_ok {t.cpr_local_ok}",
        f"readsb_cpr_surface {t.cpr_surface}",
        f"readsb_cpr_airborne {t.cpr_airborne}",
        f"readsb_uptime_seconds {time.time() - app.start_time:.1f}",
    ]
    if app._demod is not None:
        st = app._demod.stats
        lines += [
            f"readsb_demod_preambles {st.preambles}",
            f"readsb_demod_rejected_bad {st.rejected_bad}",
            f"readsb_demod_rejected_unknown_icao {st.rejected_unknown_icao}",
            f"readsb_demod_accepted {sum(st.accepted)}",
            f"readsb_samples_processed {app._demod.scan_global}",
        ]
    return "\n".join(lines) + "\n"


def write_prom(app, path: str, now_ms: int) -> None:
    d = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=d)
    with os.fdopen(fd, "w") as f:
        f.write(generate_prom(app, now_ms))
    os.rename(tmp, path)


def write_stats_json(app, path: str, now_ms: int) -> None:
    d = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=d)
    with os.fdopen(fd, "w") as f:
        json.dump(generate_stats_json(app, now_ms), f)
    os.rename(tmp, path)
