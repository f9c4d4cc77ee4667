"""Interactive aircraft table (interactive.c:121 interactiveShowData).

A curses table refreshed every 250 ms over the live tracker — the
viewadsb display.  Rendering is isolated here so the asyncio app just
schedules refresh() calls; plain-terminal fallback (no curses / no tty)
prints a periodic table to stdout instead.
"""

from __future__ import annotations

import sys
import time

REFRESH_S = 0.25

_HDR = (
    " Hex    Mode  Sqwk  Flight   Alt    Spd  Hdg    Lat      Long   RSSI  Msgs  Ti"
)


def _rows(tracker, now_ms: int, limit: int) -> list[str]:
    out = []
    aircraft = sorted(
        tracker.aircraft.values(), key=lambda a: a.seen, reverse=True
    )[:limit]
    for a in aircraft:
        mode = "S"
        squawk = f"{a.squawk:04x}" if a.squawk is not None else ""
        flight = (a.callsign or "").strip()
        alt = f"{a.baro_alt:6d}" if getattr(a, "baro_alt", None) is not None else "      "
        spd = f"{a.gs:4.0f}" if getattr(a, "gs", None) is not None else "    "
        hdg = f"{a.track:3.0f}" if getattr(a, "track", None) is not None else "   "
        lat = f"{a.lat:8.3f}" if a.lat is not None else "        "
        lon = f"{a.lon:8.3f}" if a.lon is not None else "        "
        rssi = f"{a.rssi_dbfs():5.1f}" if hasattr(a, "rssi_dbfs") else "     "
        ti = max(0, (now_ms - a.seen) // 1000)
        out.append(
            f" {a.addr:06X} {mode:>4} {squawk:>5}  {flight:<8} {alt} {spd} {hdg:>4}"
            f" {lat} {lon} {rssi} {a.messages:5d} {ti:3d}"
        )
    return out


class InteractiveDisplay:
    def __init__(self, tracker):
        self.tracker = tracker
        self._scr = None
        try:
            if sys.stdout.isatty():
                import curses

                self._scr = curses.initscr()
                curses.noecho()
                curses.cbreak()
                self._scr.nodelay(True)
        except Exception:
            self._scr = None
        self._last_plain = 0.0

    def refresh(self, now_ms: int) -> None:
        if self._scr is not None:
            import curses

            h, w = self._scr.getmaxyx()
            self._scr.erase()
            self._scr.addnstr(0, 0, _HDR, w - 1, curses.A_REVERSE)
            for i, line in enumerate(_rows(self.tracker, now_ms, h - 2)):
                self._scr.addnstr(i + 1, 0, line, w - 1)
            self._scr.refresh()
        else:
            # no tty: periodic plain table (1 s cadence)
            if time.time() - self._last_plain < 1.0:
                return
            self._last_plain = time.time()
            print(_HDR, file=sys.stderr)
            for line in _rows(self.tracker, now_ms, 30):
                print(line, file=sys.stderr)

    def close(self) -> None:
        if self._scr is not None:
            import curses

            try:
                curses.nocbreak()
                curses.echo()
                curses.endwin()
            except Exception:
                pass
            self._scr = None
