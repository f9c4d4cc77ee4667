"""Prometheus surface parity: metric names vs generatePromFile.

Parses the reference source (stats.c:733-907) for every emitted
readsb_* family, expands the addrtype / RTT-bucket loops, and asserts
the framework emits each name (modulo a short documented skip list).
"""

import re

import pytest

from readsb_tpu.app.config import parse_args
from readsb_tpu.app.main import App
from readsb_tpu.io.stats import StatsCollector, generate_prom

REF = "/root/reference/stats.c"

ADDRTYPES = [
    "adsb_icao", "adsb_icao_nt", "adsr_icao", "tisb_icao", "adsc", "mlat",
    "other", "mode_s", "adsb_other", "adsr_other", "tisb_trackfile",
    "tisb_other", "mode_ac", "unknown",
]

# genuinely not-applicable in this architecture (documented):
SKIP = {
    # (none currently — keep the list so future descopes are explicit)
}


def _reference_names():
    src = open(REF).read()
    body = src[src.index("struct char_buffer generatePromFile") :]
    body = body[: body.index("\n}\n")]
    names = set()
    for m in re.finditer(r'"(readsb_[a-zA-Z_0-9]*)[ {%]', body):
        n = m.group(1)
        if n.endswith("_"):
            # loop-generated families: addrtype suffixes / rtt buckets
            if n in ("readsb_aircraft_", "readsb_position_count_"):
                for t in ADDRTYPES:
                    names.add(n + t)
            elif n == "readsb_network_packets_rtt_":
                bucketmax, bucketsize = 0.0, StatsCollector.PING_BUCKETBASE
                for _ in range(StatsCollector.PING_BUCKETS):
                    bucketmax += bucketsize
                    bucketmax = round(bucketmax / 10) * 10
                    bucketsize *= StatsCollector.PING_BUCKETMULT
                    names.add(n + str(int(bucketmax)))
            continue
        names.add(n)
    # connector metric is labeled; normalize
    return names


def test_prom_name_parity():
    ref = _reference_names()
    assert len(ref) > 80  # the parse actually found the surface

    app = App(parse_args([
        "--net-only", "--quiet", "--lat", "50.0", "--lon", "4.0",
        "--json-globe-index", "--write-json", "/tmp/_promtest",
    ]))
    # make conditional sections emit: fake a demod + ping traffic + an
    # outbound connector + api server
    class _FakeDemod:
        scan_global = 1000
        stats_modeac = 0

        class stats:
            preambles = 5
            rejected_bad = 1
            rejected_unknown_icao = 1
            accepted = [3, 0, 0]

    app._demod = _FakeDemod()
    app.stats_collector.remote_ping_rtt[0] = 1

    class _FakeCon:
        host, port, connected = "h", 30005, True
        last_connect = 0.0

    app.net.connectors.append(_FakeCon())
    out = generate_prom(app, app.now_ms())
    got = set(
        line.split()[0].split("{")[0]
        for line in out.splitlines()
        if line and not line.startswith("#")
    )

    missing = sorted(n for n in ref if n not in got and n not in SKIP)
    assert not missing, f"missing {len(missing)} families: {missing[:20]}"
