"""Behavior of the round-3 CLI additions: beast-reduce output shaping,
--gnss SBS altitudes, --stats-range polar ranges, --onlyaddr display."""

import types

from readsb_tpu.decode.fields import decode_frame
from readsb_tpu.pipeline import demodulate_file
from readsb_tpu.track.tracker import Tracker


def _replay(capture, **tracker_kw):
    frames, _ = demodulate_file(capture + ".uc8.dat", fmt="uc8")
    tracker = Tracker(**tracker_kw)
    forwards = 0
    for f in frames:
        mm = decode_frame(f)
        tracker.update(mm)
        forwards += bool(mm.reduce_forward)
    return tracker, forwards, len(frames)


def test_reduce_filter_alt(capture_small):
    _, base, n = _replay(capture_small)
    assert 0 < base < n
    tracker2 = Tracker()
    tracker2.reduce_filter_alt_ft = 5000.0  # synthetic fleet flies at 10000+
    frames, _ = demodulate_file(capture_small + ".uc8.dat", fmt="uc8")
    filtered = 0
    for f in frames:
        mm = decode_frame(f)
        tracker2.update(mm)
        filtered += bool(mm.reduce_forward)
    assert filtered < base


def test_reduce_optimize_mlat(capture_small):
    frames, _ = demodulate_file(capture_small + ".uc8.dat", fmt="uc8")
    tracker = Tracker()
    tracker.reduce_optimize_mlat = True
    for f in frames:
        mm = decode_frame(f)
        tracker.update(mm)
        if mm.cpr_valid:
            # track.c:2335-2339: mlat clients need every CPR
            assert mm.reduce_forward


def test_gnss_sbs_altitude(capture_small):
    from readsb_tpu.io import sbs as sbs_io

    frames, _ = demodulate_file(capture_small + ".uc8.dat", fmt="uc8")
    tracker = Tracker()
    plain_alt = gnss_alt = None
    for f in frames:
        mm = decode_frame(f)
        tracker.update(mm)
        if mm.baro_alt is None:
            continue
        plain = sbs_io.encode_line(mm, now_ms=mm.sys_timestamp_ms)
        gnss = sbs_io.encode_line(mm, geom_delta=100,
                                  now_ms=mm.sys_timestamp_ms, use_gnss=True)
        if plain and gnss:
            plain_alt = plain.split(b",")[11]
            gnss_alt = gnss.split(b",")[11]
            break
    assert plain_alt is not None
    assert not plain_alt.endswith(b"H")
    # with --gnss, baro + geom_delta is emitted as an HAE altitude
    assert gnss_alt == b"%dH" % (int(plain_alt) + 100)


def test_stats_range_polar(capture_small):
    from readsb_tpu.io.stats import StatsCollector

    tracker, _, _ = _replay(capture_small, receiver_lat=47.0, receiver_lon=8.0)
    sc = StatsCollector()
    app = types.SimpleNamespace(
        _demod=None, args=types.SimpleNamespace(net=False, net_only=True,
                                                stats_range=True),
        tracker=tracker,
    )
    doc = sc.stats_json(app, 0.0)
    assert "polar_range" in doc
    assert len(doc["polar_range"]) == tracker.outline.distance.shape[1]
    assert max(doc["polar_range"]) > 0  # fleet positions registered range


def test_onlyaddr_cli(tmp_path, capture_small):
    import subprocess
    import sys

    from tests.conftest import REPO

    out = subprocess.run(
        [sys.executable, "-m", "readsb_tpu.app.main", "--device-type", "ifile",
         "--ifile", capture_small + ".uc8.dat", "--iformat", "uc8",
         "--quiet", "--raw", "--onlyaddr"],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    lines = [l.strip() for l in out.stdout.splitlines() if l.strip()]
    assert lines, out.stderr[-2000:]
    assert all(len(l) == 6 and int(l, 16) >= 0 for l in lines)


def test_jaero_timeout_expiry():
    from readsb_tpu.decode.fields import AddrType

    tr = Tracker()
    now = 1_700_000_000_000
    a = tr.get_or_create(0x123456, now)
    a.seen = now
    a.messages = 5
    a.addrtype = AddrType.JAERO
    b = tr.get_or_create(0x654321, now)
    b.seen = now
    b.messages = 5
    # past normal expiry but inside the JAERO window: only b is dropped
    tr.remove_stale(now + 20 * 60_000)
    assert 0x123456 in tr.aircraft and 0x654321 not in tr.aircraft
    tr.remove_stale(now + 40 * 60_000)
    assert 0x123456 not in tr.aircraft


def test_position_persistence_cap(capture_small):
    frames, _ = demodulate_file(capture_small + ".uc8.dat", fmt="uc8")
    tr = Tracker()
    tr.position_persistence = 2.0
    for f in frames:
        tr.update(decode_frame(f))
    caps = [
        max(a.pos_reliable_odd, a.pos_reliable_even)
        for a in tr.aircraft.values() if a.seen_pos
    ]
    assert caps and max(caps) <= 2.0


def test_api_shutdown_draining():
    import asyncio

    from readsb_tpu.io.api import ApiServer

    class _App:
        tracker = Tracker()

        def now_ms(self):
            return 0

    srv = ApiServer(_App())
    srv.draining = True

    async def go():
        r = asyncio.StreamReader()
        r.feed_data(b"GET /?all HTTP/1.1\r\n\r\n")
        r.feed_eof()
        chunks = []

        class _W:
            def write(self, b):
                chunks.append(b)

            async def drain(self):
                pass

            def close(self):
                pass

            async def wait_closed(self):
                pass

            def get_extra_info(self, *_):
                return None

        await srv.handle(r, _W())
        return b"".join(chunks)

    out = asyncio.run(go())
    assert b"503" in out.split(b"\r\n")[0]


def test_net_receiver_id_forwarding():
    """--net-receiver-id: 0xE3 id frame precedes data whenever the lane's
    receiver changes, and is not repeated while it stays the same."""
    from readsb_tpu.app.main import App
    from readsb_tpu.app.config import build_parser
    from readsb_tpu.io import beast as beast_io

    app = App.__new__(App)
    app.args = build_parser().parse_args(["--net-only", "--net-receiver-id"])

    sent = []

    class _Svc:
        def send(self, b):
            sent.append(bytes(b))

    svc = _Svc()
    mm1 = types.SimpleNamespace(receiver_id=0xAABB)
    mm2 = types.SimpleNamespace(receiver_id=0xCCDD)
    app._beast_send(svc, b"payload1", mm1)
    app._beast_send(svc, b"payload2", mm1)
    app._beast_send(svc, b"payload3", mm2)
    assert sent[0] == beast_io.encode_receiver_id(0xAABB)
    assert sent[1:3] == [b"payload1", b"payload2"]
    assert sent[3] == beast_io.encode_receiver_id(0xCCDD)
    assert sent[4] == b"payload3"


def test_snip_matches_scalar_reference():
    """Vectorized --snip equals the reference's per-sample getchar loop
    (readsb.c:1192-1206), including across chunk boundaries."""
    import io

    import numpy as np

    from readsb_tpu.app.main import snip_mode

    rng = np.random.default_rng(5)
    # mostly-quiet stream with loud bursts
    n = 300_000
    iq = rng.integers(120, 135, size=2 * n, dtype=np.int64)
    loud_at = rng.integers(0, 2 * n, size=200)
    iq[loud_at] = 250
    data = iq.astype(np.uint8).tobytes()

    def scalar(level):
        out = bytearray()
        c = 0
        for k in range(0, len(data) - 1, 2):
            i, q = data[k], data[k + 1]
            if abs(i - 127) < level and abs(q - 127) < level:
                c += 1
                if c > 32:
                    continue
            else:
                c = 0
            out += bytes((i, q))
        return bytes(out)

    for level in (5, 25):
        fout = io.BytesIO()
        snip_mode(level, fin=io.BytesIO(data), fout=fout)
        assert fout.getvalue() == scalar(level), level

    # chunk-boundary carry: tiny reads force runs to straddle chunks
    class Dribble(io.BytesIO):
        def read(self, _n=-1):
            return super().read(4096)

    fout = io.BytesIO()
    snip_mode(25, fin=Dribble(data), fout=fout)
    assert fout.getvalue() == scalar(25)


def test_sdr_ppm_estimator():
    """timingStatistics analog (readsb.c:754-806): sample clock vs wall."""
    import time as _t

    from readsb_tpu.app.config import parse_args
    from readsb_tpu.app.main import App

    app = App(parse_args(["--net-only", "--quiet"]))

    class _D:
        scan_global = 0

    d = _D()
    app._note_timing(d)  # arms the state
    # pretend 31 s elapsed and the sample clock ran 100 ppm fast
    now_us = _t.monotonic_ns() // 1000
    app._ppm_state = [now_us - 31_000_000, 0]
    d.scan_global = int(31_000_000 * 12 * 1.0001 / 5)
    app._note_timing(d)
    assert abs(app.estimated_ppm - 100.0) < 5.0
