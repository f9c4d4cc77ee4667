"""App-level round-trips for sbs_in, asterix in/out, beast_reduce and
--dump-beast-dir (VERDICT round-2 item 5: the previously dead protocols)."""

import asyncio
import glob

import pytest

from readsb_tpu.app.config import parse_args
from readsb_tpu.app.main import App
from readsb_tpu.io import beast as beast_io


def make_app(extra=()):
    return App(parse_args(["--net-only", "--quiet", *extra]))


def run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


class FakeWriter:
    def __init__(self):
        self.buf = b""

    def write(self, data):
        self.buf += data

    def is_closing(self):
        return False


def test_sbs_in_roundtrip():
    app = make_app()
    conn = app._sbs_input_factory()()
    line = (
        b"MSG,3,1,1,4CA123,1,2024/01/01,12:00:00.000,2024/01/01,12:00:00.000,"
        b"SHT123,37000,450.0,90.0,52.1234,4.5678,-64,7314,0,0,0,0\n"
    )
    run(conn.feed(line))
    app.drain_net_queue()
    a = app.tracker.aircraft.get(0x4CA123)
    assert a is not None
    assert a.callsign == "SHT123"
    assert a.baro_alt == 37000
    assert a.gs == pytest.approx(450.0)
    assert a.lat == pytest.approx(52.1234)
    assert a.lon == pytest.approx(4.5678)


def test_asterix_roundtrip():
    """encode_cat21 -> AsterixIn -> tracker: first ASTERIX coverage."""
    from readsb_tpu.decode.fields import ModesMessage, Source
    from readsb_tpu.io import asterix as asterix_io

    mm = ModesMessage(
        msgtype=17, addr=0x3C6589, source=Source.ADSB, sys_timestamp_ms=1000
    )
    mm.callsign = "DLH123"
    mm.callsign_valid = True
    mm.baro_alt = 35000
    mm.cpr_decoded = True
    mm.sbs_pos_valid = True
    mm.decoded_lat = 50.05
    mm.decoded_lon = 8.57
    pkt = asterix_io.encode_cat21(mm, now_ms=1000)
    assert pkt and pkt[0] == 21

    app = make_app()
    conn = app._asterix_input_factory()()
    run(conn.feed(pkt))
    app.drain_net_queue()
    a = app.tracker.aircraft.get(0x3C6589)
    assert a is not None
    assert (a.callsign or "").strip() == "DLH123"
    assert a.lat == pytest.approx(50.05, abs=1e-3)
    assert a.lon == pytest.approx(8.57, abs=1e-3)


def _feed_positions(app, n, addr=0x400001, t0=10_000, dt_ms=40):
    """Feed n alternating-parity DF17 positions via the beast input."""
    from tools.synth import encode_df17_position

    conn = app._beast_input_factory()()
    for i in range(n):
        msg = encode_df17_position(addr, 51.0 + i * 1e-4, 4.0, 30000, i % 2)
        wire = beast_io.encode_synthetic_ts_prefix(t0 + i * dt_ms) if hasattr(
            beast_io, "encode_synthetic_ts_prefix"
        ) else b""
        from readsb_tpu.io.beastdump import encode_synthetic_ts

        wire = encode_synthetic_ts(t0 + i * dt_ms)
        wire += beast_io.encode_frame(msg, i * 500, 0.2)
        run(conn.feed(wire))
    app.drain_net_queue()


def test_beast_reduce_rate_limit():
    # beast_reduce needs the scalar per-message path; a configured reduce
    # port would auto-disable bulk drain, but this test attaches its
    # client directly, so force it off
    app = make_app(["--no-net-bulk-drain"])
    w = FakeWriter()
    app.out_beast_reduce.clients.add(w)
    _feed_positions(app, 20, dt_ms=40)  # 800 ms of positions at 25 Hz
    app.out_beast_reduce.flush()
    assert app.tracker.aircraft[0x400001].lat is not None
    frames = list(beast_io.BeastDeframer().feed(w.buf))
    # ~800ms span / 125ms reduce interval => a handful, far fewer than 20
    assert 2 <= len(frames) <= 9, len(frames)


def test_dump_beast_dir(tmp_path):
    app = make_app(["--dump-beast-dir", str(tmp_path)])
    _feed_positions(app, 5)
    app.beast_dump.close()
    files = glob.glob(str(tmp_path / "beast-*"))
    assert len(files) == 1
    import zstandard

    raw = zstandard.ZstdDecompressor().decompress(
        open(files[0], "rb").read(), max_output_size=1 << 20
    )
    frames = list(beast_io.BeastDeframer().feed(raw))
    assert len(frames) == 5
    assert frames[0].synthetic_ms == 10_000  # 0xE8 prefix survived the trip


class LaggyWriter(FakeWriter):
    """Transport stub reporting a huge kernel backlog."""

    class _T:
        @staticmethod
        def get_write_buffer_size():
            return 1 << 30

    transport = _T()


def test_slow_client_shed():
    from readsb_tpu.io.net import OutputService

    svc = OutputService("t", flush_bytes=1, shed_after=0.0)
    good, bad = FakeWriter(), LaggyWriter()
    svc.clients.add(good)
    svc.clients.add(bad)
    svc.send(b"x" * 10)
    svc.send(b"y" * 10)  # second flush: bad exceeds shed_after=0 -> dropped
    assert bad not in svc.clients
    assert good in svc.clients
    assert svc.clients_shed == 1


def test_sigterm_writes_state(tmp_path):
    import signal as _signal
    import asyncio as _aio

    app = make_app(["--write-state", str(tmp_path)])

    async def run_and_kill():
        t = _aio.ensure_future(app.amain())
        await _aio.sleep(0.1)
        app._exit_event.set()  # what the SIGTERM handler does
        return await _aio.wait_for(t, 10)

    rc = _aio.new_event_loop().run_until_complete(run_and_kill())
    assert rc == 0
    assert list(tmp_path.iterdir()), "ordered shutdown must write final state"
