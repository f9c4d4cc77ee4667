"""checkapi.sh-style black-box API test: ~25 query shapes against a live
instance (reference: checkapi.sh + api.c:435-938).

Queries run over the double-buffered snapshot (io/api.py ApiSnapshot);
counts are cross-checked between query shapes and against aircraft.json.
"""

import os
import json
import socket
import subprocess
import sys
import time

import pytest

from tests.conftest import REPO


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture(scope="module")
def api_app(tmp_path_factory):
    from tools.synth import build_standard_capture

    d = tmp_path_factory.mktemp("apicap")
    cap = build_standard_capture(duration_s=4.0, n_aircraft=5, seed=21)
    path = str(d / "cap.uc8.dat")
    cap.write_uc8(path)
    jdir = tmp_path_factory.mktemp("apijson")
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, "-m", "readsb_tpu.app.main",
         "--device-type", "ifile", "--ifile", path, "--iformat", "uc8",
         "--throttle", "--quiet", "--net", "--net-api-port", str(port),
         "--write-json", str(jdir), "--write-json-every", "0.3",
         "--lat", "47.5", "--lon", "8.5"],
        cwd=str(REPO), stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    # wait for listener + some tracked aircraft (cpu cold-start compiles
    # can take ~40 s before the first sample block demodulates)
    deadline = time.time() + 180
    while time.time() < deadline:
        try:
            body, _ = _get(port, "/?all_with_pos")
            if json.loads(body)["resultCount"] >= 3:
                break
            time.sleep(0.2)
        except OSError:
            time.sleep(0.2)
    yield {"port": port, "jdir": jdir}
    proc.kill()
    proc.wait()


def _get(port, path):
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    s.sendall(f"GET {path} HTTP/1.1\r\nHost: x\r\n\r\n".encode())
    buf = b""
    s.settimeout(5)
    while b"\r\n\r\n" not in buf:
        buf += s.recv(65536)
    head, rest = buf.split(b"\r\n\r\n", 1)
    clen = next(
        int(l.split(b":")[1]) for l in head.split(b"\r\n") if b"content-length" in l.lower()
    )
    while len(rest) < clen:
        rest += s.recv(65536)
    s.close()
    ctype = next(
        (l.split(b":")[1].strip().decode() for l in head.split(b"\r\n")
         if b"content-type" in l.lower()), "")
    return rest[:clen], ctype


def _count(port, path):
    body, _ = _get(port, path)
    d = json.loads(body)
    return d.get("resultCount", d.get("total")), d


def test_api_query_battery(api_app):
    port = api_app["port"]

    n_all, d_all = _count(port, "/?all")
    n_pos, d_pos = _count(port, "/?all_with_pos")
    assert n_all >= n_pos >= 3

    # box queries
    n_box, d_box = _count(port, "/?box=40,55,0,20")
    assert n_box == n_pos  # the synthetic fleet lives in this box
    n_empty, _ = _count(port, "/?box=-10,-5,100,110")
    assert n_empty == 0

    # circle / closest with dst/dir ordering
    n_circ, d_circ = _count(port, "/?circle=47.5,8.5,500")
    assert n_circ == n_pos
    dsts = [a["dst"] for a in d_circ["aircraft"]]
    assert dsts == sorted(dsts)
    assert all("dir" in a for a in d_circ["aircraft"])
    n_close, d_close = _count(port, "/?closest=47.5,8.5,500")
    assert n_close == 1
    assert d_close["aircraft"][0]["dst"] == dsts[0]
    n_circ0, _ = _count(port, "/?circle=0,0,10")
    assert n_circ0 == 0

    # find_hex / hexlist
    hexes = [a["hex"] for a in d_all["aircraft"]]
    n_one, d_one = _count(port, f"/?find_hex={hexes[0]}")
    assert n_one == 1 and d_one["aircraft"][0]["hex"] == hexes[0]
    n_multi, _ = _count(port, "/?find_hex=" + ",".join(hexes[:3]) + ",baddef")
    assert n_multi == 3
    n_alias, _ = _count(port, f"/?hexlist={hexes[0]},{hexes[1]}")
    assert n_alias == 2

    # find_callsign (synthetic callsigns start with SYN)
    css = [a.get("flight", "").strip() for a in d_all["aircraft"] if a.get("flight")]
    if css:
        n_cs, _ = _count(port, f"/?find_callsign={css[0]}")
        assert n_cs >= 1
        n_pref, _ = _count(port, f"/?all&filter_callsign_prefix={css[0][:3]}")
        assert n_pref >= n_cs
    n_reg, _ = _count(port, "/?find_reg=NOPE123")
    assert n_reg == 0
    n_typ, _ = _count(port, "/?find_type=A320")
    assert n_typ == 0

    # filters
    n_fp, _ = _count(port, "/?all&filter_with_pos")
    assert n_fp == n_pos
    n_above, _ = _count(port, "/?all&above_alt_baro=0")
    n_below, _ = _count(port, "/?all&below_alt_baro=100000")
    assert n_above + n_below >= n_pos  # every positioned aircraft has alt
    n_hi, _ = _count(port, "/?all&above_alt_baro=99999")
    assert n_hi == 0
    n_mil, _ = _count(port, "/?all&filter_mil")
    assert n_mil == 0  # synthetic fleet has no dbFlags
    n_sq, _ = _count(port, "/?all&filter_squawk=7700")
    assert n_sq >= 0

    # jv2 format
    _, d_jv2 = _count(port, "/?all&jv2")
    assert "ac" in d_jv2 and d_jv2["msg"] == "No error"

    # status + bad query
    body, _ = _get(port, "/?status")
    assert json.loads(body)["status"] == "ok"
    body, _ = _get(port, "/?nonsense=1")
    assert b"error" in body


def test_api_bincraft_responses(api_app):
    import struct

    import zstandard

    port = api_app["port"]
    n_pos, _ = _count(port, "/?all_with_pos")
    body, ctype = _get(port, "/?all_with_pos&binCraft")
    assert ctype == "application/octet-stream"
    now, elem, count_pos, _idx = struct.unpack_from("<qIII", body, 0)
    assert elem > 0 and len(body) % elem == 0
    assert len(body) // elem == n_pos + 1  # header + one element per aircraft
    assert count_pos == n_pos

    zbody, zctype = _get(port, "/?all_with_pos&binCraft&zstd")
    assert zctype == "application/zstd"
    raw = zstandard.ZstdDecompressor().decompress(zbody, max_output_size=1 << 24)
    assert len(raw) % elem == 0 and len(raw) // elem == n_pos + 1


def test_api_snapshot_consistent_with_aircraft_json(api_app):
    port = api_app["port"]
    f = api_app["jdir"] / "aircraft.json"
    doc = json.loads(f.read_text())
    json_hexes = {a["hex"] for a in doc["aircraft"]}
    _, d_all = _count(port, "/?all")
    api_hexes = {a["hex"] for a in d_all["aircraft"]}
    assert json_hexes & api_hexes  # same population visible both ways


def test_api_latency_budget(api_app):
    """checkapi.sh tracks time_total per query; budget each shape here."""
    port = api_app["port"]
    shapes = [
        "/?all", "/?all_with_pos", "/?box=40,55,0,20",
        "/?circle=47.5,8.5,500", "/?closest=47.5,8.5,500",
        "/?all&filter_with_pos", "/?all&jv2", "/?status",
    ]
    for shape in shapes:
        t0 = time.perf_counter()
        _get(port, shape)
        dt = time.perf_counter() - t0
        # generous for CI noise; the reference budget is ~10 ms/query on
        # a warm snapshot — queries must never rebuild it synchronously
        assert dt < 0.25, (shape, dt)


def test_api_request_size_limit(api_app):
    port = api_app["port"]
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    s.sendall(b"GET /?find_hex=" + b"a" * 20000 + b" HTTP/1.1\r\n\r\n")
    resp = s.recv(4096)
    assert b"413" in resp
    s.close()


def test_api_unix_socket(tmp_path_factory):
    """--net-api-port with a path listens on a unix socket (api.c:1967)."""
    import asyncio

    from readsb_tpu.app.config import parse_args
    from readsb_tpu.app.main import App
    from readsb_tpu.io.api import ApiServer

    sock_path = str(tmp_path_factory.mktemp("apisock") / "api.sock")
    app = App(parse_args(["--net-only", "--quiet", "--lat", "47.0", "--lon", "8.0"]))

    async def go():
        srv = ApiServer(app)
        await srv.listen_unix(sock_path)
        app.api_server = srv
        reader, writer = await asyncio.open_unix_connection(sock_path)
        writer.write(b"GET /?status HTTP/1.1\r\n\r\n")
        await writer.drain()
        head = await reader.readuntil(b"\r\n\r\n")
        assert b"200 OK" in head
        clen = int(
            [l for l in head.split(b"\r\n") if l.lower().startswith(b"content-length")][0]
            .split(b":")[1]
        )
        body = await reader.readexactly(clen)
        assert json.loads(body)["status"] == "ok"
        writer.close()
        srv.server.close()

    asyncio.run(go())


def test_aircraft_json_from_api_snapshot():
    """aircraft.json byte-joined from the API buffer's prebuilt fragments
    (apiGenerateAircraftJson analog) parses to the same objects the
    fragments encode."""
    import json as _json

    from readsb_tpu.io.api import ApiSnapshot
    from readsb_tpu.io.json_out import aircraft_json_bytes_from_api

    tr, now = _tracker_fixture() if "_tracker_fixture" in globals() else (None, None)
    if tr is None:
        # build a small fleet inline
        from readsb_tpu.decode.fields import Source
        from readsb_tpu.track.tracker import Aircraft, Tracker, Validity

        tr = Tracker()
        now = 5_000_000
        for i in range(25):
            a = Aircraft(addr=0x600000 + i)
            a.seen = now - 100 * i
            a.messages = 10 + i
            a.baro_alt = 10_000 + 100 * i
            a.baro_alt_valid = Validity(updated=a.seen, source=Source.ADSB,
                                        last_source=Source.ADSB)
            a.callsign = f"API{i:03d}"
            a.callsign_valid = Validity(updated=a.seen, source=Source.ADSB,
                                        last_source=Source.ADSB)
            tr.aircraft[a.addr] = a

    snap = ApiSnapshot(tr, now)
    data = aircraft_json_bytes_from_api(snap, messages=1234)
    doc = _json.loads(data)
    assert doc["messages"] == 1234
    assert doc["now"] == round(now / 1000.0, 1)
    assert len(doc["aircraft"]) == len(snap.frag) == 25
    hexes = {d["hex"] for d in doc["aircraft"]}
    assert f"{0x600000:06x}" in hexes
    flights = {d.get("flight", "").strip() for d in doc["aircraft"]}
    assert "API000" in flights
