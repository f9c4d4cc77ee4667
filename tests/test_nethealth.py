"""Net-engine health plumbing: ping/RTT shedding, heartbeats, PROXY v1,
Beast commands, clients.json, state trigger files
(net_io.c:1264-1465, 1794, 5020, 3750; readsb.c:2412-2485)."""

import json
import os
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


@pytest.fixture()
def app(tmp_path):
    """--net-only app with ingest health checks and fast ping interval."""
    bi, ro = _free_port(), _free_port()
    jdir = tmp_path / "json"
    jdir.mkdir()
    env = {**os.environ, "READSB_PING_INTERVAL": "0.2", "JAX_PLATFORMS": "cpu"}
    proc = subprocess.Popen(
        [sys.executable, "-m", "readsb_tpu.app.main", "--net-only", "--quiet",
         "--net", "--net-bi-port", str(bi), "--net-ro-port", str(ro),
         "--net-ingest", "--ping-reject", "50",
         "--net-heartbeat", "0.5",
         "--write-json", str(jdir), "--write-json-every", "0.3"],
        cwd=str(REPO), stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, env=env,
    )
    deadline = time.time() + 30
    for port in (bi, ro):
        while time.time() < deadline:
            try:
                socket.create_connection(("127.0.0.1", port), timeout=0.5).close()
                break
            except OSError:
                time.sleep(0.2)
    yield {"bi": bi, "ro": ro, "jdir": jdir, "proc": proc}
    proc.terminate()
    proc.wait()


DF17 = bytes.fromhex("8d4840d6202cc371c32ce0576098")


def _beast_frame(msg: bytes) -> bytes:
    body = (b"\x00" * 6 + b"\x28" + msg).replace(b"\x1a", b"\x1a\x1a")
    t = b"3" if len(msg) == 14 else b"2"
    return b"\x1a" + t + body


def test_ping_shed_slow_feeder(app):
    """A feeder answering pings ~200 ms late gets shed (reject=50 ms)."""
    s = socket.create_connection(("127.0.0.1", app["bi"]), timeout=5)
    s.settimeout(10)
    # opt into high-res pings ('W' 'O', net_io.c:4897) + one real frame
    s.sendall(b"\x1aWO" + _beast_frame(DF17))
    start = time.time()
    shed = False
    while time.time() - start < 15:
        try:
            data = s.recv(4096)
        except socket.timeout:
            break
        if not data:
            shed = True
            break
        i = data.find(b"\x1aP")
        if i >= 0:
            # echo the pong LATE and with a value 200 ms in the past
            raw = data[i + 2 : i + 8].replace(b"\x1a\x1a", b"\x1a")[:3]
            if len(raw) == 3:
                v = (int.from_bytes(raw, "big") - 200) & 0xFFFFFF
                pong = bytes([v >> 16, (v >> 8) & 0xFF, v & 0xFF]).replace(b"\x1a", b"\x1a\x1a")
                s.sendall(b"\x1aP" + pong)
    s.close()
    assert shed, "slow feeder was not disconnected"


def test_ping_keep_fast_feeder(app):
    """A feeder echoing pongs immediately stays connected."""
    s = socket.create_connection(("127.0.0.1", app["bi"]), timeout=5)
    s.settimeout(0.5)
    s.sendall(b"\x1aWO" + _beast_frame(DF17))
    start = time.time()
    while time.time() - start < 3:
        try:
            data = s.recv(4096)
        except socket.timeout:
            continue
        assert data, "fast feeder was disconnected"
        i = data.find(b"\x1aP")
        if i >= 0:
            s.sendall(data[i : i + 8])  # echo verbatim
    s.close()


def test_heartbeat_on_idle_output(app):
    s = socket.create_connection(("127.0.0.1", app["ro"]), timeout=5)
    s.settimeout(5)
    buf = b""
    start = time.time()
    while time.time() - start < 4 and b"*0000;\n" not in buf:
        try:
            buf += s.recv(4096)
        except socket.timeout:
            break
    s.close()
    assert b"*0000;\n" in buf, buf


def test_proxy_v1_header(app):
    s = socket.create_connection(("127.0.0.1", app["bi"]), timeout=5)
    s.sendall(b"PROXY TCP4 192.0.2.1 192.0.2.2 1234 5678\r\n" + _beast_frame(DF17))
    time.sleep(1.0)
    s.close()
    # the frame after the PROXY header must have been decoded
    deadline = time.time() + 5
    while time.time() < deadline:
        f = app["jdir"] / "aircraft.json"
        if f.exists():
            doc = json.loads(f.read_text())
            if any(a["hex"] == "4840d6" for a in doc.get("aircraft", [])):
                return
        time.sleep(0.2)
    raise AssertionError("frame behind PROXY header not decoded")


def test_clients_json_and_beast_commands(app):
    s = socket.create_connection(("127.0.0.1", app["ro"]), timeout=5)
    s.sendall(b"\x1a1J")  # enable Mode A/C lane (handleBeastCommand)
    time.sleep(1.0)
    f = app["jdir"] / "clients.json"
    assert f.exists()
    doc = json.loads(f.read_text())
    assert any(c["service"] == "raw_out" for c in doc["clients"])
    s.close()


def test_get_state_trigger(app):
    gdir = app["jdir"] / "getState"
    gdir.mkdir()
    (gdir / "writeState").write_text("")
    deadline = time.time() + 10
    while time.time() < deadline:
        if not (gdir / "writeState").exists():
            break
        time.sleep(0.2)
    assert not (gdir / "writeState").exists(), "trigger not consumed"
    blobs = [p for p in gdir.iterdir() if p.name.startswith("blob")]
    assert blobs, list(gdir.iterdir())


def test_client_pong_reply(tmp_path):
    """As an outbound feeder (net-connector beast_in), the app echoes an
    upstream's 0x1a 'P' ping back as a pong (net_io.c:1316-1320)."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "-m", "readsb_tpu.app.main", "--net-only", "--quiet",
         "--net", "--net-connector", f"127.0.0.1,{port},beast_in"],
        cwd=str(REPO), stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    try:
        srv.settimeout(30)
        conn, _ = srv.accept()
        conn.settimeout(10)
        conn.sendall(b"\x1aP\x01\x02\x03")
        buf = b""
        deadline = time.time() + 10
        while time.time() < deadline and b"\x1aP\x01\x02\x03" not in buf:
            try:
                buf += conn.recv(4096)
            except socket.timeout:
                break
        assert b"\x1aP\x01\x02\x03" in buf, buf
        conn.close()
    finally:
        srv.close()
        proc.terminate()
        proc.wait()
