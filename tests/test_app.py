"""Black-box app tests: CLI replay -> JSON snapshots + network outputs + API."""

import asyncio
import json
import socket
import subprocess
import sys
import time

import pytest

from tests.conftest import REPO, run_reference_raw


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _free_port_block(n):
    """Find a base port where base..base+n-1 are all currently bindable.

    The app auto-listens on sbs_port+1..+4 (app/main.py SBS variants), so the
    SBS port must come with 4 consecutive free neighbours — a lone _free_port()
    can collide with another fixture's listener and error the whole module.
    """
    for _ in range(200):
        base = _free_port()
        socks = []
        try:
            for k in range(n):
                s = socket.socket()
                s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
                s.bind(("127.0.0.1", base + k))
                socks.append(s)
        except OSError:
            continue
        finally:
            for s in socks:
                s.close()
        if len(socks) == n:
            return base
    raise RuntimeError("no free port block found")


@pytest.fixture(scope="module")
def app_run(capture_small, tmp_path_factory):
    """Run the app over the capture with all outputs enabled; collect them."""
    d = tmp_path_factory.mktemp("json")
    sbs = _free_port_block(5)
    ro = api = None
    while ro is None or ro in range(sbs, sbs + 5):
        ro = _free_port()
    while api is None or api in range(sbs, sbs + 5) or api == ro:
        api = _free_port()
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "readsb_tpu.app.main",
            "--device-type", "ifile", "--ifile", capture_small + ".uc8.dat",
            "--iformat", "uc8", "--throttle",
            "--net", "--net-ro-port", str(ro), "--net-sbs-port", str(sbs),
            "--net-api-port", str(api),
            "--write-json", str(d), "--write-json-every", "0.3",
            "--stats",
        ],
        cwd=str(REPO),
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env={**__import__("os").environ, "PYTHONPATH": str(REPO),
             "JAX_PLATFORMS": "cpu"},  # hermetic: no accelerator attach
    )

    # wait for listeners
    deadline = time.time() + 180
    for port in (ro, sbs, api):
        while time.time() < deadline:
            try:
                socket.create_connection(("127.0.0.1", port), timeout=0.5).close()
                break
            except OSError:
                time.sleep(0.2)
        else:
            proc.kill()
            raise RuntimeError(f"port {port} never came up: {proc.stderr.read()}")

    raw_sock = socket.create_connection(("127.0.0.1", ro))
    sbs_sock = socket.create_connection(("127.0.0.1", sbs))
    raw_sock.settimeout(0.5)
    sbs_sock.settimeout(0.5)
    raw_data, sbs_data = b"", b""
    api_resp = {}
    t_end = time.time() + 90
    got_api = False
    while time.time() < t_end and proc.poll() is None:
        for sock, attr in ((raw_sock, "raw"), (sbs_sock, "sbs")):
            try:
                chunk = sock.recv(65536)
                if attr == "raw":
                    raw_data += chunk
                else:
                    sbs_data += chunk
            except socket.timeout:
                pass
            except OSError:
                pass
        if not got_api and raw_data:
            try:
                api_sock = socket.create_connection(("127.0.0.1", api), timeout=1)
                api_sock.sendall(b"GET /?all HTTP/1.1\r\nHost: x\r\n\r\n")
                api_sock.settimeout(2)
                resp = b""
                while True:
                    if b"\r\n\r\n" in resp:
                        head, body = resp.split(b"\r\n\r\n", 1)
                        clen = [h for h in head.split(b"\r\n") if h.lower().startswith(b"content-length")]
                        if clen and len(body) >= int(clen[0].split(b":")[1]):
                            break
                    chunk = api_sock.recv(65536)
                    if not chunk:
                        break
                    resp += chunk
                api_sock.close()
                body = resp.split(b"\r\n\r\n", 1)[1]
                api_resp = json.loads(body)
                # the query snapshot is double-buffered (apiUpdate) and up
                # to one update interval stale; retry until it has content
                got_api = api_resp.get("resultCount", 0) >= 1
            except (OSError, json.JSONDecodeError, IndexError):
                pass
    proc.wait(timeout=120)
    stderr = proc.stderr.read().decode()
    json_files = {p.name: p for p in d.iterdir()}
    return {
        "raw": raw_data, "sbs": sbs_data, "api": api_resp,
        "json_dir": d, "json_files": json_files, "stderr": stderr,
        "returncode": proc.returncode,
    }


def test_app_exit_ok(app_run):
    assert app_run["returncode"] == 0, app_run["stderr"][-2000:]


def test_raw_output_matches_reference(app_run, capture_small, reference_binary):
    ref = run_reference_raw(reference_binary, capture_small + ".uc8.dat", "uc8")
    lines = [l for l in app_run["raw"].decode().split("\n") if l.strip()]
    got = [l.strip().lstrip("*@").rstrip(";") for l in lines]
    # raw_out may use @ts prefix: strip 12-hex timestamp if present
    cleaned = []
    for l, orig in zip(got, lines):
        if orig.startswith("@"):
            cleaned.append(l[12:])
        else:
            cleaned.append(l)
    assert cleaned == ref, (len(cleaned), len(ref))


def test_sbs_output(app_run):
    lines = [l for l in app_run["sbs"].decode().split("\r\n") if l]
    assert len(lines) > 10
    for l in lines:
        assert l.startswith("MSG,")
        assert 18 <= l.count(",") <= 22
    # at least one line with a position
    assert any(l.split(",")[14] for l in lines if len(l.split(",")) > 15)


def test_aircraft_json(app_run):
    f = app_run["json_files"].get("aircraft.json")
    assert f is not None, list(app_run["json_files"])
    doc = json.loads(f.read_text())
    assert "now" in doc and "aircraft" in doc and "messages" in doc
    ac = doc["aircraft"]
    assert len(ac) >= 3
    one = next(a for a in ac if "lat" in a)
    assert set(["hex", "type", "messages", "seen", "rssi"]).issubset(one)
    assert one["lat"] == pytest.approx(47.5, abs=1.5)
    # receiver.json exists too
    assert "receiver.json" in app_run["json_files"]


def test_api_all(app_run):
    doc = app_run["api"]
    assert doc, "api response never received"
    assert "aircraft" in doc and "resultCount" in doc and "ptime" in doc
    assert doc["resultCount"] == len(doc["aircraft"])
    assert doc["resultCount"] >= 1


def test_stats_json_windows(app_run):
    """stats.json follows the reference's windowed contract
    (README-json.md:263+, statsUpdate stats.c:470)."""
    f = app_run["json_files"].get("stats.json")
    assert f is not None, list(app_run["json_files"])
    doc = json.loads(f.read_text())
    for k in ("latest", "last1min", "last5min", "last15min", "total"):
        assert k in doc, doc.keys()
        blk = doc[k]
        assert "start" in blk and "end" in blk
        assert "cpu" in blk and set(blk["cpu"]) == {"demod", "reader", "background", "net", "api"}
        assert "cpr" in blk and "global_ok" in blk["cpr"]
        assert "tracks" in blk and "messages" in blk
    tot = doc["total"]
    assert tot["local"]["samples_processed"] > 0
    assert tot["local"]["modes"] > 0  # preambles
    assert sum(tot["local"]["accepted"]) > 10
    assert tot["messages"] > 10
    assert tot["cpu"]["demod"] > 0
    assert tot["cpr"]["global_ok"] > 0
    assert tot["tracks"]["all"] >= 3
    assert tot["local"]["signal"] < 0  # dBFS, negative


def test_devel_provoke_segfault():
    """--devel=provokeSegfault crashes shortly after start
    (readsb.c:2831-2836) so supervisor restart paths can be exercised."""
    import os
    import subprocess
    import sys
    import time

    proc = subprocess.Popen(
        [sys.executable, "-m", "readsb_tpu.app.main",
         "--net-only", "--quiet", "--devel", "provokeSegfault"],
        cwd=str(REPO), stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env={**os.environ, "PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu"},
    )
    deadline = time.time() + 30
    while time.time() < deadline and proc.poll() is None:
        time.sleep(0.3)
    assert proc.poll() is not None, "app must have crashed"
    assert proc.returncode != 0
