"""Native columnar Beast deframer == Python BeastDeframer, fuzz-tested.

Streams mix escaped payloads (0x1A doubling), receiverId / synthetic-ts
prefixes, UUID frames, ping/command tokens, junk bytes, and random chunk
boundaries (frames split mid-escape across feed() calls).
"""

import numpy as np
import pytest

from readsb_tpu.io import beast as beast_io


def _stream(rng, n_frames=500):
    out = b""
    expect = []
    rid = 0
    synth = 0
    for i in range(n_frames):
        k = rng.integers(8)
        if k == 0:
            rid = int(rng.integers(1, 1 << 60))
            out += beast_io.encode_receiver_id(rid)
        elif k == 1:
            synth = int(rng.integers(1, 1 << 45))
            out += beast_io.encode_synthetic_ts(synth)
        elif k == 2:
            out += b"\x1aP" + bytes(rng.integers(0, 256, 3, np.int64).astype(np.uint8))
        elif k == 3:
            out += bytes(rng.integers(0, 256, rng.integers(1, 6), np.int64).astype(np.uint8))
        else:
            mlen = [7, 14, 14][int(rng.integers(3))]
            msg = bytes(rng.integers(0, 256, mlen, np.int64).astype(np.uint8))
            ts = int(rng.integers(0, 1 << 47))
            sig = int(rng.integers(0, 256))
            out += beast_io.encode_frame(msg, ts, signal_level=sig / 255.0)
            expect.append((msg, ts, sig, rid, synth))
    return out, expect


def _chunks(rng, data):
    i = 0
    while i < len(data):
        n = int(rng.integers(1, 700))
        yield data[i : i + n]
        i += n


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_columnar_deframer_matches_python(seed):
    rng = np.random.default_rng(seed)
    data, expect = _stream(rng)

    py = beast_io.BeastDeframer()
    col = beast_io.ColumnarDeframer(cap=64)  # small cap: exercise refeed loop
    py_frames = []
    col_batches = []
    for ch in _chunks(rng, data):
        py_frames.extend(py.feed(ch))
        got = col.feed(ch)
        if got is not None:
            col_batches.append(got)

    cols = {
        k: np.concatenate([b[k] for b in col_batches]) for k in col_batches[0]
    }
    keep = np.isin(cols["mlen"], (7, 14))
    py_frames = [f for f in py_frames if len(f.msg) in (7, 14)]
    assert keep.sum() == len(py_frames)
    j = 0
    for i in np.nonzero(keep)[0]:
        f = py_frames[j]
        assert bytes(cols["msgs"][i][: len(f.msg)]) == f.msg, j
        assert cols["ts"][i] == f.timestamp
        assert cols["sig"][i] == f.signal_byte
        assert cols["rid"][i] == np.uint64(f.receiver_id)
        assert cols["synth"][i] == f.synthetic_ms
        j += 1
    assert col.receiver_id == py.receiver_id
    assert col.synthetic_ms == py.synthetic_ms
    assert col.frames_bad == py.frames_bad
    assert col.commands == py.commands
    assert len(py_frames) > 100


def test_columnar_deframer_native_present():
    col = beast_io.ColumnarDeframer()
    assert col._native is not None, "native deframer must build in this image"
