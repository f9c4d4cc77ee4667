"""Columnar accept_columns == serial Scorer.decode_accept, fuzz-tested.

Streams mix clean/corrupted DF11/17/18, residual-addressed DF4/5/20/21
(some BEFORE their teaching DF17 — the within-batch ICAO-learning order
must match the serial path message for message), damaged-DF bytes, and
junk frames.
"""

import numpy as np
import pytest

from readsb_tpu.decode.netaccept import accept_columns
from readsb_tpu.decode.score import Scorer
from readsb_tpu.ops import crc as crc_ops
from tools.synth import (
    encode_df4,
    encode_df5,
    encode_df11,
    encode_df17_position,
    encode_df17_velocity,
)


def _mkstream(rng, n=600):
    msgs = []
    addrs = [0x4C0000 + i for i in range(12)]
    for i in range(n):
        a = addrs[rng.integers(len(addrs))]
        kind = rng.integers(7)
        if kind == 0:
            m = encode_df11(a)
        elif kind == 1:
            m = encode_df17_position(a, 40 + (i % 50) * 0.1, 5.0, 30000, i & 1)
        elif kind == 2:
            m = encode_df17_velocity(a, 300, 45, 640)
        elif kind == 3:
            m = encode_df4(a, 25000)
        elif kind == 4:
            m = encode_df5(a, 0x2000 + (i % 8) * 0x100)
        elif kind == 5:
            # corrupted: flip 1 or 2 random bits of a DF17
            m = bytearray(encode_df17_position(a, 42.0, 6.0, 20000, i & 1))
            for _ in range(int(rng.integers(1, 3))):
                b = int(rng.integers(0, 112))
                m[b >> 3] ^= 1 << (7 - (b & 7))
            m = bytes(m)
        else:
            m = bytes(rng.integers(0, 256, 14, dtype=np.int64).astype(np.uint8))
        msgs.append(m)
    return msgs


@pytest.mark.parametrize("nfix,fix_df", [(1, True), (2, True), (0, False)])
def test_accept_columns_matches_serial(nfix, fix_df):
    rng = np.random.default_rng(1234 + nfix)
    msgs = _mkstream(rng)
    n = len(msgs)
    arr = np.zeros((n, 14), np.uint8)
    for i, m in enumerate(msgs):
        arr[i, : len(m)] = np.frombuffer(m, np.uint8)
    syn112 = crc_ops.checksum_batch(arr, 112).astype(np.int64)
    syn56 = crc_ops.checksum_batch(np.ascontiguousarray(arr[:, :7]), 56).astype(np.int64)

    # serial oracle (its icao filter mutates in stream order)
    s_serial = Scorer(nfix=nfix, fix_df=fix_df)
    serial = []
    for i in range(n):
        res, info = s_serial.decode_accept(arr[i], int(syn112[i]), int(syn56[i]))
        serial.append((res, info))

    # columnar path, chunked like a drain loop
    s_col = Scorer(nfix=nfix, fix_df=fix_df)
    out_res = np.zeros(n, np.int8)
    out = {}
    chunk = 97
    cols_all = []
    for a in range(0, n, chunk):
        cols = accept_columns(s_col, arr[a : a + chunk], syn112[a : a + chunk], syn56[a : a + chunk])
        for ad in cols["learned"]:
            s_col.icao.add(int(ad))
        out_res[a : a + chunk] = cols["result"]
        cols_all.append(cols)

    n_acc = 0
    for i in range(n):
        res, info = serial[i]
        assert out_res[i] == res, (i, res, out_res[i])
        if res == 0:
            n_acc += 1
            c = cols_all[i // chunk]
            j = i % chunk
            assert c["addr"][j] == info["addr"], i
            assert c["corrected"][j] == info["correctedbits"], i
            assert c["iid"][j] == info["iid"], i
            assert c["msgbits"][j] == info["msgbits"], i
            got = bytes(c["msgs"][j][: info["msgbits"] // 8])
            assert got == bytes(info["msg"]), i
    # the stream must exercise the interesting cases
    assert n_acc > 100
    assert (out_res == -1).sum() > 0 and (out_res == -2).sum() > 0
    if nfix:
        corr = [
            info["correctedbits"]
            for res, info in serial
            if res == 0 and info is not None
        ]
        assert max(corr) >= 1  # corrections actually happened
    # filter end states agree
    assert s_col.icao.cur == s_serial.icao.cur
