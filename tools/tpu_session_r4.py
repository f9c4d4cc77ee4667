"""Round-4 TPU measurement session: extract-v2 + fused classify ablation.

One process, one relay claim, carry-chained timing (round-3 methodology,
see tools/tpu_session.py).  Experiment order puts the riskiest compiles
last so early results survive a backend failure.

Run detached: nohup python tools/tpu_session_r4.py > /tmp/r4session.log 2>&1 &
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from readsb_tpu.constants import BLOCK_SAMPLES, TRAILING_SAMPLES
from readsb_tpu.ops import demod as demod_ops
from readsb_tpu.ops import pallas_kernels as pk
from readsb_tpu.ops.demod import _compact_two_level
from readsb_tpu.ops.gate import TBL_SENTINEL
from readsb_tpu import pipeline as pl_mod

N_CHAN = 64
SEG_VALID = BLOCK_SAMPLES  # one block per channel
STRIDE = SEG_VALID + 512
SCAN_MULTI = N_CHAN * STRIDE
TOTAL = N_CHAN * SEG_VALID  # 8.39 M samples per dispatch
K = 2048 * N_CHAN
T0 = time.time()


def mark(s):
    print(f"+{time.time()-T0:5.0f}s {s}", flush=True)


# --- workload: the bench capture (realistic candidate density) -------------
from bench import build_workload  # import-safe: bench.run() is __main__-guarded

raw, total = build_workload(N_CHAN)
assert total == TOTAL
words_np = np.frombuffer(raw.tobytes(), dtype="<u2").reshape(N_CHAN, SEG_VALID)
words = jnp.asarray(words_np)
thr = jnp.int32(58)
_tbl = jnp.full(2048, TBL_SENTINEL, jnp.int32)
_ = float(jnp.sum(jnp.zeros(4)))
mark("attached")

RTT_S = [0.0]


def timeit(name, chain_fn, reps=10, sub_rtt=True, samples=TOTAL):
    try:
        c = chain_fn(jnp.int32(0))
        int(c)
    except Exception as e:
        mark(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:300]}")
        return None
    best = float("inf")
    for _ in range(3):
        c = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(reps):
            c = chain_fn(c)
        int(c)
        best = min(best, (time.perf_counter() - t0) / reps)
    net = best - (RTT_S[0] if sub_rtt else 0.0)
    mark(f"{name:36s} {net*1e3:9.3f} ms {samples/max(net,1e-9)/1e6:9.0f} MS/s")
    return net


@jax.jit
def chain_null(c):
    return c + 1


n = timeit("null chain (per-rep ovh)", chain_null, reps=50, sub_rtt=False)
RTT_S[0] = max(0.0, n or 0.0)
mark(f"(subtracting {RTT_S[0]*1e3:.3f} ms/rep)")


# ---------------------------------------------------------------------------
# 1. production fused multi-raw program (the bench headline path), v2 kernel
# ---------------------------------------------------------------------------
def multi_chain(l, k2, keep_l, n_blocks=1):
    seg_valid = BLOCK_SAMPLES * n_blocks
    stride = seg_valid + 512
    scan_len = N_CHAN * stride
    kk = 2048 * N_CHAN * n_blocks
    if n_blocks == 1:
        w = words
    else:
        w = jnp.asarray(
            np.tile(words_np, (1, n_blocks))[:, : seg_valid]
        )

    @jax.jit
    def run(c):
        ovs = jnp.full((N_CHAN, TRAILING_SAMPLES), 0x8080, jnp.uint16) + c.astype(jnp.uint16)
        gc = pl_mod._demod_and_gate_multi_raw(
            w, ovs, jnp.int32(seg_valid), thr, _tbl,
            k=kk, scan_len=scan_len, l=l, k2=k2,
            nfix=1, fix_df=True, reset_every=BLOCK_SAMPLES,
            seg_stride=stride, seg_valid=seg_valid, keep_l=keep_l,
        )
        return gc.n_cand + gc.n_keep + gc.offsets[5] + gc.syn112[7, 1]

    return run


res = {}
res["full_l64"] = timeit("FULL multi-raw v2 (l=64)", multi_chain(64, 4096, 64))
res["full_l32"] = timeit("FULL multi-raw v2 (l=32)", multi_chain(32, 4096, 64))
res["full_l16"] = timeit("FULL multi-raw v2 (l=16)", multi_chain(16, 4096, 64))


# ---------------------------------------------------------------------------
# 2. stage ablation on the same multichannel layout (raw fused path)
# ---------------------------------------------------------------------------
def make_buf(c):
    gap = STRIDE - SEG_VALID - TRAILING_SAMPLES
    ovs = jnp.full((N_CHAN, TRAILING_SAMPLES), 0x8080, jnp.uint16) + c.astype(jnp.uint16)
    seg = jnp.concatenate(
        [ovs, words, jnp.zeros((N_CHAN, gap), words.dtype)], axis=1
    )
    return jnp.pad(seg.reshape(-1), (0, 512))


def dense_only(c):
    buf = make_buf(c)
    tile = pk.DENSE_ROWS * pk.LANES
    padded = ((buf.shape[0] + 512 + tile - 1) // tile) * tile
    bufp = jnp.pad(buf, (0, padded - buf.shape[0]))
    return pk.dense_scan_uc8_pallas(bufp, thr)


@jax.jit
def chain_dense(c):
    corr, pw, ch, cl = dense_only(c)
    return corr[999].astype(jnp.int32) + pw[0, 777] + ch[123] - cl[45]


def compact_chain(l):
    @jax.jit
    def run(c):
        corr, pw, ch, cl = dense_only(c)
        cand = (corr[:SCAN_MULTI] & 8) != 0
        pos = jnp.arange(SCAN_MULTI, dtype=jnp.int32)
        cand = cand & ((pos % STRIDE) < SEG_VALID)
        offsets, max_local = _compact_two_level(cand, K, l, SCAN_MULTI)
        return offsets[77] + max_local + ch[123]
    return run


def extract_chain(which):
    @jax.jit
    def run(c):
        corr, pw, ch, cl = dense_only(c)
        cand = (corr[:SCAN_MULTI] & 8) != 0
        pos = jnp.arange(SCAN_MULTI, dtype=jnp.int32)
        cand = cand & ((pos % STRIDE) < SEG_VALID)
        offsets, max_local = _compact_two_level(cand, K, 64, SCAN_MULTI)
        win, nv = demod_ops.win_rows(corr, pw, SCAN_MULTI)
        rows = win[jnp.clip(offsets >> 8, 0, nv - 1)]
        if which == "v1":
            comb = pk.extract_syndromes_pallas(rows, offsets)
        else:
            comb = pk.extract_classify_pallas(rows, offsets, _tbl)
        return comb[33, 0] + comb[55, 9] + offsets[11] + max_local
    return run


res["dense"] = timeit("dense scan (fused uc8)", chain_dense)
res["compact64"] = timeit("+compaction l=64", compact_chain(64))
res["compact16"] = timeit("+compaction l=16", compact_chain(16))
res["extract_v1"] = timeit("+win/gather/extract v1", extract_chain("v1"))
res["extract_v2"] = timeit("+win/gather/extract v2+classify", extract_chain("v2"))

# ---------------------------------------------------------------------------
# 4. TPU end-to-end parity vs the CPU golden (validates v2 on real Mosaic)
# ---------------------------------------------------------------------------
try:
    import hashlib

    from readsb_tpu.pipeline import MultiDemodulator

    golden = json.load(open("/tmp/golden_multi.json"))
    multi = MultiDemodulator(N_CHAN, blocks_per_batch=1, use_native=False)
    chunks = [
        bytes(raw[c * BLOCK_SAMPLES * 2 : (c + 1) * BLOCK_SAMPLES * 2])
        for c in range(N_CHAN)
    ]
    frames = multi.feed(chunks)
    sig = []
    for c, fl in enumerate(frames):
        for f in fl:
            sig.append((c, f.scan_offset, f.msg.hex()))
    sig.sort()
    h = hashlib.sha256(json.dumps(sig).encode()).hexdigest()
    st = multi.stats
    ok = (
        h == golden["hash"]
        and st.preambles == golden["preambles"]
        and list(st.accepted) == list(golden["accepted"])
        and st.rejected_bad == golden["rejected_bad"]
        and st.rejected_unknown_icao == golden["rejected_unknown"]
    )
    mark(f"TPU-vs-CPU parity: {'OK' if ok else 'MISMATCH'} "
         f"({len(sig)} frames vs {golden['nframes']}; "
         f"stats {st.preambles}/{st.accepted} vs "
         f"{golden['preambles']}/{golden['accepted']})")
    res["parity_ok"] = bool(ok)
except Exception as e:
    mark(f"parity check failed to run: {e}")

# ---------------------------------------------------------------------------
# 5. risky compiles last: bigger dispatch, v2 at 2048 rows
# ---------------------------------------------------------------------------
res["full_2blk"] = timeit(
    "FULL multi-raw v2, 2 blocks/chan", multi_chain(64, 8192, 64, n_blocks=2),
    samples=2 * TOTAL,
)


def extract_rows_chain(ex_rows):
    @jax.jit
    def run(c):
        corr, pw, ch, cl = dense_only(c)
        cand = (corr[:SCAN_MULTI] & 8) != 0
        pos = jnp.arange(SCAN_MULTI, dtype=jnp.int32)
        cand = cand & ((pos % STRIDE) < SEG_VALID)
        offsets, max_local = _compact_two_level(cand, K, 64, SCAN_MULTI)
        win, nv = demod_ops.win_rows(corr, pw, SCAN_MULTI)
        rows = win[jnp.clip(offsets >> 8, 0, nv - 1)]
        comb = pk.extract_classify_pallas(rows, offsets, _tbl, ex_rows=ex_rows)
        return comb[33, 0] + comb[55, 9] + offsets[11] + max_local
    return run


res["extract_v2_512"] = timeit("extract v2 ex_rows=512", extract_rows_chain(512))
res["extract_v2_2048"] = timeit("extract v2 ex_rows=2048", extract_rows_chain(2048))

print(json.dumps({k: (v if isinstance(v, bool) else round(v * 1e3, 3) if v else None)
                  for k, v in res.items()}), flush=True)
mark("session done")
