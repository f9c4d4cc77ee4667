"""Measure compaction variants on-device (pure XLA, no Mosaic risk).

dense scan + {matmul-onehot, sort} compaction, l in {16, 64}.
"""
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

from readsb_tpu.constants import BLOCK_SAMPLES, TRAILING_SAMPLES
from readsb_tpu.ops import pallas_kernels as pk
from readsb_tpu.ops.demod import _compact_two_level, _compact_two_level_sort
from bench import build_workload

N_CHAN = 64
SEG_VALID = BLOCK_SAMPLES
STRIDE = SEG_VALID + 512
SCAN = N_CHAN * STRIDE
TOTAL = N_CHAN * SEG_VALID
K = 2048 * N_CHAN
T0 = time.time()


def mark(s):
    print(f"+{time.time()-T0:5.0f}s {s}", flush=True)


raw, total = build_workload(N_CHAN)
words = jnp.asarray(np.frombuffer(raw.tobytes(), dtype="<u2").reshape(N_CHAN, SEG_VALID))
thr = jnp.int32(58)
_ = float(jnp.sum(jnp.zeros(4)))
mark("attached")

RTT = [0.0]


def timeit(name, fn, reps=10, sub=True):
    try:
        c = fn(jnp.int32(0))
        int(c)
    except Exception as e:
        mark(f"{name:30s} FAILED {type(e).__name__}: {str(e)[:200]}")
        return None
    best = 1e9
    for _ in range(3):
        c = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(reps):
            c = fn(c)
        int(c)
        best = min(best, (time.perf_counter() - t0) / reps)
    net = best - (RTT[0] if sub else 0)
    mark(f"{name:30s} {net*1e3:8.3f} ms {TOTAL/max(net,1e-9)/1e6:8.0f} MS/s")
    return net


@jax.jit
def chain_null(c):
    return c + 1


n = timeit("null", chain_null, reps=50, sub=False)
RTT[0] = max(0.0, n or 0.0)


def dense(c):
    gap = STRIDE - SEG_VALID - TRAILING_SAMPLES
    ovs = jnp.full((N_CHAN, TRAILING_SAMPLES), 0x8080, jnp.uint16) + c.astype(jnp.uint16)
    seg = jnp.concatenate([ovs, words, jnp.zeros((N_CHAN, gap), words.dtype)], axis=1)
    buf = jnp.pad(seg.reshape(-1), (0, 512))
    tile = pk.DENSE_ROWS * pk.LANES
    padded = ((buf.shape[0] + 512 + tile - 1) // tile) * tile
    return pk.dense_scan_uc8_pallas(jnp.pad(buf, (0, padded - buf.shape[0])), thr)


def mk(fn, l):
    @jax.jit
    def run(c):
        corr, pw, ch, cl = dense(c)
        cand = (corr[:SCAN] & 8) != 0
        pos = jnp.arange(SCAN, dtype=jnp.int32)
        cand = cand & ((pos % STRIDE) < SEG_VALID)
        offsets, max_local = fn(cand, K, l, SCAN)
        return offsets[77] + max_local + ch[123]
    return run


timeit("dense only", mk(lambda c, k, l, s: (jnp.zeros(k, jnp.int32), jnp.int32(0)), 64))
timeit("matmul-onehot l=64", mk(_compact_two_level, 64))
timeit("sort l=64", mk(_compact_two_level_sort, 64))
timeit("sort l=16", mk(_compact_two_level_sort, 16))

from readsb_tpu.ops.demod import _compact_topk

timeit("top_k", mk(_compact_topk, 64))
mark("done")
