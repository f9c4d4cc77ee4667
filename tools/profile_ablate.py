"""Ablation timing of the fused demod program at bench scale.

Each variant extends the previous by one stage; deltas attribute cost.
Run on the real chip: python tools/profile_ablate.py [n_blocks]
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from readsb_tpu.constants import BLOCK_SAMPLES, TRAILING_SAMPLES
from readsb_tpu.ops import demod as demod_ops
from readsb_tpu.ops import pallas_kernels as pk
from readsb_tpu.ops.demod import (
    WORDS_PER_CAND, MODES_LONG_MSG_BITS, NUM_PHASES, SIG_LONG, SIG_SHORT,
    lattice_tables, _combined_matrix, _compact_two_level,
)
from readsb_tpu import pipeline as pl_mod

N_BLOCKS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SCAN = N_BLOCKS * BLOCK_SAMPLES
K = 2048 * N_BLOCKS
L = 64

rng = np.random.default_rng(0)
raw = rng.integers(0, 256, SCAN * 2, dtype=np.int64).astype(np.uint8)
raw_j = jnp.asarray(raw)
overlap = jnp.zeros(TRAILING_SAMPLES, dtype=jnp.uint16)
thr = jnp.int32(58)
_ = float(jnp.sum(jnp.zeros(4)))  # poison -> honest timings


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:30s} {best*1e3:9.3f} ms   {SCAN/best/1e6:9.0f} MS/s", flush=True)
    return out


def common(raw_u8, ov, t):
    mag = pl_mod._to_mag(raw_u8, "uc8")
    buf = jnp.concatenate([ov, mag])
    tile = pk.DENSE_ROWS * pk.LANES
    padded = ((buf.shape[0] + tile - 1) // tile) * tile
    bufp = jnp.pad(buf, (0, padded - buf.shape[0]))
    return pk.dense_scan_pallas(bufp, t)


@jax.jit
def v_dense(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    # keep everything live without transferring much
    return corrbits[::4096], pwords[:, ::4096], cs_hi[::4096], cs_lo[::4096]

timeit("convert+dense", v_dense, raw_j, overlap, thr)


@jax.jit
def v_compact(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    return offsets[::64], max_local, pwords[:, ::4096], cs_hi[::4096], cs_lo[::4096]

timeit("+compaction", v_compact, raw_j, overlap, thr)


def extract_bits(pwords, offsets):
    w0 = offsets >> 5
    s = offsets & 31
    widx = w0[:, None] + jnp.arange(WORDS_PER_CAND, dtype=jnp.int32)[None, :]
    words = pwords[:, widx]
    words_flat = jnp.transpose(words, (1, 0, 2)).reshape(K, 5 * WORDS_PER_CAND)
    aoff_np, kid_np = lattice_tables()
    flat_lo = jnp.asarray(kid_np * WORDS_PER_CAND + (aoff_np >> 5))
    bitpos = jnp.asarray(aoff_np & 31)[None] + s[:, None, None]
    lo = words_flat[:, flat_lo]
    hi = words_flat[:, flat_lo + 1]
    sel = jnp.where(bitpos < 32, lo, hi)
    return (jax.lax.shift_right_logical(sel, bitpos & 31) & 1).astype(jnp.bfloat16)


@jax.jit
def v_extract(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    bits = extract_bits(pwords, offsets)
    return jnp.sum(bits.astype(jnp.float32)), offsets[::64], cs_hi[::4096], cs_lo[::4096]

timeit("+extract bits", v_extract, raw_j, overlap, thr)


@jax.jit
def v_matmul(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    bits = extract_bits(pwords, offsets)
    comb = jnp.asarray(_combined_matrix(), dtype=jnp.bfloat16)
    out = jax.lax.dot(
        bits.reshape(K * NUM_PHASES, MODES_LONG_MSG_BITS), comb,
        preferred_element_type=jnp.float32)
    outi = out.astype(jnp.int32).reshape(K, NUM_PHASES, 62)
    w24 = (1 << jnp.arange(23, -1, -1, dtype=jnp.int32)).astype(jnp.int32)
    syn112 = jnp.sum((outi[:, :, 0:24] & 1) * w24, axis=-1)
    syn56 = jnp.sum((outi[:, :, 24:48] & 1) * w24, axis=-1)
    msg = outi[:, :, 48:62].astype(jnp.uint8)
    return syn112[::64], syn56[::64], msg[::64], offsets[::64]

timeit("+matmul/syndromes", v_matmul, raw_j, overlap, thr)

full = jax.jit(
    lambda r, ov, t: demod_ops.demod_block(
        jnp.concatenate([ov, pl_mod._to_mag(r, "uc8")]), t,
        k=K, scan_len=SCAN, l=L))
timeit("FULL demod_block", full, raw_j, overlap, thr)
