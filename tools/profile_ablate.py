"""Ablation timing of the fused demod program at bench scale.

Each variant extends the previous by one stage; deltas attribute cost.
Run on the real chip: python tools/profile_ablate.py [n_blocks]

Stage structure matches ops/demod.py's _demod_core (round-3 layout):
dense scan -> compaction -> win-row build -> row gather -> rotate/extract
-> syndrome matmul, then the score gate on top.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from readsb_tpu.constants import BLOCK_SAMPLES, TRAILING_SAMPLES
from readsb_tpu.ops import demod as demod_ops
from readsb_tpu.ops import pallas_kernels as pk
from readsb_tpu.ops.demod import (
    NUM_PHASES, WIN_PLANE_WORDS, WIN_CORR_BASE,
    _compact_two_level, _extract_plan, _pack_plane_words,
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
T0 = time.time()


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
    print(
        f"+{time.time()-T0:5.0f}s {name:26s} {best*1e3:9.3f} ms "
        f"{SCAN/best/1e6:9.0f} MS/s",
        flush=True,
    )
    return out


@jax.jit
def v_convert(raw_u8, ov, t):
    mag = pl_mod._to_mag(raw_u8, "uc8")
    return mag[::4096]


timeit("convert only", v_convert, raw_j, overlap, thr)


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
    return corrbits[::4096], pwords[:, ::4096], cs_hi[::4096], cs_lo[::4096]


timeit("convert+dense", v_dense, raw_j, overlap, thr)


@jax.jit
def v_compact(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    return offsets[::64], max_local, pwords[:, ::4096], cs_hi[::4096], cs_lo[::4096]


timeit("+compaction", v_compact, raw_j, overlap, thr)


def win_build(corrbits, pwords):
    nv = (SCAN + 255) // 256
    need = 8 * nv + WIN_PLANE_WORDS
    nw = pwords.shape[1]
    pw = jnp.pad(pwords, ((0, 0), (0, need - nw))) if nw < need else pwords
    a = pw[:, : 8 * nv].reshape(5, nv, 8)
    b = pw[:, 8 : 8 * nv + 8].reshape(5, nv, 8)
    c3 = pw[:, 16 : 8 * nv + 16].reshape(5, nv, 8)[..., :3]
    wp = jnp.concatenate([a, b, c3], axis=-1)
    wp = jnp.transpose(wp, (1, 0, 2)).reshape(nv, 5 * WIN_PLANE_WORDS)
    clen = 256 * nv
    cpad = corrbits
    if cpad.shape[0] < clen:
        cpad = jnp.pad(cpad, (0, clen - cpad.shape[0]))
    cpad = cpad[:clen].astype(jnp.int32)
    cpl = jnp.stack([((cpad >> i) & 1) != 0 for i in range(3)])
    cw = _pack_plane_words(cpl).reshape(3, nv, 8)
    cw3 = jnp.transpose(cw, (1, 0, 2)).reshape(nv, 24)
    return jnp.concatenate(
        [wp, cw3, jnp.zeros((nv, 128 - WIN_CORR_BASE - 24), jnp.int32)], axis=1
    ), nv


@jax.jit
def v_win(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    win, nv = win_build(corrbits, pwords)
    return win[::512], offsets[::64], cs_hi[::4096]


timeit("+win rows", v_win, raw_j, overlap, thr)


@jax.jit
def v_gather(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    win, nv = win_build(corrbits, pwords)
    rows = win[jnp.clip(offsets >> 8, 0, nv - 1)]
    return jnp.sum(rows), offsets[::64], cs_hi[::4096]


timeit("+row gather", v_gather, raw_j, overlap, thr)


def extract(rows, offsets):
    s = offsets & 255
    wrot = s >> 5
    sb = s & 31
    sw_pre = jnp.zeros((K, 5, 12), jnp.int32)
    for r in range(8):
        sl = jnp.stack(
            [rows[:, p * WIN_PLANE_WORDS + r : p * WIN_PLANE_WORDS + r + 12]
             for p in range(5)],
            axis=1,
        )
        sw_pre = jnp.where((wrot == r)[:, None, None], sl, sw_pre)
    sbb = sb[:, None, None]
    shl_amt = (32 - sbb) & 31
    hi_part = jnp.where(sbb == 0, 0, jnp.left_shift(sw_pre[:, :, 1:12], shl_amt))
    sw = jax.lax.shift_right_logical(sw_pre[:, :, :11], sbb) | hi_part
    plan, m_np = _extract_plan()
    parts = []
    for pl_, j, shifts in plan:
        w = sw[:, pl_, j][:, None]
        parts.append(jax.lax.shift_right_logical(w, jnp.asarray(shifts)[None, :]) & 1)
    return jnp.concatenate(parts, axis=1).astype(jnp.bfloat16), m_np


@jax.jit
def v_extract(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    win, nv = win_build(corrbits, pwords)
    rows = win[jnp.clip(offsets >> 8, 0, nv - 1)]
    bits, _ = extract(rows, offsets)
    return jnp.sum(bits.astype(jnp.float32)), offsets[::64], cs_hi[::4096]


timeit("+extract bits", v_extract, raw_j, overlap, thr)


@jax.jit
def v_matmul(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    win, nv = win_build(corrbits, pwords)
    rows = win[jnp.clip(offsets >> 8, 0, nv - 1)]
    bits, m_np = extract(rows, offsets)
    out = jax.lax.dot(
        bits, jnp.asarray(m_np, dtype=jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    outi = out.astype(jnp.int32).reshape(K, NUM_PHASES, 62)
    w24 = (1 << jnp.arange(23, -1, -1, dtype=jnp.int32)).astype(jnp.int32)
    syn112 = jnp.sum((outi[:, :, 0:24] & 1) * w24, axis=-1)
    syn56 = jnp.sum((outi[:, :, 24:48] & 1) * w24, axis=-1)
    msg = outi[:, :, 48:62].astype(jnp.uint8)
    return syn112[::64], syn56[::64], msg[::64], offsets[::64]


timeit("+matmul/syndromes", v_matmul, raw_j, overlap, thr)


@jax.jit
def v_kernel(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    win, nv = demod_ops.win_rows(corrbits, pwords, SCAN)
    rows = win[jnp.clip(offsets >> 8, 0, nv - 1)]
    comb = pk.extract_syndromes_pallas(rows, offsets)
    return comb[::64], offsets[::64], cs_hi[::4096]


timeit("+extract KERNEL", v_kernel, raw_j, overlap, thr)


full = jax.jit(
    lambda r, ov, t: demod_ops.demod_block(
        jnp.concatenate([ov, pl_mod._to_mag(r, "uc8")]), t,
        k=K, scan_len=SCAN, l=L))
timeit("FULL demod_block", full, raw_j, overlap, thr)


def gated(r, ov, t):
    from readsb_tpu.ops.gate import TBL_SENTINEL

    tbl = jnp.full(2048, TBL_SENTINEL, jnp.int32)
    return pl_mod._demod_and_gate(
        pl_mod._to_mag(r, "uc8"), ov, jnp.int32(SCAN), t, tbl,
        k=K, scan_len=SCAN, l=L, k2=1024, nfix=1, fix_df=True,
        reset_every=BLOCK_SAMPLES,
    )


timeit("FULL demod+gate", gated, raw_j, overlap, thr)
