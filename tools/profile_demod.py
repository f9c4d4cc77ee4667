"""Stage-by-stage timing of the (bit-packed) demod pipeline on the real chip.

Mirrors the stages of readsb_tpu.ops.demod.demod_block so regressions can be
attributed.  Stage bodies are intentionally inlined copies — keep in sync.
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from readsb_tpu.constants import BLOCK_SAMPLES, TRAILING_SAMPLES
from readsb_tpu.ops import convert as convert_ops
from readsb_tpu.ops import demod as demod_ops
from readsb_tpu.ops.demod import (
    SLICE_WINDOW, NUM_PHASES, WORDS_PER_CAND, MODES_LONG_MSG_BITS,
    lattice_tables, _combined_matrix, _pack_plane_words,
)

N_BLOCKS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
K = 2048 * N_BLOCKS
SCAN = N_BLOCKS * BLOCK_SAMPLES
TOTAL = SCAN

rng = np.random.default_rng(0)
i8 = rng.normal(127.5, 10, TOTAL).clip(0, 255).astype(np.uint8)
q8 = rng.normal(127.5, 10, TOTAL).clip(0, 255).astype(np.uint8)
raw = np.empty(TOTAL * 2, dtype=np.uint8)
raw[0::2] = i8; raw[1::2] = q8
raw_j = jnp.asarray(raw)
overlap = jnp.zeros(TRAILING_SAMPLES, dtype=jnp.uint16)
thr = jnp.int32(58)

# Axon relay: block_until_ready is a no-op until the process's first
# device->host readback; do one now so every timing below is honest.
_ = float(jnp.sum(jnp.asarray(raw[:128], dtype=jnp.float32)))


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
    ms = best * 1e3
    print(f"{name:34s} {ms:9.3f} ms   {TOTAL/best/1e6:9.0f} MS/s")
    return out


@jax.jit
def f_convert(raw_u8, overlap):
    mag = convert_ops.mag_uc8(raw_u8)
    return jnp.concatenate([overlap, mag])

buf = timeit("convert+concat", f_convert, raw_j, overlap)


@jax.jit
def f_dense(buf, threshold):
    m = buf.astype(jnp.int32)
    def at(i):
        return jax.lax.dynamic_slice_in_dim(m, i, SCAN)
    p1, p2, p3, p4, p5 = at(1), at(2), at(3), at(4), at(5)
    p7, p8, p9, p10, p11 = at(7), at(8), at(9), at(10), at(11)
    p12, p14, p15, p16, p17, p18 = at(12), at(14), at(15), at(16), at(17), at(18)
    pre = (p1 > p7) & (p12 > p14) & (p12 > p15)
    base_noise = p5 + p8 + p16 + p17 + p18
    ref_level = (base_noise * threshold) >> 5
    d23 = p2 - p3; s14 = p1 + p4; d1011 = p10 - p11
    common = s14 - d23 + p9 + p12
    corr_a = (common - d1011) >= ref_level
    corr_b = (common + d1011) >= ref_level
    corr_c = (s14 + 2 * d23 + d1011 + p12) >= ref_level
    cand = pre & (corr_a | corr_b | corr_c)
    return cand, corr_a, corr_b, corr_c

cand, corr_a, corr_b, corr_c = timeit("s1 dense precheck+corr", f_dense, buf, thr)
print("  n_cand =", int(jnp.sum(cand)))


@jax.jit
def f_planes(buf):
    m = buf.astype(jnp.int32)
    total = buf.shape[0]
    plane_len = total - 4
    nwords = (plane_len // 32) + WORDS_PER_CAND + 2
    def shifted(i, n):
        return jax.lax.dynamic_slice_in_dim(m, i, n)
    s0 = shifted(0, plane_len); s1 = shifted(1, plane_len)
    s2 = shifted(2, plane_len); s3 = shifted(3, plane_len)
    planes = jnp.stack([
        (18 * s0 - 15 * s1 - 3 * s2) > 0,
        (14 * s0 - 5 * s1 - 9 * s2) > 0,
        (16 * s0 + 5 * s1 - 20 * s2) > 0,
        (7 * s0 + 11 * s1 - 18 * s2) > 0,
        (4 * s0 + 15 * s1 - 20 * s2 + s3) > 0,
    ])
    planes = jnp.pad(planes, ((0, 0), (0, nwords * 32 - plane_len)))
    return _pack_plane_words(planes)

pwords = timeit("s2 sign planes+bitpack", f_planes, buf)


@jax.jit
def f_compact(cand):
    ci = cand.astype(jnp.int32)
    slot = jnp.cumsum(ci) - 1
    scat = jnp.where(cand, slot, K)
    offsets = jnp.full(K + 1, SCAN, dtype=jnp.int32)
    offsets = offsets.at[scat].set(jnp.arange(SCAN, dtype=jnp.int32), mode="drop")[:K]
    return offsets

offsets = timeit("s3 cumsum+scatter compact", f_compact, cand)


@jax.jit
def f_extract(pwords, offsets):
    w0 = offsets >> 5
    s = offsets & 31
    widx = w0[:, None] + jnp.arange(WORDS_PER_CAND, dtype=jnp.int32)[None, :]
    words = pwords[:, widx]
    words_flat = jnp.transpose(words, (1, 0, 2)).reshape(K, 5 * WORDS_PER_CAND)
    aoff_np, kid_np = lattice_tables()
    woff = aoff_np >> 5
    roff = aoff_np & 31
    flat_lo = jnp.asarray(kid_np * WORDS_PER_CAND + woff)
    flat_hi = flat_lo + 1
    bitpos = jnp.asarray(roff)[None] + s[:, None, None]
    lo = words_flat[:, flat_lo]
    hi = words_flat[:, flat_hi]
    sel = jnp.where(bitpos < 32, lo, hi)
    return (jax.lax.shift_right_logical(sel, bitpos & 31) & 1).astype(jnp.bfloat16)

bits = timeit("s4 word gather+bit extract", f_extract, pwords, offsets)


@jax.jit
def f_matmul(bits):
    comb = jnp.asarray(_combined_matrix(), dtype=jnp.bfloat16)
    out = jax.lax.dot(
        bits.reshape(K * NUM_PHASES, MODES_LONG_MSG_BITS), comb,
        preferred_element_type=jnp.float32,
    )
    outi = out.astype(jnp.int32).reshape(K, NUM_PHASES, 62)
    w24 = (1 << jnp.arange(23, -1, -1, dtype=jnp.int32)).astype(jnp.int32)
    syn112 = jnp.sum((outi[:, :, 0:24] & 1) * w24, axis=-1)
    syn56 = jnp.sum((outi[:, :, 24:48] & 1) * w24, axis=-1)
    msg = outi[:, :, 48:62].astype(jnp.uint8)
    return syn112, syn56, msg

timeit("s5 MXU matmul+syndromes", f_matmul, bits)


@jax.jit
def f_sig(buf, offsets):
    mu = buf.astype(jnp.uint32)
    sq = mu * mu
    sq_hi = (sq >> jnp.uint32(16)).astype(jnp.int32)
    sq_lo = (sq & jnp.uint32(0xFFFF)).astype(jnp.int32)
    cs_hi = jnp.cumsum(sq_hi)
    cs_lo = jnp.cumsum(sq_lo)
    def window_sum(a, b):
        ia = offsets + (a - 1)
        ib = offsets + (b - 1)
        return jnp.stack([cs_hi[ib] - cs_hi[ia], cs_lo[ib] - cs_lo[ia]], axis=-1)
    return window_sum(19, 19 + 268), window_sum(19, 19 + 134)

timeit("s6 sig cumsum+lookup", f_sig, buf, offsets)

full = jax.jit(lambda b, t: demod_ops.demod_block(b, t, k=K, scan_len=SCAN))
timeit("FULL demod_block (k=%d)" % K, full, buf, thr)

full2 = jax.jit(lambda b, t: demod_ops.demod_block(b, t, k=K + 256, scan_len=SCAN))
timeit("FULL demod_block (k=%d)" % (K + 256), full2, buf, thr)
