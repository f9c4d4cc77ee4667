"""Pallas TPU kernels for the demod hot path.

The XLA lowering of the 64k-entry UC8 magnitude LUT is a generic gather
(~25 ms per 2M-sample superblock on v5e — the single largest cost in the
round-1 pipeline).  This module replaces it with an arithmetic kernel that
is bit-exact with the reference LUT (wiedehopf/readsb convert.c:35-62):

  mag = u16( sqrtf(min(1, fi^2 + fq^2)) * 65535f + 0.5f )

with fi = f32((i - 127.5) / 127.5).  Exactness on TPU requires two tricks:

  1. fi^2 comes from a 128-entry f32 table (fi^2 is symmetric in
     i <-> 255-i) fetched with Mosaic's lane `dynamic_gather`
     (jnp.take_along_axis on a row-broadcast table).  This sidesteps both
     the divide (whose strength-reduced lowering is not correctly
     rounded) and the FMA contraction of fi*fi + fq*fq.
  2. The VPU's f32 sqrt is not correctly rounded (~45% of values are
     1 ulp off).  We recover the correctly rounded sqrt from the sloppy
     one by evaluating |c^2 - s| exactly (Veltkamp split + two-sum; the
     arithmetic is exact in IEEE f32 mul/add, which the VPU does honor)
     for the three candidates {y-ulp, y, y+ulp} and taking the argmin.
     The comparison tolerates the final two-sum rounding because the
     candidate margins are ~2^40 x larger (no exact ties exist in the
     4817-value input domain; tests/test_convert.py checks all 65536
     IQ pairs against the LUT).

The whole kernel is ~60 VPU ops/sample — dwarfed by HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS_PER_STEP = 512  # (512, 128) samples per grid step

# Test/dryrun hook: when True, supported() reports True and every kernel
# wrapper runs the Mosaic interpreter — the multichip dryrun uses this to
# execute the PRODUCTION fused program (same code path as TPU) on the
# virtual CPU mesh (VERDICT r3 #4).
INTERPRET = False


@functools.lru_cache(maxsize=None)
def _sq_table_np() -> np.ndarray:
    """f32[128]: fi^2 for i in 0..127 (symmetric half; fi per convert.c)."""
    i = np.arange(128, dtype=np.float64)
    fi = ((i - 127.5) / 127.5).astype(np.float32)
    return fi * fi


def _cr_sqrt(s: jax.Array) -> jax.Array:
    """Correctly rounded f32 sqrt from the VPU's ~1ulp-sloppy sqrt."""
    y = jnp.sqrt(s)

    def nudge(x, d):
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.int32) + d, jnp.float32
        )

    def dabs(c):
        split = jnp.float32(4097.0)
        t = c * split
        c_hi = t - (t - c)
        c_lo = c - c_hi
        e1 = c_hi * c_hi - s          # Sterbenz-exact (c_hi^2 within 2x of s)
        p_hl = jnp.float32(2.0) * c_hi * c_lo  # exact
        p_ll = c_lo * c_lo            # exact
        sh = e1 + p_hl
        t2 = sh - e1
        err = (e1 - (sh - t2)) + (p_hl - t2)
        return jnp.abs(sh + (err + p_ll))

    cm = nudge(y, -1)
    cp = nudge(y, 1)
    dm, d0, dp = dabs(cm), dabs(y), dabs(cp)
    best = jnp.where(dm < d0, cm, y)
    db = jnp.minimum(dm, d0)
    return jnp.where(dp < db, cp, best)


def _uc8_kernel(sqtab_ref, words_ref, mag_ref):
    w = words_ref[:].astype(jnp.int32)
    ib = w & 0xFF
    qb = (w >> 8) & 0xFF
    ui = jnp.minimum(ib, 255 - ib)  # fi^2 symmetric in i <-> 255-i
    uq = jnp.minimum(qb, 255 - qb)
    tab = jnp.broadcast_to(sqtab_ref[:], (w.shape[0], LANES))
    sq_i = jnp.take_along_axis(tab, ui, axis=1)
    sq_q = jnp.take_along_axis(tab, uq, axis=1)
    s = jnp.minimum(sq_i + sq_q, jnp.float32(1.0))
    g = _cr_sqrt(s)
    m = g * jnp.float32(65535.0) + jnp.float32(0.5)
    # f32 -> uint16 is unsupported in Mosaic; go via int32 (values < 2^16)
    mag_ref[:] = m.astype(jnp.int32).astype(jnp.uint16)


# ---------------------------------------------------------------------------
# Fused dense scan: preamble correlations + slicer sign planes (bit-packed)
# + split hi/lo prefix sums of mag^2 — one pass over the sample stream.
# ---------------------------------------------------------------------------

DENSE_ROWS = 512  # (512, 128) = 65536 samples per grid step; 1024 exceeds the 16 MB VMEM scope


def _shifted_family(m_ext: jax.Array, rows: int, ks: tuple[int, ...]):
    """Dict k -> (rows, 128) int32 view of flat samples shifted by +k.

    m_ext is (rows + 1, 128): the tile plus one lookahead row.  Shifts are
    lane rolls stitched across the row boundary (k < 128).
    """
    a = m_ext[:rows]
    b = m_ext[1 : rows + 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    out = {}
    for k in ks:
        if k == 0:
            out[k] = a
            continue
        ra = pltpu.roll(a, LANES - k, axis=1)  # left-rotate by k
        rb = pltpu.roll(b, LANES - k, axis=1)
        out[k] = jnp.where(col < LANES - k, ra, rb)
    return out


@functools.lru_cache(maxsize=None)
def _pack_weights_np() -> tuple[np.ndarray, np.ndarray]:
    """(W_lo, W_hi): f32[128, 4] packing weights for 32-sample words.

    word w of a 128-lane row packs lanes [32w, 32w+32); lo takes bit lanes
    32w..32w+15 (weights 2^0..2^15), hi the rest.  Exact in f32 (< 2^16).
    """
    w_lo = np.zeros((LANES, 4), np.float32)
    w_hi = np.zeros((LANES, 4), np.float32)
    for c in range(LANES):
        w, j = divmod(c, 32)
        if j < 16:
            w_lo[c, w] = float(1 << j)
        else:
            w_hi[c, w] = float(1 << (j - 16))
    return w_lo, w_hi


PW_COLS = 20  # 5 slicer planes x 4 words per 128-sample row


@functools.lru_cache(maxsize=None)
def _pack_weights640_np() -> tuple[np.ndarray, np.ndarray]:
    """(W_lo, W_hi): f32[640, 20] block-diagonal packing weights.

    The 5 sign planes lane-concatenate to (rows, 640) — vreg-aligned, so
    the concat is free — and ONE matmul packs all 20 words along lanes:
    output col p*4+w <- plane p, word w.  Writing (rows, 20) instead of
    (5, rows, 4) avoids the minor-dim-4 tile padding that cost ~1.1 ms
    per superblock (r5 session-B write probe).  Entries are powers of two
    <= 2^15: exact under the MXU's bf16 input truncation.
    """
    w_lo = np.zeros((5 * LANES, PW_COLS), np.float32)
    w_hi = np.zeros((5 * LANES, PW_COLS), np.float32)
    for p in range(5):
        for c in range(LANES):
            w, j = divmod(c, 32)
            if j < 16:
                w_lo[p * LANES + c, p * 4 + w] = float(1 << j)
            else:
                w_hi[p * LANES + c, p * 4 + w] = float(1 << (j - 16))
    return w_lo, w_hi


def _lane_prefix_i32(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum along lanes (wraparound int32, exact)."""
    rows = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    for j in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.where(col >= j, pltpu.roll(x, j, axis=1), 0)
    return x


def _row_prefix_excl_i32(x: jax.Array) -> jax.Array:
    """Exclusive prefix sum along sublanes (axis 0), wraparound int32."""
    rows = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, x.shape[1]), 0)
    inc = x
    j = 1
    while j < rows:
        inc = inc + jnp.where(row >= j, pltpu.roll(inc, j, axis=0), 0)
        j *= 2
    return inc - x


def _row_prefix_excl_fast(col: jax.Array) -> jax.Array:
    """Exclusive prefix over a (rows, 1) column, lane-parallel.

    The straight log-roll scan operates on (rows, 1) vregs — 1/128th of
    the VPU (~0.6 ms/superblock of the dense kernel, r5 session probes).
    Regroup to (rows/128, 128), lane-scan at full width, then a tiny
    sublane scan stitches the groups.  Bit-identical (wraparound int32);
    the (rows, 1) <-> (rows/128, 128) reshapes compile on Mosaic.
    """
    rows = col.shape[0]
    if rows % LANES:
        return _row_prefix_excl_i32(col)
    g = rows // LANES
    rt = col.reshape(g, LANES)
    rp = _lane_prefix_i32(rt)  # inclusive within each 128-row group
    excl = rp - rt
    off = _row_prefix_excl_i32(rp[:, LANES - 1:])  # (g, 1) group offsets
    return (excl + off).reshape(rows, 1)


def _dense_scan_kernel(
    thr_ref, m_ref, halo_ref, wlo_ref, whi_ref,
    corr_ref, pw_ref, cs_hi_ref, cs_lo_ref, carry
):
    thr = thr_ref[0]
    t_id = pl.program_id(0)
    # halo rows are replicated 8x so the dynamic index is provably aligned
    halo_row = halo_ref[pl.ds(pl.multiple_of(t_id * 8, 8), 8), :][:1]
    m_ext = jnp.concatenate(
        [m_ref[:].astype(jnp.int32), halo_row.astype(jnp.int32)], axis=0
    )
    _dense_body(thr, m_ext, wlo_ref, whi_ref, corr_ref, pw_ref,
                cs_hi_ref, cs_lo_ref, carry)


def _uc8_mag_i32(w_i32, sqtab_ref):
    """uc8 word rows -> int32 magnitudes (the _uc8_kernel math)."""
    ib = w_i32 & 0xFF
    qb = (w_i32 >> 8) & 0xFF
    ui = jnp.minimum(ib, 255 - ib)
    uq = jnp.minimum(qb, 255 - qb)
    tab = jnp.broadcast_to(sqtab_ref[:], (w_i32.shape[0], LANES))
    sq_i = jnp.take_along_axis(tab, ui, axis=1)
    sq_q = jnp.take_along_axis(tab, uq, axis=1)
    sv = jnp.minimum(sq_i + sq_q, jnp.float32(1.0))
    g = _cr_sqrt(sv)
    m = g * jnp.float32(65535.0) + jnp.float32(0.5)
    return m.astype(jnp.int32)


def _dense_scan_uc8_kernel(
    thr_ref, sqtab_ref, words_ref, halo_ref, wlo_ref, whi_ref,
    corr_ref, pw_ref, cs_hi_ref, cs_lo_ref, carry
):
    """Fused UC8 convert + dense scan: raw IQ words in, scan planes out —
    the magnitude array never round-trips through HBM."""
    thr = thr_ref[0]
    t_id = pl.program_id(0)
    halo_row = halo_ref[pl.ds(pl.multiple_of(t_id * 8, 8), 8), :][:1]
    w_ext = jnp.concatenate(
        [words_ref[:].astype(jnp.int32), halo_row.astype(jnp.int32)], axis=0
    )
    m_ext = _uc8_mag_i32(w_ext, sqtab_ref)
    _dense_body(thr, m_ext, wlo_ref, whi_ref, corr_ref, pw_ref,
                cs_hi_ref, cs_lo_ref, carry)


def _dense_body(thr, m_ext, wlo_ref, whi_ref,
                corr_ref, pw_ref, cs_hi_ref, cs_lo_ref, carry):
    rows = DENSE_ROWS
    at = _shifted_family(
        m_ext, rows, (0, 1, 2, 3, 4, 5, 7, 8, 9, 10, 11, 12, 14, 15, 16, 17, 18)
    )

    # --- preamble pre-check + 3 correlations (demod_2400.c:311-378) ---------
    pre = (at[1] > at[7]) & (at[12] > at[14]) & (at[12] > at[15])
    base_noise = at[5] + at[8] + at[16] + at[17] + at[18]
    ref_level = (base_noise * thr) >> 5
    d23 = at[2] - at[3]
    s14 = at[1] + at[4]
    d1011 = at[10] - at[11]
    common = s14 - d23 + at[9] + at[12]
    corr_a = (common - d1011) >= ref_level
    corr_b = (common + d1011) >= ref_level
    corr_c = (s14 + 2 * d23 + d1011 + at[12]) >= ref_level
    cand = pre & (corr_a | corr_b | corr_c)
    corr_ref[:] = (
        corr_a.astype(jnp.int32)
        | (corr_b.astype(jnp.int32) << 1)
        | (corr_c.astype(jnp.int32) << 2)
        | (cand.astype(jnp.int32) << 3)
    ).astype(jnp.int8)

    # --- slicer sign planes, bit-packed 32 samples/word ----------------------
    # lane-concat (vreg-aligned, free) + ONE block-diagonal pack matmul;
    # output (rows, 20) keeps the write on full vregs (session-B probe:
    # the old (5, rows, 4) layout cost ~1.1 ms/superblock in tile padding)
    s0, s1, s2, s3 = at[0], at[1], at[2], at[3]
    planes_h = jnp.concatenate(
        [
            (18 * s0 - 15 * s1 - 3 * s2) > 0,
            (14 * s0 - 5 * s1 - 9 * s2) > 0,
            (16 * s0 + 5 * s1 - 20 * s2) > 0,
            (7 * s0 + 11 * s1 - 18 * s2) > 0,
            (4 * s0 + 15 * s1 - 20 * s2 + s3) > 0,
        ],
        axis=1,
    ).astype(jnp.float32)  # (rows, 640)
    lo = jax.lax.dot(planes_h, wlo_ref[:], preferred_element_type=jnp.float32)
    hi = jax.lax.dot(planes_h, whi_ref[:], preferred_element_type=jnp.float32)
    pw_ref[:] = lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)  # (rows, 20)

    # --- split hi/lo prefix sums of mag^2 (wraparound-exact int32) ----------
    mm = at[0]
    mh = mm >> 8
    ml = mm & 0xFF
    t = 2 * mh * ml * 256 + ml * ml  # < 2^26, exact
    sq_hi = mh * mh + (t >> 16)
    sq_lo = t & 0xFFFF

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry[0] = 0
        carry[1] = 0

    ph = _lane_prefix_i32(sq_hi)
    pl_ = _lane_prefix_i32(sq_lo)
    rh = _row_prefix_excl_fast(ph[:, LANES - 1 :])
    rl = _row_prefix_excl_fast(pl_[:, LANES - 1 :])
    cs_hi = ph + rh + carry[0]
    cs_lo = pl_ + rl + carry[1]
    cs_hi_ref[:] = cs_hi
    cs_lo_ref[:] = cs_lo
    carry[0] = cs_hi[rows - 1, LANES - 1]
    carry[1] = cs_lo[rows - 1, LANES - 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_scan_pallas(buf: jax.Array, threshold: jax.Array, *, interpret: bool = False):
    """One fused pass over magnitudes.

    buf: (n,) uint16 with n % (DENSE_ROWS*128) == 0 (caller pads; pad
    samples produce no in-range candidates because the caller slices to
    scan_len).  Returns:
      corrbits int8[n]           bit0..2 = corr A/B/C fired, bit3 = cand
      pwords   int32[5, n//32]   slicer sign planes, 32 samples/word
      cs_hi    int32[n]          inclusive prefix of (mag^2 >> 16)
      cs_lo    int32[n]          inclusive prefix of (mag^2 & 0xffff)

    Matches the pure-jnp stages of ops.demod.demod_block bit-for-bit
    (tests/test_pallas.py).
    """
    n = buf.shape[0]
    tile = DENSE_ROWS * LANES
    assert n % tile == 0, n
    ntiles = n // tile
    rows = n // LANES
    m2d = buf.reshape(rows, LANES)
    # one lookahead row per tile; the final tile reads a zero row
    halo_rows = jnp.concatenate(
        [m2d[DENSE_ROWS::DENSE_ROWS][: ntiles - 1], jnp.zeros((1, LANES), buf.dtype)]
    ) if ntiles > 1 else jnp.zeros((1, LANES), buf.dtype)
    halo_rows = jnp.repeat(halo_rows, 8, axis=0)  # sublane-aligned dynamic loads

    grid = (ntiles,)
    corr, pw, cs_hi, cs_lo = pl.pallas_call(
        _dense_scan_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int8),
            jax.ShapeDtypeStruct((rows, PW_COLS), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((DENSE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full halo array, tiny
            pl.BlockSpec((5 * LANES, PW_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * LANES, PW_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((DENSE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DENSE_ROWS, PW_COLS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DENSE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DENSE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(threshold, jnp.int32).reshape(1),
        m2d,
        halo_rows,
        jnp.asarray(_pack_weights640_np()[0]),
        jnp.asarray(_pack_weights640_np()[1]),
    )
    # (rows, 20) device layout -> the (5, n//32) consumer contract
    pwords = pw.reshape(rows, 5, 4).transpose(1, 0, 2).reshape(5, rows * 4)
    return corr.reshape(-1), pwords, cs_hi.reshape(-1), cs_lo.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_scan_uc8_pallas(
    words: jax.Array, threshold: jax.Array, *, interpret: bool = False
):
    """Fused UC8 convert + dense scan (see _dense_scan_uc8_kernel).

    words: (n,) uint16 — one interleaved uc8 I/Q pair per element, with
    n % (DENSE_ROWS*128) == 0 (caller pads with zero words; pad converts
    to loud magnitudes, but every caller masks candidates to scan_len and
    no candidate window reaches the pad).  Outputs match
    dense_scan_pallas(mag_uc8_pallas(bytes), threshold) bit for bit
    (tests/test_pallas.py).
    """
    n = words.shape[0]
    tile = DENSE_ROWS * LANES
    assert n % tile == 0, n
    ntiles = n // tile
    rows = n // LANES
    w2d = words.reshape(rows, LANES)
    halo_rows = jnp.concatenate(
        [w2d[DENSE_ROWS::DENSE_ROWS][: ntiles - 1], jnp.zeros((1, LANES), words.dtype)]
    ) if ntiles > 1 else jnp.zeros((1, LANES), words.dtype)
    halo_rows = jnp.repeat(halo_rows, 8, axis=0)

    corr, pw, cs_hi, cs_lo = pl.pallas_call(
        _dense_scan_uc8_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int8),
            jax.ShapeDtypeStruct((rows, PW_COLS), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DENSE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full halo array, tiny
            pl.BlockSpec((5 * LANES, PW_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * LANES, PW_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((DENSE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DENSE_ROWS, PW_COLS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DENSE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DENSE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(threshold, jnp.int32).reshape(1),
        jnp.asarray(_sq_table_np()).reshape(1, LANES),
        w2d,
        halo_rows,
        jnp.asarray(_pack_weights640_np()[0]),
        jnp.asarray(_pack_weights640_np()[1]),
    )
    pwords = pw.reshape(rows, 5, 4).transpose(1, 0, 2).reshape(5, rows * 4)
    return corr.reshape(-1), pwords, cs_hi.reshape(-1), cs_lo.reshape(-1)


# ---------------------------------------------------------------------------
# Per-candidate extraction + syndromes: rows -> (syn112, syn56, msg, corr)
# ---------------------------------------------------------------------------
#
# XLA's lowering of the same computation materializes every intermediate
# ((K,5,12) rotations, (K,560) bits, (K,310) counts) through HBM — ~33 ms
# per 8.4M-sample superblock (round-3 ablation).  In one Pallas pass all
# intermediates live in VMEM/vregs and the two matmuls hit the MXU:
#   1. word-rotate + bit-shift each candidate's win row by offset&255
#   2. static grouped bit-picks -> (rows, 560) 0/1 bits
#   3. bits @ M1 -> per-phase CRC bit-counts + message bytes (exact < 256)
#   4. (counts & 1) @ M2 -> syndrome values (sums of distinct 2^k, exact)
# Output lanes: 0:5 syn112[phase], 5:10 syn56[phase], 10:80 msg bytes
# (phase-major, 14 per phase), 80:83 correlation-lane bits, rest zero.

EX_ROWS = 512  # candidates per grid step (1024 exceeds the 16 MB VMEM scope)
# the aligned 5-plane window is 55 words = 1760 bits; every window bit is
# a matmul input row (collisions between phases simply sum — linearity)
EX_BITS = 55 * 32


@functools.lru_cache(maxsize=None)
def _extract_mats():
    """(M1 f32[EX_BITS, 320], M2 f32[320, 16]).

    M1 row (plane*352 + q) carries the combined CRC/byte-pack weights of
    every (phase, bit) whose slicer tap reads plane bit q of the aligned
    candidate window — the grouped per-bit shifts of the XLA path
    re-expressed so the whole extraction is bits @ M1 on the MXU.
    """
    from .demod import _combined_matrix, lattice_tables

    aoff, kid = lattice_tables()  # (5, 112)
    comb = _combined_matrix()  # (112, 62)
    # lane layout after pltpu.repeat (tile semantics): lane l holds word
    # (l % 55) shifted right by (l // 55) — so window bit (word w, bit r)
    # lives at lane r*55 + w
    m1 = np.zeros((EX_BITS, 320), np.float32)
    for p in range(5):
        for b in range(112):
            q = int(aoff[p, b])
            w = int(kid[p, b]) * 11 + (q >> 5)
            r = q & 31
            m1[r * 55 + w, p * 62 : (p + 1) * 62] += comb[b]
    m2 = np.zeros((320, 16), np.float32)
    for p in range(5):
        for j in range(24):
            m2[p * 62 + j, p] = float(1 << (23 - j))  # syn112
        for j in range(24):
            m2[p * 62 + 24 + j, 5 + p] = float(1 << (23 - j))  # syn56
    return m1, m2


def _extract_kernel(off_ref, rows_ref, m1_ref, m2_ref, out_ref):
    from .demod import WIN_CORR_BASE, WIN_PLANE_WORDS

    rows = rows_ref[:]
    off = off_ref[:]  # (EX_ROWS, 1) int32
    s = off & 255
    wrot = s >> 5
    sb = s & 31

    # rotate each plane's 19-word window by wrot words -> 12 aligned words
    sw_pre = jnp.zeros((EX_ROWS, 60), jnp.int32)
    for r in range(8):
        sl = jnp.concatenate(
            [rows[:, p * WIN_PLANE_WORDS + r : p * WIN_PLANE_WORDS + r + 12]
             for p in range(5)],
            axis=1,
        )
        sw_pre = jnp.where(wrot == r, sl, sw_pre)
    lo = jnp.concatenate(
        [sw_pre[:, p * 12 : p * 12 + 11] for p in range(5)], axis=1
    )  # (EX_ROWS, 55)
    hi = jnp.concatenate(
        [sw_pre[:, p * 12 + 1 : p * 12 + 12] for p in range(5)], axis=1
    )
    shl = (32 - sb) & 31
    sw = jax.lax.shift_right_logical(lo, sb) | jnp.where(
        sb == 0, 0, jnp.left_shift(hi, shl)
    )

    # unpack all 1760 window bits at once: tile the 55 words 32x along
    # lanes (pltpu.repeat is tile-semantics) and shift lane l by l // 55 —
    # one vector op chain, no per-group loop, no reshape
    u = pltpu.repeat(sw, 32, axis=1)  # (EX_ROWS, 1760)
    lane_bit = jax.lax.broadcasted_iota(jnp.int32, (EX_ROWS, EX_BITS), 1) // 55
    bits = (jax.lax.shift_right_logical(u, lane_bit) & 1).astype(jnp.bfloat16)

    counts = jax.lax.dot(
        bits, m1_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # (EX_ROWS, 320), exact integers < 256
    parity = (counts & 1).astype(jnp.bfloat16)
    syn = jax.lax.dot(
        parity, m2_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # (EX_ROWS, 16): sums of distinct 2^k, exact

    msg = jnp.concatenate(
        [counts[:, p * 62 + 48 : p * 62 + 62] for p in range(5)], axis=1
    )  # (EX_ROWS, 70)

    corr_parts = []
    for c in range(3):
        wsel = jnp.zeros((EX_ROWS, 1), jnp.int32)
        for r in range(8):
            wsel = jnp.where(
                wrot == r, rows[:, WIN_CORR_BASE + c * 8 + r : WIN_CORR_BASE + c * 8 + r + 1], wsel
            )
        corr_parts.append(jax.lax.shift_right_logical(wsel, sb) & 1)
    corr = jnp.concatenate(corr_parts, axis=1)  # (EX_ROWS, 3)

    out_ref[:] = jnp.concatenate(
        [syn[:, :10], msg, corr, jnp.zeros((EX_ROWS, 128 - 83), jnp.int32)],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def extract_syndromes_pallas(
    rows: jax.Array, offsets: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """(K,128) win rows + (K,) offsets -> (K,128) packed results.

    Lanes 0:5 syn112 per phase, 5:10 syn56, 10:80 msg bytes (phase-major),
    80:83 correlation-lane bits.  K must be a multiple of EX_ROWS.
    """
    k = rows.shape[0]
    assert k % EX_ROWS == 0, k
    m1, m2 = _extract_mats()
    return pl.pallas_call(
        _extract_kernel,
        out_shape=jax.ShapeDtypeStruct((k, 128), jnp.int32),
        grid=(k // EX_ROWS,),
        in_specs=[
            pl.BlockSpec((EX_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((EX_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((EX_BITS, 320), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((320, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EX_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        offsets.reshape(k, 1),
        rows,
        jnp.asarray(m1, dtype=jnp.bfloat16),  # entries <= 128: bf16-exact
        jnp.asarray(m2, dtype=jnp.bfloat16),  # powers of two: bf16-exact
    )


# ---------------------------------------------------------------------------
# Extract v2: selection-matmul layout + fused gate classification.
#
# v1's bottleneck is structural: pltpu.repeat blows the 55 aligned window
# words up to a (EX_ROWS, 1760) int32 intermediate (3.5 MB at 512 rows)
# before the bit-unpack, and the first MXU matmul carries a 1760-deep
# contraction of which ~68% of rows are zero (only 560 (phase,bit) taps
# exist).  v2 replaces the repeat with two tiny *selection matmuls*: the
# 55 words are split into exact f32 lo/hi 16-bit halves and multiplied by
# a 0/1 matrix S[55, 560] with exactly one 1 per column — a lane
# permutation-with-duplication executed on the MXU — then each of the 560
# lanes is shifted by its static bit offset and masked to the message
# bit.  Intermediates shrink 3.1x, the deep matmul shrinks 1760->560, and
# EX2_ROWS doubles to 1024 rows/step (half the grid steps of v1).
#
# The same kernel optionally *classifies* each candidate phase the way
# ops.gate.score_gate does (syndrome-table membership, 1-bit-damaged
# DF17, known-ICAO residual probe, zero message) — hoisting the gate's
# dominant cost, a (K, 5, |tbl|) broadcast compare through HBM, into
# VMEM where the syndromes already live.  Flag lanes (83:88) hold a
# per-phase bitmask: 1 in_t112, 2 in_t56, 4 in_tbl, 8 fix_ok, 16 zero7.
# ---------------------------------------------------------------------------

EX2_ROWS = 1024  # candidates per grid step of the v2 kernel
N_EMIT = 560  # 5 phases x 112 bits, one emission lane each


@functools.lru_cache(maxsize=None)
def _extract_v2_mats():
    """(S f32[55, 560], SH int32[560], M1p f32[560, 310], M2p f32[310, 16]).

    Emission order matches ops.demod._extract_plan, whose matrix (with
    the column permutation folded in) is reused verbatim as M1p.
    """
    from .demod import _extract_plan

    plan, m1p = _extract_plan()  # m1p: (560, 310)
    s = np.zeros((55, N_EMIT), np.float32)
    sh = np.zeros(N_EMIT, np.int32)
    col = 0
    for pl_, j, shifts in plan:
        w = pl_ * 11 + j
        for r in shifts:
            s[w, col] = 1.0
            sh[col] = int(r)
            col += 1
    assert col == N_EMIT
    m2p = np.zeros((310, 16), np.float32)
    for p in range(5):
        for j in range(24):
            m2p[p * 62 + j, p] = float(1 << (23 - j))  # syn112
            m2p[p * 62 + 24 + j, 5 + p] = float(1 << (23 - j))  # syn56
    return s, sh, m1p, m2p


def _align_windows(rows, off, ex_rows):
    """Rotate + bit-align each candidate's 5x19-word window -> (EX, 55)."""
    from .demod import WIN_PLANE_WORDS

    s = off & 255
    wrot = s >> 5
    sb = s & 31
    sw_pre = jnp.zeros((ex_rows, 60), jnp.int32)
    for r in range(8):
        sl = jnp.concatenate(
            [rows[:, p * WIN_PLANE_WORDS + r : p * WIN_PLANE_WORDS + r + 12]
             for p in range(5)],
            axis=1,
        )
        sw_pre = jnp.where(wrot == r, sl, sw_pre)
    lo = jnp.concatenate(
        [sw_pre[:, p * 12 : p * 12 + 11] for p in range(5)], axis=1
    )  # (EX, 55)
    hi = jnp.concatenate(
        [sw_pre[:, p * 12 + 1 : p * 12 + 12] for p in range(5)], axis=1
    )
    shl = (32 - sb) & 31
    sw = jax.lax.shift_right_logical(lo, sb) | jnp.where(
        sb == 0, 0, jnp.left_shift(hi, shl)
    )
    return sw, wrot, sb


def _corr_lanes(rows, wrot, sb, ex_rows):
    from .demod import WIN_CORR_BASE

    parts = []
    for c in range(3):
        wsel = jnp.zeros((ex_rows, 1), jnp.int32)
        for r in range(8):
            wsel = jnp.where(
                wrot == r,
                rows[:, WIN_CORR_BASE + c * 8 + r : WIN_CORR_BASE + c * 8 + r + 1],
                wsel,
            )
        parts.append(jax.lax.shift_right_logical(wsel, sb) & 1)
    return jnp.concatenate(parts, axis=1)  # (EX, 3)


def _extract_kernel_v2(
    off_ref, rows_ref, s_ref, sh_ref, m1_ref, m2_ref,
    tbl_ref, t112_ref, t56_ref, dfd_ref, out_ref,
):
    """v2 extract + classify; see the section comment above."""
    ex = rows_ref.shape[0]
    rows = rows_ref[:]
    off = off_ref[:]
    sw, wrot, sb = _align_windows(rows, off, ex)

    # selection matmuls: one 0/1 term per column, split into exact 8-bit
    # byte planes — bf16 carries ints < 256 exactly, and the TPU MXU's
    # default f32 path truncates inputs to bf16 (interpret mode does not:
    # a 16-bit split is bit-exact under interpretation but silently wrong
    # on hardware — caught by the r4 on-device parity run)
    sel = s_ref[:].astype(jnp.bfloat16)
    parts = []
    for sh8 in (0, 8, 16, 24):
        b8 = (jax.lax.shift_right_logical(sw, sh8) & 0xFF).astype(jnp.bfloat16)
        parts.append(
            jax.lax.dot(b8, sel, preferred_element_type=jnp.float32).astype(
                jnp.int32
            )
        )
    w560 = (
        parts[0] | (parts[1] << 8) | (parts[2] << 16) | (parts[3] << 24)
    )
    bits = (
        jax.lax.shift_right_logical(w560, jnp.broadcast_to(sh_ref[:], (ex, N_EMIT)))
        & 1
    ).astype(jnp.bfloat16)

    counts = jax.lax.dot(
        bits, m1_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # (EX, 310), exact integers < 256
    parity = (counts & 1).astype(jnp.bfloat16)
    syn = jax.lax.dot(
        parity, m2_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # (EX, 16)

    msg = jnp.concatenate(
        [counts[:, p * 62 + 48 : p * 62 + 62] for p in range(5)], axis=1
    )  # (EX, 70)
    corr = _corr_lanes(rows, wrot, sb, ex)

    flags = _classify_block(syn, counts, tbl_ref, t112_ref, t56_ref, dfd_ref, ex)
    out_ref[:] = jnp.concatenate(
        [syn[:, :10], msg, corr, flags, jnp.zeros((ex, 128 - 88), jnp.int32)],
        axis=1,
    )


def _classify_block(syn, counts, tbl_ref, t112_ref, t56_ref, dfd_ref, ex):
    """Fused gate classification (ops/gate.py score_gate semantics).

    dfd_ref lives in SMEM: Mosaic supports scalar reads there only
    (indices 0..4 = DF17-fixable deltas, 5..9 = matching df values,
    10 = nfix>0, 11 = fix_df enabled).  Returns (EX, 5) int32 flag
    bitmasks: 1 in_t112, 2 in_t56, 4 in_tbl, 8 fix_ok, 16 zero7.
    """
    flag_cols = []
    tbl = tbl_ref[:]  # (1, T) sentinel-padded known addresses
    t112 = t112_ref[:]  # (1, T112) sentinel-padded syndrome table
    t56 = t56_ref[:]
    have_fix = dfd_ref[11] != 0
    have_tab = dfd_ref[10] != 0
    for p in range(5):
        s112 = syn[:, p : p + 1]
        s56 = syn[:, 5 + p : 6 + p]
        b0 = counts[:, p * 62 + 48 : p * 62 + 49]
        df = jax.lax.shift_right_logical(b0, 3)
        in_t112 = have_tab & jnp.any(s112 == t112, axis=1, keepdims=True)
        in_t56 = have_tab & jnp.any(s56 == t56, axis=1, keepdims=True)
        resid = jnp.where(df >= 16, s112, s56) & 0xFFFFFF
        in_tbl = jnp.any(resid == tbl, axis=1, keepdims=True)
        fix_ok = jnp.zeros_like(in_t112)
        for i in range(5):
            fix_ok |= (df == dfd_ref[5 + i]) & (s112 == dfd_ref[i])
        fix_ok &= have_fix
        zero7 = jnp.zeros((ex, 1), jnp.int32)
        for b in range(7):
            zero7 = zero7 + counts[:, p * 62 + 48 + b : p * 62 + 49 + b]
        zero7 = zero7 == 0
        flag_cols.append(
            in_t112.astype(jnp.int32)
            | (in_t56.astype(jnp.int32) << 1)
            | (in_tbl.astype(jnp.int32) << 2)
            | (fix_ok.astype(jnp.int32) << 3)
            | (zero7.astype(jnp.int32) << 4)
        )
    return jnp.concatenate(flag_cols, axis=1)  # (EX, 5)


def _extract_kernel_v3(
    off_ref, rows_ref, m1_ref, m2_ref,
    tbl_ref, t112_ref, t56_ref, dfd_ref, out_ref,
):
    """v1's proven repeat-unpack extraction + the fused classifier.

    The r4 on-device ablation measured the v2 selection-matmul layout
    SLOWER than v1's pltpu.repeat unpack (10.4 ms vs 6.6 ms per 131k
    candidates), so the production kernel keeps the v1 datapath and only
    adds the classification block (which hoists the gate's K x 5 x |tbl|
    HBM-wide compares into VMEM).
    """
    ex = rows_ref.shape[0]
    rows = rows_ref[:]
    off = off_ref[:]
    sw, wrot, sb = _align_windows(rows, off, ex)

    lo = sw[:, :55]
    u = pltpu.repeat(lo, 32, axis=1)  # (EX, 1760): lane l = word l%55
    lane_bit = jax.lax.broadcasted_iota(jnp.int32, (ex, EX_BITS), 1) // 55
    bits = (jax.lax.shift_right_logical(u, lane_bit) & 1).astype(jnp.bfloat16)

    counts = jax.lax.dot(
        bits, m1_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # (EX, 320) exact integers < 256
    parity = (counts & 1).astype(jnp.bfloat16)
    syn = jax.lax.dot(
        parity, m2_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # (EX, 16)

    msg = jnp.concatenate(
        [counts[:, p * 62 + 48 : p * 62 + 62] for p in range(5)], axis=1
    )
    corr = _corr_lanes(rows, wrot, sb, ex)
    flags = _classify_block(syn, counts, tbl_ref, t112_ref, t56_ref, dfd_ref, ex)
    out_ref[:] = jnp.concatenate(
        [syn[:, :10], msg, corr, flags, jnp.zeros((ex, 128 - 88), jnp.int32)],
        axis=1,
    )


@functools.partial(
    jax.jit, static_argnames=("nfix", "fix_df", "ex_rows", "interpret")
)
def extract_classify_v3_pallas(
    rows: jax.Array,
    offsets: jax.Array,
    known_tbl: jax.Array,
    *,
    nfix: int = 1,
    fix_df: bool = True,
    ex_rows: int = EX_ROWS,
    interpret: bool = False,
) -> jax.Array:
    """v1 extraction datapath + fused gate classification (see
    _extract_kernel_v3).  Output layout matches extract_classify_pallas."""
    k = rows.shape[0]
    assert k % ex_rows == 0, (k, ex_rows)
    m1, m2 = _extract_mats()
    t112, t56, dfd = _gate_tables_np(nfix, fix_df)
    t = known_tbl.shape[0]
    assert t % 128 == 0, t
    return pl.pallas_call(
        _extract_kernel_v3,
        out_shape=jax.ShapeDtypeStruct((k, 128), jnp.int32),
        grid=(k // ex_rows,),
        in_specs=[
            pl.BlockSpec((ex_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ex_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((EX_BITS, 320), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((320, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t112.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t56.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (ex_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        offsets.reshape(k, 1),
        rows,
        jnp.asarray(m1, dtype=jnp.bfloat16),  # entries <= 128: bf16-exact
        jnp.asarray(m2, dtype=jnp.bfloat16),  # powers of two: bf16-exact
        known_tbl.reshape(1, t),
        jnp.asarray(t112).reshape(1, -1),
        jnp.asarray(t56).reshape(1, -1),
        jnp.asarray(dfd[:16]),
    )


@functools.lru_cache(maxsize=None)
def _gate_tables_np(nfix: int, fix_df: bool):
    """Padded device tables for the fused classifier (sentinel 0x2000000)."""
    from .gate import _df_delta_np, _table_syndromes_np

    sent = 0x2000000  # > any syndrome/residual

    def padded(a):
        n = max(128, ((len(a) + 127) // 128) * 128)
        out = np.full(n, sent, np.int32)
        out[: len(a)] = a
        return out

    if nfix > 0:
        t112 = padded(_table_syndromes_np(112, nfix))
        t56 = padded(_table_syndromes_np(56, nfix))
    else:
        t112 = np.full(128, sent, np.int32)
        t56 = np.full(128, sent, np.int32)
    dfd = np.full(128, sent, np.int32)
    deltas = _df_delta_np()
    for i, d in enumerate((1, 25, 21, 19, 16)):
        dfd[i] = int(deltas[d])
        dfd[5 + i] = d
    dfd[10] = 1 if nfix > 0 else 0
    dfd[11] = 1 if (fix_df and nfix > 0) else 0
    return t112, t56, dfd


@functools.partial(
    jax.jit, static_argnames=("nfix", "fix_df", "ex_rows", "interpret")
)
def extract_classify_pallas(
    rows: jax.Array,
    offsets: jax.Array,
    known_tbl: jax.Array,
    *,
    nfix: int = 1,
    fix_df: bool = True,
    ex_rows: int = EX2_ROWS,
    interpret: bool = False,
) -> jax.Array:
    """(K,128) win rows + offsets + known-ICAO table -> (K,128) results.

    Lanes 0:5 syn112, 5:10 syn56, 10:80 msg bytes (phase-major), 80:83
    correlation bits, 83:88 per-phase classifier flags (see section
    comment).  K must be a multiple of ex_rows.
    """
    k = rows.shape[0]
    assert k % ex_rows == 0, (k, ex_rows)
    s, sh, m1p, m2p = _extract_v2_mats()
    t112, t56, dfd = _gate_tables_np(nfix, fix_df)
    t = known_tbl.shape[0]
    assert t % 128 == 0, t
    return pl.pallas_call(
        _extract_kernel_v2,
        out_shape=jax.ShapeDtypeStruct((k, 128), jnp.int32),
        grid=(k // ex_rows,),
        in_specs=[
            pl.BlockSpec((ex_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ex_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((55, N_EMIT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_EMIT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_EMIT, 310), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((310, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t112.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t56.shape[0]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (ex_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        # the 1024-row step peaks ~40 MB of scoped VMEM (v5e has 128 MB);
        # the default 16 MB scope is a compile-time limit, not hardware
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        offsets.reshape(k, 1),
        rows,
        jnp.asarray(s),
        jnp.asarray(sh).reshape(1, N_EMIT),
        jnp.asarray(m1p, dtype=jnp.bfloat16),  # entries <= 128: bf16-exact
        jnp.asarray(m2p, dtype=jnp.bfloat16),  # powers of two: bf16-exact
        known_tbl.reshape(1, t),
        jnp.asarray(t112).reshape(1, -1),
        jnp.asarray(t56).reshape(1, -1),
        jnp.asarray(dfd[:16]),
    )


def supported() -> bool:
    """True when the native Mosaic path is available (a real TPU backend),
    or when INTERPRET forces the interpreter path (CPU dryrun/testing)."""
    if INTERPRET:
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def mag_uc8_pallas(iq: jax.Array, *, interpret: bool = False) -> jax.Array:
    """UC8 interleaved bytes (2N,) uint8 -> (N,) uint16 magnitudes.

    Bit-exact with ops.convert.mag_uc8 (the 64k LUT; exhaustive test in
    tests/test_pallas.py); requires N % (ROWS_PER_STEP * 128) == 0 — the
    pipeline's superblocks are.  interpret=True runs the Mosaic
    interpreter (CPU testing).
    """
    n = iq.shape[0] // 2
    assert n % (ROWS_PER_STEP * LANES) == 0, n
    words = jax.lax.bitcast_convert_type(
        iq.reshape(n, 2), jnp.uint16
    ).reshape(n // LANES, LANES)
    grid = (n // (ROWS_PER_STEP * LANES),)
    out = pl.pallas_call(
        _uc8_kernel,
        out_shape=jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ROWS_PER_STEP, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (ROWS_PER_STEP, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(jnp.asarray(_sq_table_np()).reshape(1, LANES), words)
    return out.reshape(-1)
