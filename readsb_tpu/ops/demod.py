"""2.4 MS/s Mode-S demodulation as a dense TPU batch pipeline.

Design (TPU-first, not a port of the reference's sample-serial scan):

  stage 1  dense per-offset preamble pre-check + 3 correlation lanes
           over the whole block (VPU elementwise; ~20 ops/sample)
  stage 2  dense 5-kernel slicer *sign planes* over the whole block,
           bit-packed into int32 words (32 samples/word).  All candidate
           bit-slicing becomes cheap bit lookups into these planes.
  stage 3  compaction of the sparse candidate set to a fixed-K index
           vector via cumsum + scatter (static shapes; ~800x faster than
           jnp.nonzero's lowering on TPU)
  stage 4  per candidate: gather 11 *contiguous* packed words per plane
           (tiny, contiguous, VMEM-friendly — the key redesign vs a
           (K, 320)-sample window gather), then extract 5 phases x 112
           bits with vectorized variable shifts
  stage 5  CRC-24 syndromes + message-byte packing of all K x 5 sliced
           messages as ONE bf16 MXU matmul (exact: 0/1 inputs, integer
           weights, all sums < 256, f32 accumulation)
  stage 6  signal power via exact split hi/lo int32 prefix sums + 2-point
           lookups (no per-sample gather; exact uint48 arithmetic)
  stage 7  (host or native) serial scoring / non-max suppression with the
           ICAO-filter feedback, which is inherently sequential but tiny

Numerology is bit-exact with the reference demodulator so decoded frames
can be diffed frame-for-frame (wiedehopf/readsb demod_2400.c):
- pre-check pa[1]>pa[7] && pa[12]>pa[14] && pa[12]>pa[15] (demod_2400.c:311)
- noise = pa[5]+pa[8]+pa[16]+pa[17]+pa[18]; ref = noise*T>>5 (330-340)
- 3 correlations firing 5 phase hypotheses (344-378)
- 5 slicer kernels / byte schedule, 19/19/19/19/20 stride (74-93,133-213)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    MODES_LONG_MSG_BITS,
    PREAMBLE_THRESHOLD_DEFAULT,
    TRAILING_SAMPLES,
)
from . import crc as crc_ops

# ---------------------------------------------------------------------------
# Static slicer schedule (derived from the reference's slice_byte walk)
# ---------------------------------------------------------------------------

# 3/4-tap integer slicer kernels, index = sub-sample phase (demod_2400.c:74-93)
_KERNELS = {
    0: (18, -15, -3, 0),
    1: (14, -5, -9, 0),
    2: (16, 5, -20, 0),
    3: (7, 11, -18, 0),
    4: (4, 15, -20, 1),
}

# per-phase byte schedule: (sample offset within byte window, kernel id)
# and the pointer advance to the next byte (demod_2400.c:133-213)
_BYTE_SCHED = {
    0: ([(0, 0), (2, 2), (4, 4), (7, 1), (9, 3), (12, 0), (14, 2), (16, 4)], 19),
    1: ([(0, 1), (2, 3), (5, 0), (7, 2), (9, 4), (12, 1), (14, 3), (17, 0)], 19),
    2: ([(0, 2), (2, 4), (5, 1), (7, 3), (10, 0), (12, 2), (14, 4), (17, 1)], 19),
    3: ([(0, 3), (3, 0), (5, 2), (7, 4), (10, 1), (12, 3), (15, 0), (17, 2)], 19),
    4: ([(0, 4), (3, 1), (5, 3), (8, 0), (10, 2), (12, 4), (15, 1), (17, 3)], 20),
}

NUM_PHASES = 5  # try_phase 4..8
# Fused single-kernel demod (ops/fused.py): dense scan + in-tile
# compaction + extract in one Pallas pass.  Off by default until the
# on-device timing says it beats the staged path (r5).
USE_FUSED = False
MAX_TAPS = 4
SLICE_WINDOW = 320  # max sample offset read by any tap, padded
WORDS_PER_CAND = 11  # ceil((31 + SLICE_WINDOW) / 32) words cover any window
SIG_LONG = 112 * 12 // 5  # 268 samples of message body (demod_2400.c:436)
SIG_SHORT = 56 * 12 // 5  # 134


@functools.lru_cache(maxsize=None)
def slicer_tables() -> tuple[np.ndarray, np.ndarray]:
    """(OFF, COEF): int32[5, 112, 4] absolute sample offsets & coefficients.

    Row p corresponds to try_phase = p + 4.  Offsets are relative to the
    candidate (preamble start) sample.
    """
    off = np.zeros((NUM_PHASES, MODES_LONG_MSG_BITS, MAX_TAPS), dtype=np.int32)
    coef = np.zeros((NUM_PHASES, MODES_LONG_MSG_BITS, MAX_TAPS), dtype=np.int32)
    for p in range(NUM_PHASES):
        try_phase = p + 4
        ptr = 19 + try_phase // 5
        phase = try_phase % 5
        bit = 0
        for _byte in range(MODES_LONG_MSG_BITS // 8):
            sched, adv = _BYTE_SCHED[phase]
            for boff, kid in sched:
                taps = _KERNELS[kid]
                for t in range(MAX_TAPS):
                    off[p, bit, t] = ptr + boff + t
                    coef[p, bit, t] = taps[t]
                bit += 1
            ptr += adv
            phase = (phase + 1) % 5
    assert off.max() < SLICE_WINDOW
    return off, coef


@functools.lru_cache(maxsize=None)
def lattice_tables() -> tuple[np.ndarray, np.ndarray]:
    """(AOFF, KID): int32[5, 112] base sample offset & kernel id per bit.

    bit(o, p, b) = sign_plane[KID[p,b]][o + AOFF[p,b]] — the sign-plane
    reformulation of the tap schedule above.
    """
    aoff = np.zeros((NUM_PHASES, MODES_LONG_MSG_BITS), dtype=np.int32)
    kid = np.zeros((NUM_PHASES, MODES_LONG_MSG_BITS), dtype=np.int32)
    for p in range(NUM_PHASES):
        try_phase = p + 4
        ptr = 19 + try_phase // 5
        phase = try_phase % 5
        bit = 0
        for _byte in range(MODES_LONG_MSG_BITS // 8):
            sched, adv = _BYTE_SCHED[phase]
            for boff, k in sched:
                aoff[p, bit] = ptr + boff
                kid[p, bit] = k
                bit += 1
            ptr += adv
            phase = (phase + 1) % 5
    return aoff, kid


@functools.lru_cache(maxsize=None)
def _combined_matrix() -> np.ndarray:
    """f32[112, 62]: columns 0:24 CRC-112 parity, 24:48 CRC-56 parity
    (over the first 56 bits only), 48:62 MSB-first byte-packing weights.

    All matrix entries are small ints; with 0/1 bf16 inputs every dot
    product is an exact integer < 256, so one MXU matmul computes raw
    syndrome bit-sums and message bytes simultaneously.
    """
    m112 = np.asarray(crc_ops.syndrome_matrix(112), dtype=np.float32)  # (112,24)
    m56 = np.asarray(crc_ops.syndrome_matrix(56), dtype=np.float32)  # (56,24)
    pack = np.zeros((112, 14), dtype=np.float32)
    for b in range(112):
        pack[b, b // 8] = float(128 >> (b % 8))
    out = np.zeros((112, 62), dtype=np.float32)
    out[:, 0:24] = m112
    out[:56, 24:48] = m56
    out[:, 48:62] = pack
    return out


# Candidate "win rows": per 256-sample block v, one 128-lane int32 row
# holding everything any candidate in that block needs —
#   lanes  0..94   five slicer sign planes x 19 packed words
#                  (words 8v..8v+18; a 574-bit reach covers offset&255 in
#                  [0,256) plus the 320-sample slicer window)
#   lanes 95..118  three correlation-lane bitplanes x 8 packed words
#   lanes 119..127 zero padding
# Stage 4 then needs exactly ONE dynamic gather (whole rows, the layout
# TPUs stream well) instead of per-candidate scalar word gathers, which
# are latency-bound on TPU (~0.27 us/candidate, the round-2 hot spot).
WIN_PLANE_WORDS = 19
WIN_CORR_BASE = 95


@functools.lru_cache(maxsize=None)
def _extract_plan():
    """Static pick schedule + permuted matmul matrix for stage 4/5.

    After a candidate's win row is word-rotated and bit-shifted by
    (offset & 255), every slicer bit lives at a STATIC (plane, word,
    bitshift) position.  Bits are emitted grouped by (plane, word) —
    a pure broadcast-shift per group, no gather — in a permuted column
    order, and the permutation is folded into the combined CRC/byte-pack
    matrix so the matmul outputs are unchanged.

    Returns (plan, m) where plan = [(plane, word_j, shifts int32[g])...]
    in emission order and m = f32[560, 310] with column block
    p*62:(p+1)*62 equal to _combined_matrix rows for phase p's bits.
    """
    aoff, kid = lattice_tables()
    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for p in range(NUM_PHASES):
        for b in range(MODES_LONG_MSG_BITS):
            pl_ = int(kid[p, b])
            j = int(aoff[p, b]) >> 5
            r = int(aoff[p, b]) & 31
            groups.setdefault((pl_, j), []).append((r, p * MODES_LONG_MSG_BITS + b))
    plan = []
    perm = []
    for key in sorted(groups):
        items = groups[key]
        plan.append((key[0], key[1], np.array([r for r, _ in items], np.int32)))
        perm.extend(c for _, c in items)
    comb = _combined_matrix()  # (112, 62)
    m = np.zeros((NUM_PHASES * MODES_LONG_MSG_BITS, NUM_PHASES * 62), np.float32)
    for row, col in enumerate(perm):
        p, b = divmod(col, MODES_LONG_MSG_BITS)
        m[row, p * 62 : (p + 1) * 62] = comb[b]
    return plan, m


def _dense_stages_jnp(buf: jax.Array, threshold: jax.Array | int):
    """Pure-jnp dense scan (CPU parity path; the TPU path is the fused
    Pallas kernel in ops.pallas_kernels — bit-identical, see
    tests/test_pallas.py).

    Returns (corrbits int8[n], pwords int32[5, >=n//32], cs_hi, cs_lo)
    where n >= buf length and corrbits bit0..2 = correlation A/B/C fired,
    bit3 = pre-check AND any correlation (a candidate).
    """
    m = buf.astype(jnp.int32)
    total = buf.shape[0]
    scan = total - 19  # correlations read up to +18

    def at(i):
        return jax.lax.dynamic_slice_in_dim(m, i, scan)

    p1, p2, p3, p4, p5 = at(1), at(2), at(3), at(4), at(5)
    p7, p8, p9, p10, p11 = at(7), at(8), at(9), at(10), at(11)
    p12, p14, p15, p16, p17, p18 = at(12), at(14), at(15), at(16), at(17), at(18)

    pre = (p1 > p7) & (p12 > p14) & (p12 > p15)
    base_noise = p5 + p8 + p16 + p17 + p18
    ref_level = (base_noise * threshold) >> 5
    d23 = p2 - p3
    s14 = p1 + p4
    d1011 = p10 - p11
    common = s14 - d23 + p9 + p12
    corr_a = (common - d1011) >= ref_level  # phases 4, 5
    corr_b = (common + d1011) >= ref_level  # phases 6, 7
    corr_c = (s14 + 2 * d23 + d1011 + p12) >= ref_level  # phase 8
    cand = pre & (corr_a | corr_b | corr_c)
    corrbits = (
        corr_a.astype(jnp.int32)
        | (corr_b.astype(jnp.int32) << 1)
        | (corr_c.astype(jnp.int32) << 2)
        | (cand.astype(jnp.int32) << 3)
    ).astype(jnp.int8)
    corrbits = jnp.pad(corrbits, (0, 19))

    def shifted(i, n):
        return jax.lax.dynamic_slice_in_dim(m, i, n)

    plane_len = total - MAX_TAPS
    nwords = (plane_len // 32) + WORDS_PER_CAND + 2
    s0 = shifted(0, plane_len)
    s1 = shifted(1, plane_len)
    s2 = shifted(2, plane_len)
    s3 = shifted(3, plane_len)
    planes = jnp.stack(
        [
            (18 * s0 - 15 * s1 - 3 * s2) > 0,
            (14 * s0 - 5 * s1 - 9 * s2) > 0,
            (16 * s0 + 5 * s1 - 20 * s2) > 0,
            (7 * s0 + 11 * s1 - 18 * s2) > 0,
            (4 * s0 + 15 * s1 - 20 * s2 + s3) > 0,
        ]
    )
    planes = jnp.pad(planes, ((0, 0), (0, nwords * 32 - plane_len)))
    pwords = _pack_plane_words(planes)

    mu = buf.astype(jnp.uint32)
    sq = mu * mu  # exact in uint32 (m < 2^16)
    sq_hi = (sq >> jnp.uint32(16)).astype(jnp.int32)
    sq_lo = (sq & jnp.uint32(0xFFFF)).astype(jnp.int32)
    cs_hi = jnp.cumsum(sq_hi)  # wraparound-exact
    cs_lo = jnp.cumsum(sq_lo)
    return corrbits, pwords, cs_hi, cs_lo


_COMPACT_BLK = 256  # samples per local compaction block


def _compact_two_level(cand: jax.Array, k: int, l: int, scan_len: int):
    """Compact the candidate mask to k ascending offsets (sentinel scan_len).

    Two-level design (TPU-friendly, no large scatter):
      1. reshape the mask to (NB, 256) blocks; exclusive prefix within each
         block via a triangular f32 matmul on the MXU (exact: sums < 2^24)
      2. per-block candidate offsets via a one-hot contraction, capacity l
      3. global rank -> block map via an NB-sized scatter + cummax
      4. offsets[rank] = block * 256 + local_off[block, rank - block_start]

    Returns (offsets int32[k], max_local int32[]) — max_local > l means a
    block overflowed its local capacity and the caller must retry with a
    larger l (mirrors the k-overflow escalation).
    """
    blk = _COMPACT_BLK
    nb = (scan_len + blk - 1) // blk
    pad = nb * blk - scan_len
    c2 = jnp.pad(cand, (0, pad)).reshape(nb, blk)
    cf = c2.astype(jnp.bfloat16)  # 0/1: exact; sums < 256: exact in f32 accum

    tri = jnp.asarray(
        np.tril(np.ones((blk, blk), np.float32), -1), dtype=jnp.bfloat16
    )  # tri[i, j] = 1 for j < i
    local_excl = jax.lax.dot(
        cf, tri.T, preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # (nb, blk) exclusive prefix
    counts = jnp.sum(c2, axis=1, dtype=jnp.int32)  # (nb,)
    block_excl = jnp.cumsum(counts) - counts  # (nb,) exclusive

    # rank -> block map: scatter block starts, then cummax fills the gaps
    starts = jnp.zeros(k + 1, jnp.int32)
    starts = starts.at[jnp.minimum(block_excl, k)].max(
        jnp.arange(nb, dtype=jnp.int32), mode="drop"
    )
    blk_of_rank = jax.lax.cummax(starts[:k])  # (k,)

    # per-block compacted local offsets, capacity l.  The one-hot has at
    # most one 1 per (block, rank) column, so every output is a single
    # product i * 1 with i < 256 — exact in bf16.  (A masked where+sum
    # formulation measured ~1.2 ms SLOWER on-device in r5 session D —
    # the MXU contraction beats the fused VPU reduction here.)
    j_iota = jnp.arange(l, dtype=jnp.int32)
    onehot = (
        (local_excl[:, :, None] == j_iota[None, None, :]) & c2[:, :, None]
    ).astype(jnp.bfloat16)  # (nb, blk, l)
    i_iota = jnp.arange(blk, dtype=jnp.bfloat16)
    local_off = jnp.einsum(
        "bil,i->bl", onehot, i_iota, preferred_element_type=jnp.float32
    ).astype(jnp.int32)

    rank = jnp.arange(k, dtype=jnp.int32)
    local_rank = rank - block_excl[blk_of_rank]
    off = local_off[blk_of_rank, jnp.minimum(local_rank, l - 1)]
    total = jnp.sum(counts)
    offsets = jnp.where(rank < total, blk_of_rank * blk + off, scan_len)
    # padding region never produces candidates (cand comes from a scan_len
    # slice), so offsets < scan_len for all real ranks.
    return offsets, jnp.max(counts)


def _compact_two_level_sort(cand: jax.Array, k: int, l: int, scan_len: int):
    """Sort-based variant of _compact_two_level: per-block candidate
    offsets via one lax.sort of (offset-or-sentinel) keys instead of the
    triangular matmul + one-hot contraction.  Bit-identical outputs
    (tests/test_demod.py::test_compaction_variants_equal)."""
    blk = _COMPACT_BLK
    nb = (scan_len + blk - 1) // blk
    pad = nb * blk - scan_len
    c2 = jnp.pad(cand, (0, pad)).reshape(nb, blk)
    i_iota = jnp.arange(blk, dtype=jnp.int32)
    key = jnp.where(c2, i_iota[None, :], jnp.int32(blk))
    skey = jnp.sort(key, axis=1)[:, :l]  # ascending candidate offsets
    counts = jnp.sum(c2, axis=1, dtype=jnp.int32)
    block_excl = jnp.cumsum(counts) - counts
    starts = jnp.zeros(k + 1, jnp.int32)
    starts = starts.at[jnp.minimum(block_excl, k)].max(
        jnp.arange(nb, dtype=jnp.int32), mode="drop"
    )
    blk_of_rank = jax.lax.cummax(starts[:k])
    rank = jnp.arange(k, dtype=jnp.int32)
    local_rank = rank - block_excl[blk_of_rank]
    off = skey[blk_of_rank, jnp.minimum(local_rank, l - 1)]
    total = jnp.sum(counts)
    offsets = jnp.where(rank < total, blk_of_rank * blk + off, scan_len)
    return offsets, jnp.max(counts)


def _compact_topk(cand: jax.Array, k: int, l: int, scan_len: int):
    """Gather-free compaction: one lax.top_k over inverted offset keys.

    The two-level variants end in a (K,)-sized random gather
    (skey[blk_of_rank, local_rank]) that is latency-bound on TPU (the
    measured ~3.4 ms marginal cost of the stage); top_k produces the
    ascending candidate offsets directly.  max_local is reported as 0
    (no per-block capacity exists in this formulation).
    """
    pos = jnp.arange(scan_len, dtype=jnp.int32)
    key = jnp.where(cand, scan_len - pos, 0)
    vals = jax.lax.top_k(key, k)[0]  # descending keys = ascending offsets
    offsets = jnp.where(vals > 0, scan_len - vals, scan_len)
    return offsets, jnp.int32(0)


class BlockCandidates(NamedTuple):
    """Device outputs of one demodulated block (fixed-size, K candidates)."""

    offsets: jax.Array  # int32[K] scan offsets (ascending; == sentinel when unused)
    n_cand: jax.Array  # int32[] true candidate count (may exceed K => overflow)
    max_local: jax.Array  # int32[] max candidates in any 256-sample block
    #   (> the static l capacity => offsets invalid, retry with larger l)
    corr_fired: jax.Array  # bool[K, 3] which correlation lanes fired (A, B, C)
    msg: jax.Array  # uint8[K, 5, 14] sliced message bytes per try_phase
    syn112: jax.Array  # int32[K, 5] CRC syndrome over 112 bits
    syn56: jax.Array  # int32[K, 5] CRC syndrome over first 56 bits
    sig_long: jax.Array  # int32[K, 2] (hi, lo) exact split sum of mag^2, 268 samples
    sig_short: jax.Array  # int32[K, 2] (hi, lo) over the first 134 samples
    # fused-classifier flags (extract_classify_pallas lanes 83:88), or None:
    # per-phase bitmask 1=in_t112 2=in_t56 4=in_tbl 8=fix_ok 16=zero7
    flags: jax.Array | None = None
    # fused-kernel path (ops/fused.py): per-row live mask (sentinel rows
    # carry tile-end offsets to keep the list nondecreasing) and an
    # overflow scalar (>0 => per-tile or per-row capacity exceeded; the
    # caller must redo the block via the staged path)
    live: jax.Array | None = None
    fused_overflow: jax.Array | None = None

    @property
    def sigsum_long(self) -> np.ndarray:
        """Exact f64 sum of mag^2 over the long message body (host-side)."""
        s = np.asarray(self.sig_long, dtype=np.int64)
        return ((s[:, 0] << 16) + s[:, 1]).astype(np.float64)

    @property
    def sigsum_short(self) -> np.ndarray:
        s = np.asarray(self.sig_short, dtype=np.int64)
        return ((s[:, 0] << 16) + s[:, 1]).astype(np.float64)


def _pack_plane_words(planes: jax.Array) -> jax.Array:
    """bool[5, L] -> int32[5, W] little-endian bit packing (bit j of word w
    = plane value at sample 32*w + j)."""
    nplane, length = planes.shape
    nwords = length // 32
    b = planes[:, : nwords * 32].reshape(nplane, nwords, 32).astype(jnp.int32)
    shifted = b << jnp.arange(32, dtype=jnp.int32)[None, None, :]
    return jnp.sum(shifted, axis=-1)  # exact: disjoint bits


def win_rows(corrbits: jax.Array, pwords: jax.Array, scan_len: int):
    """Build the (nv, 128) candidate win rows (see stage-4 layout note).

    Per 256-sample block v: lanes 0..94 = five slicer planes x 19 packed
    words, 95..118 = three correlation bitplanes x 8 words, rest zero.
    Pure reshapes/concats — no gather.
    """
    nv = (scan_len + 255) // 256
    need = 8 * nv + WIN_PLANE_WORDS
    nw = pwords.shape[1]
    pw = jnp.pad(pwords, ((0, 0), (0, need - nw))) if nw < need else pwords
    a = pw[:, : 8 * nv].reshape(5, nv, 8)
    b = pw[:, 8 : 8 * nv + 8].reshape(5, nv, 8)
    c3 = pw[:, 16 : 8 * nv + 16].reshape(5, nv, 8)[..., :3]
    wp = jnp.concatenate([a, b, c3], axis=-1)  # (5, nv, 19)
    wp = jnp.transpose(wp, (1, 0, 2)).reshape(nv, 5 * WIN_PLANE_WORDS)

    clen = 256 * nv
    cpad = corrbits
    if cpad.shape[0] < clen:
        cpad = jnp.pad(cpad, (0, clen - cpad.shape[0]))
    cpad = cpad[:clen].astype(jnp.int32)
    cpl = jnp.stack([((cpad >> i) & 1) != 0 for i in range(3)])  # (3, clen)
    cw = _pack_plane_words(cpl).reshape(3, nv, 8)
    cw3 = jnp.transpose(cw, (1, 0, 2)).reshape(nv, 24)

    win = jnp.concatenate(
        [wp, cw3, jnp.zeros((nv, 128 - WIN_CORR_BASE - 24), jnp.int32)], axis=1
    )  # (nv, 128)
    return win, nv


def window_sums(offsets, cs_hi, cs_lo):
    """Exact split hi/lo mag^2 sums over the long/short message bodies.

    Returns (sig_long, sig_short) int32[K, 2] from the dense stage's
    wraparound-exact prefix sums (demod_2400.c:436-457 accounting).

    Lookups go through 128-lane ROW gathers + an in-lane dynamic select:
    TPU element gathers are latency-bound (~0.27 us each — the naive
    cs[idx] form measured 3.4 ms/superblock in the r5 session-B gate
    ablation), while row gathers DMA whole vregs.
    """
    n = cs_hi.shape[0]
    rows = n // 128
    h2 = cs_hi[: rows * 128].reshape(rows, 128)
    l2 = cs_lo[: rows * 128].reshape(rows, 128)

    def at(idx):
        idx = jnp.minimum(idx, rows * 128 - 1)
        r = idx >> 7
        c = (idx & 127)[:, None]
        h = jnp.take_along_axis(h2[r], c, axis=1)[:, 0]
        lo = jnp.take_along_axis(l2[r], c, axis=1)[:, 0]
        return h, lo

    def wsum(a, b):
        # sum over samples [offset+a, offset+b) per candidate (a >= 1)
        ha, la = at(offsets + (a - 1))
        hb, lb = at(offsets + (b - 1))
        return jnp.stack([hb - ha, lb - la], axis=-1)

    return wsum(19, 19 + SIG_LONG), wsum(19, 19 + SIG_SHORT)


def _demod_core(
    buf: jax.Array,
    threshold: jax.Array | int,
    *,
    k: int,
    scan_len: int,
    l: int,
    seg_stride: int | None = None,
    seg_valid: int | None = None,
    raw_uc8: bool = False,
    known_tbl: jax.Array | None = None,
    nfix: int = 1,
    fix_df: bool = True,
    force_staged: bool = False,
):
    """Stages 1-5 of the demodulator (everything except signal power).

    known_tbl (sentinel-padded known-ICAO addresses): when given and the
    Pallas path is live, stage 4/5 runs the fused extract+classify kernel
    and the returned BlockCandidates carries per-phase classifier flags
    (consumed by ops.gate.score_gate, which then skips its own HBM-wide
    membership compares).

    raw_uc8=True: buf is uint16 IQ *words* (one interleaved uc8 pair per
    element) and the fused convert+dense Pallas kernel runs — the
    magnitude array never exists in HBM.  TPU-only (the CPU parity path
    converts first).

    Returns (BlockCandidates with zeroed sig fields, cs_hi, cs_lo); the
    callers attach signal sums where they need them — demod_block for all
    K candidates (CPU parity path), the score gate only for kept rows.

    seg_stride/seg_valid (static): channel-batched layout.  The buffer is
    C concatenated channel segments of seg_stride samples, each laid out
    [326-sample carried overlap][seg_valid samples][>=186 zero samples];
    scan positions with (offset % seg_stride) >= seg_valid are masked off
    so no candidate window ever crosses a channel seam.  Candidate
    offsets stay global (channel = offset // seg_stride).  This is the
    second, embarrassingly parallel batch axis (SURVEY 2.5): one compiled
    program demodulates all virtual receiver channels per dispatch.
    """
    assert buf.shape[0] >= scan_len + SLICE_WINDOW
    if seg_stride is not None:
        assert seg_valid is not None and seg_stride >= seg_valid + TRAILING_SAMPLES
        assert scan_len % seg_stride == 0

    # --- stages 1/2/6a: dense scan (fused Pallas kernel on TPU) -------------
    from . import pallas_kernels

    if USE_FUSED and not force_staged and (pallas_kernels.supported() or raw_uc8):
        from .fused import TILE as _FTILE
        from .fused import L_ROW, fused_demod_tiles

        if raw_uc8:
            mag = pallas_kernels.mag_uc8_pallas(
                buf, interpret=pallas_kernels.INTERPRET
            )
        else:
            mag = buf
        padded = ((scan_len + _FTILE - 1) // _FTILE) * _FTILE
        magp = jnp.pad(mag, (0, max(0, padded - mag.shape[0])))[:padded]
        ntiles = padded // _FTILE
        cap = max(128, k // ntiles)
        comb, offsets, live, meta, cs_hi, cs_lo = fused_demod_tiles(
            magp, threshold, cap=cap, seg_stride=seg_stride,
            seg_valid=seg_valid, scan_limit=scan_len,
            interpret=pallas_kernels.INTERPRET,
        )
        kf = ntiles * cap
        n_cand = jnp.sum(meta[:, 0])
        overflow = jnp.maximum(
            jnp.max(meta[:, 0]) - cap, jnp.max(meta[:, 2]) - L_ROW
        )
        syn112 = comb[:, 0:5]
        syn56 = comb[:, 5:10]
        msg = comb[:, 10:80].reshape(kf, NUM_PHASES, 14).astype(jnp.uint8)
        corr_fired = (comb[:, 80:83] != 0) & live[:, None]
        zeros2 = jnp.zeros((kf, 2), jnp.int32)
        bc = BlockCandidates(
            offsets=offsets, n_cand=n_cand, max_local=jnp.max(meta[:, 1]),
            corr_fired=corr_fired, msg=msg, syn112=syn112, syn56=syn56,
            sig_long=zeros2, sig_short=zeros2, live=live,
            fused_overflow=overflow,
        )
        return bc, cs_hi, cs_lo

    if raw_uc8:
        # pad with >= 512 extra zero words: the final tile's synthetic
        # halo converts to loud magnitudes, so it must sit beyond every
        # candidate window (dense_scan_uc8_pallas docstring)
        tile = pallas_kernels.DENSE_ROWS * pallas_kernels.LANES
        padded = ((buf.shape[0] + 512 + tile - 1) // tile) * tile
        bufp = jnp.pad(buf, (0, padded - buf.shape[0]))
        corrbits, pwords, cs_hi, cs_lo = pallas_kernels.dense_scan_uc8_pallas(
            bufp, threshold, interpret=pallas_kernels.INTERPRET
        )
    elif pallas_kernels.supported():
        tile = pallas_kernels.DENSE_ROWS * pallas_kernels.LANES
        padded = ((buf.shape[0] + tile - 1) // tile) * tile
        bufp = jnp.pad(buf, (0, padded - buf.shape[0]))
        corrbits, pwords, cs_hi, cs_lo = pallas_kernels.dense_scan_pallas(
            bufp, threshold, interpret=pallas_kernels.INTERPRET
        )
    else:
        corrbits, pwords, cs_hi, cs_lo = _dense_stages_jnp(buf, threshold)

    cbits = corrbits[:scan_len]
    cand = (cbits & 8) != 0
    if seg_stride is not None:
        pos = jnp.arange(scan_len, dtype=jnp.int32)
        cand = cand & ((pos % seg_stride) < seg_valid)
    n_cand = jnp.sum(cand.astype(jnp.int32))

    # --- stage 3: two-level compaction (no big scatter) ----------------------
    # TPU scatter over the 2M-sample mask costs ~10 ms; instead compact
    # hierarchically: per 256-sample block, rank candidates with an
    # exclusive-prefix triangular matmul (exact in f32: counts < 2^24),
    # select per-block candidate offsets with a one-hot contraction, then
    # map global rank -> block via a tiny scatter + cummax.
    offsets, max_local = _compact_two_level(cand, k, l, scan_len)
    offsets = jax.lax.optimization_barrier(offsets)

    # --- stage 4a: build win rows (dense reshapes, no gather) ---------------
    win, nv = win_rows(corrbits, pwords, scan_len)
    win = jax.lax.optimization_barrier(win)

    # --- stage 4b: ONE row gather + static extraction ------------------------
    v_idx = jnp.clip(offsets >> 8, 0, nv - 1)
    rows = win[v_idx]  # (K, 128) — whole-row gather, the TPU-friendly shape
    rows = jax.lax.optimization_barrier(rows)

    from . import pallas_kernels as pk

    use_v3 = (
        known_tbl is not None
        and (pk.supported() or raw_uc8)
        and k % pk.EX_ROWS == 0
        and known_tbl.shape[0] % 128 == 0
    )
    if use_v3:
        # fused Pallas extract + gate classification (v3 = the v1 unpack
        # datapath + in-kernel classify): intermediates never leave VMEM
        # and the gate's membership compares ride along
        comb = pk.extract_classify_v3_pallas(
            rows, offsets, known_tbl, nfix=nfix, fix_df=fix_df,
            interpret=pk.INTERPRET,
        )
        flags = comb[:, 83:88]
    elif (pk.supported() or raw_uc8) and k % pk.EX_ROWS == 0:
        # fused Pallas extraction: intermediates never leave VMEM
        comb = pk.extract_syndromes_pallas(rows, offsets, interpret=pk.INTERPRET)
        flags = None
    else:
        comb = None
    if comb is not None:
        syn112 = comb[:, 0:5]
        syn56 = comb[:, 5:10]
        msg = comb[:, 10:80].reshape(k, NUM_PHASES, 14).astype(jnp.uint8)
        corr_fired = (comb[:, 80:83] != 0) & (offsets < scan_len)[:, None]
        zeros2 = jnp.zeros((k, 2), jnp.int32)
        bc = BlockCandidates(
            offsets=offsets, n_cand=n_cand, max_local=max_local,
            corr_fired=corr_fired, msg=msg, syn112=syn112, syn56=syn56,
            sig_long=zeros2, sig_short=zeros2, flags=flags,
        )
        return bc, cs_hi, cs_lo

    s = offsets & 255
    wrot = s >> 5  # 0..7: word rotation within the 19-word windows
    sb = s & 31  # residual bit shift

    # align each candidate's window: sw[k, p, j] = plane bits
    # [off + 32j, off + 32j + 32) of plane p, j = 0..10
    sw_pre = jnp.zeros((k, 5, 12), jnp.int32)
    for r in range(8):
        sl = jnp.stack(
            [rows[:, p * WIN_PLANE_WORDS + r : p * WIN_PLANE_WORDS + r + 12]
             for p in range(5)],
            axis=1,
        )  # static slices only
        sw_pre = jnp.where((wrot == r)[:, None, None], sl, sw_pre)
    sbb = sb[:, None, None]
    shl_amt = (32 - sbb) & 31
    hi_part = jnp.where(sbb == 0, 0, jnp.left_shift(sw_pre[:, :, 1:12], shl_amt))
    sw = jax.lax.shift_right_logical(sw_pre[:, :, :11], sbb) | hi_part
    sw = jax.lax.optimization_barrier(sw)

    # static bit picks, grouped by (plane, word): broadcast shifts, no gather
    plan, m_np = _extract_plan()
    parts = []
    for pl_, j, shifts in plan:
        w = sw[:, pl_, j][:, None]
        parts.append(
            jax.lax.shift_right_logical(w, jnp.asarray(shifts)[None, :]) & 1
        )
    bits = jnp.concatenate(parts, axis=1).astype(jnp.bfloat16)  # (K, 560)
    bits = jax.lax.optimization_barrier(bits)

    # --- stage 5: syndromes + byte packing as one MXU matmul ----------------
    # (column permutation from the grouped emission is folded into m_np)
    out = jax.lax.dot(
        bits, jnp.asarray(m_np, dtype=jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # exact integers < 256
    outi = out.astype(jnp.int32).reshape(k, NUM_PHASES, 62)
    parity112 = outi[:, :, 0:24] & 1
    parity56 = outi[:, :, 24:48] & 1
    msg = outi[:, :, 48:62].astype(jnp.uint8)
    w24 = (1 << jnp.arange(23, -1, -1, dtype=jnp.int32)).astype(jnp.int32)
    syn112 = jnp.sum(parity112 * w24, axis=-1)
    syn56 = jnp.sum(parity56 * w24, axis=-1)

    # correlation lanes from the win row's corr bitplanes
    cc = []
    for c in range(3):
        wsel = jnp.zeros((k,), jnp.int32)
        for r in range(8):
            wsel = jnp.where(wrot == r, rows[:, WIN_CORR_BASE + c * 8 + r], wsel)
        cc.append((jax.lax.shift_right_logical(wsel, sb) & 1) != 0)
    corr_fired = jnp.stack(cc, axis=-1) & (offsets < scan_len)[:, None]

    zeros2 = jnp.zeros((k, 2), jnp.int32)
    bc = BlockCandidates(
        offsets=offsets,
        n_cand=n_cand,
        max_local=max_local,
        corr_fired=corr_fired,
        msg=msg,
        syn112=syn112,
        syn56=syn56,
        sig_long=zeros2,
        sig_short=zeros2,
    )
    return bc, cs_hi, cs_lo


@functools.partial(jax.jit, static_argnames=("k", "scan_len", "l"))
def demod_block(
    buf: jax.Array,
    threshold: jax.Array | int = PREAMBLE_THRESHOLD_DEFAULT,
    *,
    k: int = 2048,
    scan_len: int | None = None,
    l: int = 64,
) -> BlockCandidates:
    """Demodulate one magnitude block.

    buf: uint16[scan_len + TRAILING_SAMPLES] magnitudes.  Scan offsets
    0..scan_len-1 are candidate positions (the caller lays out blocks so
    that consecutive blocks tile the scan axis exactly, reference-style).
    """
    if scan_len is None:
        scan_len = buf.shape[0] - TRAILING_SAMPLES
    bc, cs_hi, cs_lo = _demod_core(buf, threshold, k=k, scan_len=scan_len, l=l)
    sig_long, sig_short = window_sums(bc.offsets, cs_hi, cs_lo)
    return bc._replace(sig_long=sig_long, sig_short=sig_short)
