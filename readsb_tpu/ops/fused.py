"""Fused dense-scan -> in-tile compaction -> extract, one Pallas kernel.

The staged pipeline's cost is structural: every stage is a pass through
HBM (corrbits + pwords written by the dense kernel, read by the XLA
compaction and win-row build, candidate rows gathered back for the
extract kernel).  r5's session attribution put compaction at ~3 ms and
win+gather at ~1.3 ms per 8.4M-sample superblock — pure data motion
between stages.  This kernel keeps one 65536-sample tile resident in
VMEM end to end:

  1. dense preamble/correlations + slicer sign planes (the production
     _dense_body math; an 8-row (1024-sample) lookahead block keeps
     every candidate window [off, off+352) in-tile)
  2. in-tile compaction to CAP candidate offsets, scatter-free: per-row
     exclusive lane prefix (triangular matmul), per-row one-hot lane
     select, and a (rank -> row) map built from four group-wise
     (cap, 128) <= compares + (128, 1) reduce matmuls — every operand
     stays in a legal Mosaic orientation (no transposes/relayouts)
  3. word-aligned window extraction for the CAP candidates: 4-banded
     one-hot row-gather matmuls over the (rows, 20) plane words
     (byte-split, bf16-exact), 4-way word align + bit shift, then the
     production unpack + CRC/byte-pack MXU matmuls (_extract_kernel)

Per-tile outputs: comb (CAP, 128) in the extract layout, global offsets
(CAP,) + live mask, per-tile meta (count, max per 256-sample block, max
per row) and the split mag^2 prefix sums (the gate's window sums still
read those).  Capacity is per tile (CAP = k / ntiles); sentinel offsets
equal the tile end so the concatenated offset list stays nondecreasing
for the gate's searchsorted accounting.

Parity: tests/test_fused.py diffs candidate sets and comb rows against
the staged path bit for bit (interpret mode) and runs the gated pipeline
end to end under USE_FUSED with identical frames and stats.

MEASURED RESULT (r5, one v5e via the axon relay): 30.2 ms per
8.39M-sample superblock vs 14.0 ms for the staged path in the same
session — 2.2x SLOWER, plus a ~13-minute first compile.  The HBM
traffic the fusion removes (~8 ms of compaction + win build + gather)
is cheaper than what the monolith loses: XLA overlaps the staged
passes across grid steps and fuses their element-wise tails, while the
single kernel serializes extraction behind the dense scan in every
step and pays the L_ROW select loops and one-hot gather matmuls on the
VPU's critical path.  Kept disabled (ops.demod.USE_FUSED=False) as a
validated negative result — the same verdict pattern as r4's
selection-matmul extract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_kernels as pk

LANES = pk.LANES
ROWS = pk.DENSE_ROWS  # 512 rows x 128 lanes = 65536 samples per tile
HALO_ROWS = 8  # 1024 lookahead samples >= 352-sample window + 31-bit shift
TILE = ROWS * LANES
L_ROW = 16  # max candidates within one 128-sample row (preambles are
#             >= ~10 samples apart by construction; 16 is generous)


@functools.lru_cache(maxsize=None)
def _tri128_np() -> np.ndarray:
    return np.tril(np.ones((LANES, LANES), np.float32), -1).T


def _byte_planes(w):
    """int32 -> four 0..255 int32 byte planes (exact bf16 matmul inputs)."""
    return [(jax.lax.shift_right_logical(w, 8 * b) & 0xFF) for b in range(4)]


def _onehot_matmul_i32(oh_bf16, table_i32):
    """(N, R) one-hot @ (R, C) int32 table, exact via byte-plane splits."""
    parts = []
    for bp in _byte_planes(table_i32):
        parts.append(
            jax.lax.dot(
                oh_bf16, bp.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
        )
    return parts[0] | (parts[1] << 8) | (parts[2] << 16) | (parts[3] << 24)


def _fused_body(
    thr, m_ext, wlo_ref, whi_ref, tri_ref, m1_ref, m2_ref, tile_base,
    comb_ref, off_ref, live_ref, meta_ref, cs_hi_ref, cs_lo_ref,
    carry, *, cap, seg_stride, seg_valid, scan_limit,
):
    # the shifted family reads one row ahead, so the plane rows stop one
    # short of the halo end (windows only reach row 515 of 519)
    ext_rows = ROWS + HALO_ROWS - 1

    # ---- 1. dense preamble / correlations over the tile ---------------------
    at = pk._shifted_family(
        m_ext, ROWS, (0, 1, 2, 3, 4, 5, 7, 8, 9, 10, 11, 12, 14, 15, 16, 17, 18)
    )
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
    pos = (
        tile_base
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    )
    cand &= pos < scan_limit  # EOF padding produces no candidates
    if seg_stride is not None:
        cand &= (pos % seg_stride) < seg_valid

    # slicer sign planes over tile + halo rows (windows read past the tile)
    at_e = pk._shifted_family(m_ext, ext_rows, (0, 1, 2, 3))
    s0, s1, s2, s3 = at_e[0], at_e[1], at_e[2], at_e[3]
    planes_h = jnp.concatenate(
        [
            (18 * s0 - 15 * s1 - 3 * s2) > 0,
            (14 * s0 - 5 * s1 - 9 * s2) > 0,
            (16 * s0 + 5 * s1 - 20 * s2) > 0,
            (7 * s0 + 11 * s1 - 18 * s2) > 0,
            (4 * s0 + 15 * s1 - 20 * s2 + s3) > 0,
        ],
        axis=1,
    ).astype(jnp.float32)  # (ext_rows, 640)
    lo = jax.lax.dot(planes_h, wlo_ref[:], preferred_element_type=jnp.float32)
    hi = jax.lax.dot(planes_h, whi_ref[:], preferred_element_type=jnp.float32)
    pw = lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)  # (ext_rows, 20)

    # correlation bitplanes packed per row: (ROWS, 12) = 3 planes x 4 words
    corr_h = jnp.concatenate(
        [corr_a, corr_b, corr_c], axis=1
    ).astype(jnp.float32)  # (ROWS, 384)
    clo = jax.lax.dot(
        corr_h, wlo_ref[: 3 * LANES, :12], preferred_element_type=jnp.float32
    )
    chi = jax.lax.dot(
        corr_h, whi_ref[: 3 * LANES, :12], preferred_element_type=jnp.float32
    )
    cw = clo.astype(jnp.int32) | (chi.astype(jnp.int32) << 16)  # (ROWS, 12)

    # ---- mag^2 split prefix sums (window sums read them, unchanged) ---------
    mm = at[0]
    mh = mm >> 8
    ml = mm & 0xFF
    t = 2 * mh * ml * 256 + ml * ml
    sq_hi = mh * mh + (t >> 16)
    sq_lo = t & 0xFFFF

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry[0] = 0
        carry[1] = 0

    ph = pk._lane_prefix_i32(sq_hi)
    pl_ = pk._lane_prefix_i32(sq_lo)
    rh = pk._row_prefix_excl_fast(ph[:, LANES - 1:])
    rl = pk._row_prefix_excl_fast(pl_[:, LANES - 1:])
    cs_hi = ph + rh + carry[0]
    cs_lo = pl_ + rl + carry[1]
    cs_hi_ref[:] = cs_hi
    cs_lo_ref[:] = cs_lo
    carry[0] = cs_hi[ROWS - 1, LANES - 1]
    carry[1] = cs_lo[ROWS - 1, LANES - 1]

    # ---- 2. in-tile compaction ---------------------------------------------
    cf = cand.astype(jnp.bfloat16)
    pe = jax.lax.dot(
        cf, tri_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # (ROWS, 128) exclusive lane prefix per row
    rt = pe[:, LANES - 1:] + cand[:, LANES - 1:].astype(jnp.int32)  # (ROWS, 1)
    ge = pk._row_prefix_excl_fast(rt)  # (ROWS, 1) exclusive row prefix
    n_tile = jnp.sum(rt)

    # per-256-sample-block counts (row pairs) for the l-escalation signal
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    rt_prev = pltpu.roll(rt, 1, axis=0)
    blk_cnt = jnp.where(row_iota % 2 == 1, rt + rt_prev, 0)
    max_blk = jnp.max(blk_cnt)
    max_row = jnp.max(rt)

    # per-row candidate lanes, capacity L_ROW
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    lo_cols = []
    for j in range(L_ROW):
        sel = (pe == j) & cand
        lo_cols.append(
            jnp.sum(jnp.where(sel, lane_iota, 0), axis=1, keepdims=True)
        )
    local_off = jnp.concatenate(lo_cols, axis=1)  # (ROWS, L_ROW)

    # rank -> row: cnt[k] = #rows with ge_r <= k, via four group-wise
    # compares against the (4, 128)-regrouped ge (row r <-> (r>>7, r&127))
    ge4 = ge.reshape(ROWS // LANES, LANES)  # legal regroup (r5 probe)
    k_col = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    ones_col = jnp.ones((LANES, 1), jnp.bfloat16)
    cnt = jnp.zeros((cap, 1), jnp.int32)
    for g in range(ROWS // LANES):
        le = (ge4[g : g + 1, :] <= k_col).astype(jnp.bfloat16)  # (cap, 128)
        cnt = cnt + jax.lax.dot(
            le, ones_col, preferred_element_type=jnp.float32
        ).astype(jnp.int32)
    row_of_rank = jnp.clip(cnt - 1, 0, ROWS - 1)  # (cap, 1)

    # one-hot (cap, ROWS) of row_of_rank -> gather ge and lane table rows
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (cap, ROWS), 1)
    oh = (r_iota == row_of_rank).astype(jnp.bfloat16)
    ge_of_rank = _onehot_matmul_i32(oh, ge)  # (cap, 1)
    lanes_of_row = _onehot_matmul_i32(oh, local_off)  # (cap, L_ROW)
    local_rank = k_col - ge_of_rank
    lane_pick = jnp.zeros((cap, 1), jnp.int32)
    for j in range(L_ROW):
        lane_pick = jnp.where(
            local_rank == j, lanes_of_row[:, j : j + 1], lane_pick
        )
    live_col = (k_col < n_tile) & (local_rank >= 0) & (local_rank < L_ROW)
    off_local = jnp.where(live_col, row_of_rank * LANES + lane_pick, 0)
    off_global = jnp.where(live_col, tile_base + off_local, tile_base + TILE)

    # ---- 3. window extraction for the cap candidates ------------------------
    w0 = off_local >> 5  # (cap, 1) first window word
    wrow = w0 >> 2  # word row in the (ext_rows, 20) layout
    wmod = w0 & 3
    r_iota_e = jax.lax.broadcasted_iota(jnp.int32, (cap, ext_rows), 1)
    bands = []
    for b in range(4):
        ohb = (r_iota_e == jnp.clip(wrow + b, 0, ext_rows - 1)).astype(
            jnp.bfloat16
        )
        bands.append(_onehot_matmul_i32(ohb, pw))  # (cap, 20)
    sb = off_local & 31
    shl = (32 - sb) & 31
    sw_planes = []
    for p in range(5):
        w16 = jnp.concatenate(
            [bands[b][:, p * 4 : p * 4 + 4] for b in range(4)], axis=1
        )  # (cap, 16): words 4*wrow .. 4*wrow+15
        w12 = jnp.zeros((cap, 12), jnp.int32)
        for r in range(4):
            w12 = jnp.where(wmod == r, w16[:, r : r + 12], w12)
        sw_planes.append(
            jax.lax.shift_right_logical(w12[:, :11], sb)
            | jnp.where(sb == 0, 0, jnp.left_shift(w12[:, 1:12], shl))
        )
    sw = jnp.concatenate(sw_planes, axis=1)  # (cap, 55)

    # unpack + CRC/byte-pack matmuls (production extract math)
    u = pltpu.repeat(sw, 32, axis=1)  # (cap, 1760)
    lane_bit = jax.lax.broadcasted_iota(jnp.int32, (cap, pk.EX_BITS), 1) // 55
    bits = (jax.lax.shift_right_logical(u, lane_bit) & 1).astype(jnp.bfloat16)
    counts = jax.lax.dot(
        bits, m1_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    parity = (counts & 1).astype(jnp.bfloat16)
    syn = jax.lax.dot(
        parity, m2_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    msg = jnp.concatenate(
        [counts[:, p * 62 + 48 : p * 62 + 62] for p in range(5)], axis=1
    )

    # correlation bits at the candidate offset (packed corr words, in-tile)
    r_iota_c = jax.lax.broadcasted_iota(jnp.int32, (cap, ROWS), 1)
    ohc = (r_iota_c == jnp.clip(wrow, 0, ROWS - 1)).astype(jnp.bfloat16)
    crow = _onehot_matmul_i32(ohc, cw)  # (cap, 12)
    corr_parts = []
    for c in range(3):
        w4 = crow[:, c * 4 : c * 4 + 4]
        wsel = jnp.zeros((cap, 1), jnp.int32)
        for r in range(4):
            wsel = jnp.where(wmod == r, w4[:, r : r + 1], wsel)
        corr_parts.append(jax.lax.shift_right_logical(wsel, sb) & 1)
    corr = jnp.concatenate(corr_parts, axis=1)

    comb_ref[:] = jnp.concatenate(
        [syn[:, :10], msg, corr, jnp.zeros((cap, 128 - 83), jnp.int32)], axis=1
    )
    off_ref[:] = off_global
    live_ref[:] = live_col.astype(jnp.int32)
    # meta as an (8, 128) VMEM block (SMEM outputs need tile-legal shapes
    # on hardware): row 0 = count, 1 = max 256-block, 2 = max row
    mi = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    meta_ref[:] = jnp.where(
        mi == 0, n_tile,
        jnp.where(mi == 1, max_blk, jnp.where(mi == 2, max_row, 0)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cap", "seg_stride", "seg_valid", "scan_limit", "interpret"),
)
def fused_demod_tiles(
    buf: jax.Array,
    threshold,
    *,
    cap: int,
    seg_stride: int | None = None,
    seg_valid: int | None = None,
    scan_limit: int | None = None,
    interpret: bool = False,
):
    """buf: (n,) uint16 magnitudes, n % TILE == 0.  Returns
    (comb (T*cap, 128), offsets (T*cap,), live (T*cap,), meta (T, 3),
    cs_hi (n,), cs_lo (n,)); meta = (count, max_256_block, max_row)."""
    n = buf.shape[0]
    assert n % TILE == 0, n
    assert cap % LANES == 0, cap
    ntiles = n // TILE
    rows = n // LANES
    # halo block: 8 rows following each tile (zeros past the end), read as
    # a second overlapping view of the padded sample matrix
    m2d = jnp.pad(buf.reshape(rows, LANES), ((0, HALO_ROWS), (0, 0)))

    def kern(thr_ref, m_ref, halo_ref, wlo_ref, whi_ref, tri_ref,
             m1_ref, m2_ref,
             comb_ref, off_ref, live_ref, meta_ref, cs_hi_ref, cs_lo_ref,
             carry):
        t_id = pl.program_id(0)
        m_ext = jnp.concatenate(
            [m_ref[:].astype(jnp.int32), halo_ref[:].astype(jnp.int32)],
            axis=0,
        )
        _fused_body(
            thr_ref[0], m_ext, wlo_ref, whi_ref, tri_ref, m1_ref, m2_ref,
            t_id * TILE,
            comb_ref, off_ref, live_ref, meta_ref, cs_hi_ref, cs_lo_ref,
            carry, cap=cap, seg_stride=seg_stride, seg_valid=seg_valid,
            scan_limit=n if scan_limit is None else scan_limit,
        )

    wlo, whi = pk._pack_weights640_np()
    grid_div = ROWS // HALO_ROWS  # halo block index stride in 8-row units
    comb, off, live, meta, cs_hi, cs_lo = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((ntiles * cap, 128), jnp.int32),
            jax.ShapeDtypeStruct((ntiles * cap, 1), jnp.int32),
            jax.ShapeDtypeStruct((ntiles * cap, 1), jnp.int32),
            jax.ShapeDtypeStruct((ntiles * 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (HALO_ROWS, LANES),
                lambda i: (i * grid_div + grid_div, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((5 * LANES, pk.PW_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * LANES, pk.PW_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pk.EX_BITS, 320), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((320, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((cap, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        jnp.asarray(threshold, jnp.int32).reshape(1),
        m2d[:rows],
        m2d,
        jnp.asarray(wlo),
        jnp.asarray(whi),
        jnp.asarray(_tri128_np(), jnp.bfloat16),
        jnp.asarray(pk._extract_mats()[0], jnp.bfloat16),
        jnp.asarray(pk._extract_mats()[1], jnp.bfloat16),
    )
    return (
        comb,
        off.reshape(-1),
        live.reshape(-1) != 0,
        meta.reshape(ntiles, 8, 128)[:, :3, 0],
        cs_hi.reshape(-1),
        cs_lo.reshape(-1),
    )
