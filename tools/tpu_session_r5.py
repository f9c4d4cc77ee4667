"""Round-5 TPU measurement session: stage attribution inside the kernels,
shard_map-on-real-TPU validation, and a sustained e2e loop.

One process = one relay claim.  Phases via argv (default: all):

    python tools/tpu_session_r5.py [ablate] [shard] [e2e]

Methodology (BASELINE.md r3 rules): carry-chained reps serialize compute
on device; one scalar readback settles the chain; null-chain overhead is
measured and subtracted.  Kernel *variants* here are measurement copies
of the production kernels with stages removed — identical I/O shapes, so
differences attribute instruction-stream cost, not bandwidth.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CPU_SMOKE = "--cpu" in sys.argv
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if CPU_SMOKE:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from readsb_tpu.constants import BLOCK_SAMPLES, TRAILING_SAMPLES
from readsb_tpu.ops import demod as demod_ops
from readsb_tpu.ops import pallas_kernels as pk
from readsb_tpu.ops.demod import _compact_two_level
from readsb_tpu.ops.gate import TBL_SENTINEL, score_gate, _table_syndromes_np
from readsb_tpu import pipeline as pl_mod

if CPU_SMOKE:
    pk.INTERPRET = True  # production kernels run the Mosaic interpreter

PHASES = [a for a in sys.argv[1:] if not a.startswith("-")] or [
    "ablate", "shard", "e2e"
]
N_BLOCKS = 1 if CPU_SMOKE else 64
SCAN = N_BLOCKS * BLOCK_SAMPLES  # 8.39M samples
K = 2048 * N_BLOCKS
L = 64
T0 = time.time()
LANES = pk.LANES
ROWS = pk.DENSE_ROWS


def mark(s):
    print(f"+{time.time()-T0:5.0f}s {s}", flush=True)


rng = np.random.default_rng(0)
raw = rng.integers(0, 256, SCAN * 2, dtype=np.int64).astype(np.uint8)
raw_j = jnp.asarray(raw)
overlap = jnp.zeros(TRAILING_SAMPLES, dtype=jnp.uint16)
thr = jnp.int32(58)
_ = float(jnp.sum(jnp.zeros(4)))
mark(f"attached platform={jax.devices()[0].platform}")

RTT_S = [0.0]

def _mag(r):
    return pk.mag_uc8_pallas(r, interpret=CPU_SMOKE)



def timeit(name, chain_fn, reps=10, sub_rtt=True, best_of=3):
    c = chain_fn(jnp.int32(0))
    int(c)  # warm + honest barrier
    best = float("inf")
    for _ in range(best_of):
        c = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(reps):
            c = chain_fn(c)
        int(c)
        total = time.perf_counter() - t0
        best = min(best, total / reps)
    net = best - (RTT_S[0] if sub_rtt else 0.0)
    mark(f"{name:34s} {net*1e3:9.3f} ms {SCAN/max(net,1e-9)/1e6:9.0f} MS/s")
    return net


# ---------------------------------------------------------------------------
# dense-scan measurement variants (copies of pk._dense_body with stages
# removed; identical out shapes so write traffic is held constant)
# ---------------------------------------------------------------------------

def _dense_variant_body(thr, m_ext, wlo_ref, whi_ref,
                        corr_ref, pw_ref, cs_hi_ref, cs_lo_ref, carry,
                        *, pre, slicer, prefix):
    rows = ROWS
    ks = {0}
    if pre:
        ks |= {1, 2, 3, 4, 5, 7, 8, 9, 10, 11, 12, 14, 15, 16, 17, 18}
    if slicer:
        ks |= {0, 1, 2, 3}
    at = pk._shifted_family(m_ext, rows, tuple(sorted(ks)))

    if pre:
        prec = (at[1] > at[7]) & (at[12] > at[14]) & (at[12] > at[15])
        base_noise = at[5] + at[8] + at[16] + at[17] + at[18]
        ref_level = (base_noise * thr) >> 5
        d23 = at[2] - at[3]
        s14 = at[1] + at[4]
        d1011 = at[10] - at[11]
        common = s14 - d23 + at[9] + at[12]
        corr_a = (common - d1011) >= ref_level
        corr_b = (common + d1011) >= ref_level
        corr_c = (s14 + 2 * d23 + d1011 + at[12]) >= ref_level
        cand = prec & (corr_a | corr_b | corr_c)
        corr_ref[:] = (
            corr_a.astype(jnp.int32)
            | (corr_b.astype(jnp.int32) << 1)
            | (corr_c.astype(jnp.int32) << 2)
            | (cand.astype(jnp.int32) << 3)
        ).astype(jnp.int8)
    else:
        corr_ref[:] = (at[0] & 7).astype(jnp.int8)

    if slicer:
        s0, s1, s2, s3 = at[0], at[1], at[2], at[3]
        planes = jnp.concatenate(
            [
                (18 * s0 - 15 * s1 - 3 * s2) > 0,
                (14 * s0 - 5 * s1 - 9 * s2) > 0,
                (16 * s0 + 5 * s1 - 20 * s2) > 0,
                (7 * s0 + 11 * s1 - 18 * s2) > 0,
                (4 * s0 + 15 * s1 - 20 * s2 + s3) > 0,
            ],
            axis=0,
        ).astype(jnp.float32)
        lo = jax.lax.dot(planes, wlo_ref[:], preferred_element_type=jnp.float32)
        hi = jax.lax.dot(planes, whi_ref[:], preferred_element_type=jnp.float32)
        pw_ref[:] = (lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)).reshape(
            5, rows, 4
        )
    else:
        pw_ref[:] = jnp.broadcast_to(
            at[0][:1, :4].reshape(1, 1, 4), (5, rows, 4)
        )

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

    if prefix == "full":
        ph = pk._lane_prefix_i32(sq_hi)
        pl_ = pk._lane_prefix_i32(sq_lo)
        rh = pk._row_prefix_excl_i32(ph[:, LANES - 1:])
        rl = pk._row_prefix_excl_i32(pl_[:, LANES - 1:])
        cs_hi = ph + rh + carry[0]
        cs_lo = pl_ + rl + carry[1]
        cs_hi_ref[:] = cs_hi
        cs_lo_ref[:] = cs_lo
        carry[0] = cs_hi[rows - 1, LANES - 1]
        carry[1] = cs_lo[rows - 1, LANES - 1]
    elif prefix == "lane":
        cs_hi_ref[:] = pk._lane_prefix_i32(sq_hi)
        cs_lo_ref[:] = pk._lane_prefix_i32(sq_lo)
    elif prefix == "rowsum":
        cs_hi_ref[:] = jnp.broadcast_to(
            jnp.sum(sq_hi, axis=1, keepdims=True), (rows, LANES)
        )
        cs_lo_ref[:] = jnp.broadcast_to(
            jnp.sum(sq_lo, axis=1, keepdims=True), (rows, LANES)
        )
    else:  # "none": raw values, no reduction at all
        cs_hi_ref[:] = sq_hi
        cs_lo_ref[:] = sq_lo


def dense_variant_call(buf2d, halo_rows, *, pre, slicer, prefix):
    rows_total = buf2d.shape[0]
    ntiles = rows_total // ROWS

    def kern(thr_ref, m_ref, halo_ref, wlo_ref, whi_ref,
             corr_ref, pw_ref, cs_hi_ref, cs_lo_ref, carry):
        t_id = pl.program_id(0)
        halo_row = halo_ref[pl.ds(pl.multiple_of(t_id * 8, 8), 8), :][:1]
        m_ext = jnp.concatenate(
            [m_ref[:].astype(jnp.int32), halo_row.astype(jnp.int32)], axis=0
        )
        _dense_variant_body(
            thr_ref[0], m_ext, wlo_ref, whi_ref, corr_ref, pw_ref,
            cs_hi_ref, cs_lo_ref, carry, pre=pre, slicer=slicer, prefix=prefix,
        )

    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.int8),
            jax.ShapeDtypeStruct((5, rows_total, 4), jnp.int32),
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, ROWS, 4), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=CPU_SMOKE,
    )(
        thr.reshape(1), buf2d, halo_rows,
        jnp.asarray(pk._pack_weights_np()[0]),
        jnp.asarray(pk._pack_weights_np()[1]),
    )


def _dense_inputs(c):
    mag = _mag(raw_j)
    buf = jnp.concatenate([overlap + c.astype(jnp.uint16), mag])
    tile = ROWS * LANES
    padded = ((buf.shape[0] + tile - 1) // tile) * tile
    bufp = jnp.pad(buf, (0, padded - buf.shape[0]))
    rows_total = padded // LANES
    m2d = bufp.reshape(rows_total, LANES)
    ntiles = rows_total // ROWS
    halo_rows = jnp.concatenate(
        [m2d[ROWS::ROWS][: ntiles - 1], jnp.zeros((1, LANES), bufp.dtype)]
    )
    halo_rows = jnp.repeat(halo_rows, 8, axis=0)
    return m2d, halo_rows


def dense_chain(**kw):
    @jax.jit
    def run(c):
        m2d, halo = _dense_inputs(c)
        corr, pwv, ch, cl = dense_variant_call(m2d, halo, **kw)
        return (
            corr[999, 5].astype(jnp.int32)
            + pwv[0, 777, 1]
            + ch[123, 45]
            - cl[45, 123]
        )

    return run


# ---------------------------------------------------------------------------
# extract measurement variants
# ---------------------------------------------------------------------------

def make_extract_kernel(stage):
    """stage: 'rot' | 'unpack' | 'mat1' | 'full'."""
    from readsb_tpu.ops.demod import WIN_CORR_BASE, WIN_PLANE_WORDS

    def kern(off_ref, rows_ref, m1_ref, m2_ref, out_ref):
        rows = rows_ref[:]
        off = off_ref[:]
        s = off & 255
        wrot = s >> 5
        sb = s & 31
        sw_pre = jnp.zeros((pk.EX_ROWS, 60), jnp.int32)
        for r in range(8):
            sl = jnp.concatenate(
                [rows[:, p * WIN_PLANE_WORDS + r : p * WIN_PLANE_WORDS + r + 12]
                 for p in range(5)],
                axis=1,
            )
            sw_pre = jnp.where(wrot == r, sl, sw_pre)
        lo = jnp.concatenate(
            [sw_pre[:, p * 12 : p * 12 + 11] for p in range(5)], axis=1
        )
        hi = jnp.concatenate(
            [sw_pre[:, p * 12 + 1 : p * 12 + 12] for p in range(5)], axis=1
        )
        shl = (32 - sb) & 31
        sw = jax.lax.shift_right_logical(lo, sb) | jnp.where(
            sb == 0, 0, jnp.left_shift(hi, shl)
        )
        if stage == "rot":
            out_ref[:] = jnp.pad(sw, ((0, 0), (0, 128 - 55)))
            return
        u = pltpu.repeat(sw, 32, axis=1)
        lane_bit = jax.lax.broadcasted_iota(
            jnp.int32, (pk.EX_ROWS, pk.EX_BITS), 1
        ) // 55
        bits = (jax.lax.shift_right_logical(u, lane_bit) & 1).astype(jnp.bfloat16)
        if stage == "unpack":
            s1 = jnp.sum(bits, axis=1, keepdims=True).astype(jnp.int32)
            out_ref[:] = jnp.broadcast_to(s1, (pk.EX_ROWS, 128))
            return
        counts = jax.lax.dot(
            bits, m1_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        if stage == "mat1":
            out_ref[:] = counts[:, :128]
            return
        parity = (counts & 1).astype(jnp.bfloat16)
        syn = jax.lax.dot(
            parity, m2_ref[:], preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        msg = jnp.concatenate(
            [counts[:, p * 62 + 48 : p * 62 + 62] for p in range(5)], axis=1
        )
        corr_parts = []
        for ci in range(3):
            wsel = jnp.zeros((pk.EX_ROWS, 1), jnp.int32)
            for r in range(8):
                wsel = jnp.where(
                    wrot == r,
                    rows[:, WIN_CORR_BASE + ci * 8 + r : WIN_CORR_BASE + ci * 8 + r + 1],
                    wsel,
                )
            corr_parts.append(jax.lax.shift_right_logical(wsel, sb) & 1)
        corr = jnp.concatenate(corr_parts, axis=1)
        out_ref[:] = jnp.concatenate(
            [syn[:, :10], msg, corr, jnp.zeros((pk.EX_ROWS, 128 - 83), jnp.int32)],
            axis=1,
        )

    return kern


def extract_variant(rows, offsets, stage):
    k = rows.shape[0]
    m1, m2 = pk._extract_mats()
    return pl.pallas_call(
        make_extract_kernel(stage),
        out_shape=jax.ShapeDtypeStruct((k, 128), jnp.int32),
        grid=(k // pk.EX_ROWS,),
        in_specs=[
            pl.BlockSpec((pk.EX_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pk.EX_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pk.EX_BITS, 320), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((320, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (pk.EX_ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=CPU_SMOKE,
    )(
        offsets.reshape(k, 1), rows,
        jnp.asarray(m1, dtype=jnp.bfloat16),
        jnp.asarray(m2, dtype=jnp.bfloat16),
    )


def common(c):
    mag = _mag(raw_j)
    buf = jnp.concatenate([overlap + c.astype(jnp.uint16), mag])
    tile = ROWS * LANES
    padded = ((buf.shape[0] + tile - 1) // tile) * tile
    bufp = jnp.pad(buf, (0, padded - buf.shape[0]))
    return pk.dense_scan_pallas(bufp, thr, interpret=CPU_SMOKE)


def kernel_prefix(c):
    corrbits, pwords, cs_hi, cs_lo = common(c)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    win, nv = demod_ops.win_rows(corrbits, pwords, SCAN)
    rows = win[jnp.clip(offsets >> 8, 0, nv - 1)]
    return rows, offsets, cs_hi, cs_lo


def extract_chain(stage):
    @jax.jit
    def run(c):
        rows, offsets, _, _ = kernel_prefix(c)
        comb = extract_variant(rows, offsets, stage)
        return comb[33, 0] + comb[55, 9] + offsets[11]

    return run


# ---------------------------------------------------------------------------
# gate sub-stage chains (marginal over the extract chain)
# ---------------------------------------------------------------------------

def full_bc(c):
    bc, cs_hi, cs_lo = demod_ops._demod_core(
        jnp.concatenate([overlap + c.astype(jnp.uint16), _mag(raw_j)]),
        thr, k=K, scan_len=SCAN, l=L,
    )
    return bc, cs_hi, cs_lo


_tbl = jnp.full(128, TBL_SENTINEL, jnp.int32)


def gate_chain(part):
    @jax.jit
    def run(c):
        bc, cs_hi, cs_lo = full_bc(c)
        msg = bc.msg.astype(jnp.int32)
        df = msg[:, :, 0] >> 3
        aa = (msg[:, :, 1] << 16) | (msg[:, :, 2] << 8) | msg[:, :, 3]
        acc = df[7, 2] + bc.syn112[9, 2]
        if part == "none":
            return acc + bc.n_cand
        t112 = jnp.asarray(_table_syndromes_np(112, 1))
        t56 = jnp.asarray(_table_syndromes_np(56, 1))
        in_t112 = jnp.any(bc.syn112[:, :, None] == t112[None, None, :], axis=-1)
        in_t56 = jnp.any(bc.syn56[:, :, None] == t56[None, None, :], axis=-1)
        zero7 = jnp.sum(msg[:, :, :7], axis=2) == 0
        acc = acc + jnp.sum(in_t112.astype(jnp.int32)) + jnp.sum(in_t56.astype(jnp.int32)) + jnp.sum(zero7.astype(jnp.int32))
        if part == "member":
            return acc
        cf = bc.corr_fired
        fired = jnp.stack([cf[:, 0], cf[:, 0], cf[:, 1], cf[:, 1], cf[:, 2]], axis=1)
        learn = fired & (((df == 17) & (bc.syn112 == 0)) | ((df == 11) & (bc.syn56 == 0)))
        flat_learn = learn.reshape(-1)
        s_idx, s_wm = _compact_two_level(flat_learn, 256, 32, flat_learn.shape[0])
        acc = acc + s_idx[3] + s_wm
        if part == "teach":
            return acc
        residual = jnp.where(df >= 16, bc.syn112, bc.syn56) & 0xFFFFFF
        in_tbl = jnp.any(residual[:, :, None] == _tbl[None, None, :], axis=-1)
        keep = (in_t112 | in_t56 | in_tbl).any(axis=1) & ~zero7.all(axis=1)
        kidx, kwm = _compact_two_level(keep, 1024, 32, K)
        acc = acc + kidx[5] + kwm
        if part == "keepcompact":
            return acc
        safe = jnp.minimum(kidx, K - 1)
        offsets2 = jnp.where(kidx < K, bc.offsets[safe], SCAN)
        sig_long, sig_short = demod_ops.window_sums(offsets2, cs_hi, cs_lo)
        acc = acc + sig_long[3, 0] + sig_short[9, 1] + bc.msg[safe][17, 2, 3].astype(jnp.int32)
        if part == "sums":
            return acc
        return acc

    return run


def gate_full_chain():
    @jax.jit
    def run(c):
        bc, cs_hi, cs_lo = full_bc(c)
        gc = score_gate(bc, _tbl, cs_hi, cs_lo, scan_len=SCAN, k2=1024)
        return gc.n_keep + gc.offsets[5] + gc.pre_drop

    return run


# ---------------------------------------------------------------------------
# phases
# ---------------------------------------------------------------------------

def phase_ablate():
    @jax.jit
    def chain_null(c):
        return c + 1

    n = timeit("null chain", chain_null, reps=50, sub_rtt=False)
    RTT_S[0] = max(0.0, n)
    mark(f"(dispatch overhead {RTT_S[0]*1e3:.3f} ms/rep subtracted)")

    mark("--- dense scan variants ---")
    timeit("dense full (production)", dense_chain(pre=True, slicer=True, prefix="full"))
    timeit("dense prefix=lane", dense_chain(pre=True, slicer=True, prefix="lane"))
    timeit("dense prefix=rowsum", dense_chain(pre=True, slicer=True, prefix="rowsum"))
    timeit("dense prefix=none", dense_chain(pre=True, slicer=True, prefix="none"))
    timeit("dense no-preamble", dense_chain(pre=False, slicer=True, prefix="full"))
    timeit("dense no-slicer", dense_chain(pre=True, slicer=False, prefix="full"))
    timeit("dense minimal", dense_chain(pre=False, slicer=False, prefix="none"))

    mark("--- extract variants (marginal over shared prefix) ---")

    @jax.jit
    def chain_prefix_only(c):
        rows, offsets, cs_hi, cs_lo = kernel_prefix(c)
        return rows[77, 3] + offsets[11] + cs_hi[123]

    timeit("prefix (dense+compact+gather)", chain_prefix_only)
    timeit("extract rot-only", extract_chain("rot"))
    timeit("extract +unpack", extract_chain("unpack"))
    timeit("extract +mat1", extract_chain("mat1"))
    timeit("extract full", extract_chain("full"))

    mark("--- gate sub-stages (marginal over extract full) ---")
    timeit("gate none (bc only)", gate_chain("none"))
    timeit("gate member", gate_chain("member"))
    timeit("gate +teach", gate_chain("teach"))
    timeit("gate +keepcompact", gate_chain("keepcompact"))
    timeit("gate +sums", gate_chain("sums"))
    timeit("gate FULL (score_gate)", gate_full_chain())


def phase_shard():
    """VERDICT r5 #4: compile the sharded gated program on the real TPU
    ((chan=1, time=1) mesh on the single chip) and assert frame parity
    vs the unsharded MultiDemodulator path."""
    from jax.sharding import Mesh
    from readsb_tpu.parallel import mesh as mesh_mod

    mark("--- shard_map on real TPU (1x1 mesh) ---")
    dev = np.array(jax.devices()[:1]).reshape(1, 1)
    mesh = Mesh(dev, ("chan", "time"))
    fn = mesh_mod.build_sharded_gated_demod(mesh, k_per_shard=4096, k2=512)

    # small real workload: 2 blocks of synthetic traffic, 1 channel
    from tools.synth import build_standard_capture

    cap = build_standard_capture(duration_s=0.15, n_aircraft=4, seed=21)
    iq = cap.render_iq()[: 2 * BLOCK_SAMPLES]
    i8 = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    q8 = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    inter = np.empty(iq.shape[0] * 2, np.uint8)
    inter[0::2] = i8
    inter[1::2] = q8
    mag = np.asarray(pl_mod._to_mag(jnp.asarray(inter), "uc8")).astype(np.uint16)
    stream = jnp.asarray(mag).reshape(1, -1)
    tbl = jnp.full(128, TBL_SENTINEL, jnp.int32)

    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(stream, tbl))
    t_compile = time.perf_counter() - t0
    n_keep = int(np.asarray(out.n_keep).sum())
    offs = np.asarray(out.offsets).reshape(-1)
    offs = np.sort(offs[offs >= 0])
    mark(f"sharded compile+run {t_compile:.1f}s n_keep={n_keep}")

    # parity: unsharded gated path on the same magnitudes
    from readsb_tpu.pipeline import Demodulator

    d = Demodulator(blocks_per_batch=2)
    frames = d.process_mag(mag) + d.flush()
    hexes_unsharded = sorted(f.msg.hex() for f in frames)

    # honest check: every accepted frame's scan offset must be among the
    # sharded program's kept candidate offsets (ts = off*5 + 768 + phase)
    frame_offs = sorted({(f.timestamp - 768 - f.phase) // 5 for f in frames})
    mark(f"unsharded frames={len(frames)} sharded keeps={len(offs)}")
    off_set = set(int(o) for o in offs)
    covered = all(fo in off_set for fo in frame_offs)
    print("SHARD_PARITY", {
        "platform": jax.devices()[0].platform,
        "n_keep": n_keep,
        "frames_unsharded": len(frames),
        "offsets_cover_frames": bool(covered),
        "compile_plus_run_s": round(t_compile, 1),
    }, flush=True)

    # dispatch timing of the sharded program (carry-chained)
    @jax.jit
    def chain(c):
        out = fn(stream + c.astype(jnp.uint16) * 0, tbl)
        return out.n_keep.reshape(-1)[0] + out.offsets.reshape(-1)[3]

    timeit("sharded gated (1x1 mesh)", chain, reps=10)


def phase_e2e():
    """VERDICT r5 #6: sustained e2e — pipelined feed->gate->readback->
    finalize->track for >= 30 s, reporting MS/s and msgs/s."""
    mark("--- sustained e2e (pipelined, >=30 s) ---")
    from readsb_tpu.pipeline import MultiDemodulator
    from readsb_tpu.decode.fields import decode_frame
    from readsb_tpu.track.tracker import Tracker

    N_CHAN = 64
    from tools.synth import build_standard_capture

    cap = build_standard_capture(duration_s=0.06, n_aircraft=6, seed=9)
    iq = cap.render_iq()[:BLOCK_SAMPLES]
    i8 = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    q8 = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    one = np.empty(BLOCK_SAMPLES * 2, np.uint8)
    one[0::2] = i8
    one[1::2] = q8
    chunk = bytes(one)
    chunks = [chunk] * N_CHAN

    multi = MultiDemodulator(N_CHAN, blocks_per_batch=1)
    frames0 = multi.feed(chunks)
    mark(f"warm ({sum(len(f) for f in frames0)} frames/dispatch)")

    tracker = Tracker(receiver_lat=47.0, receiver_lon=8.0)
    t0 = time.perf_counter()
    dispatches = 0
    nframes = 0
    nmsgs = 0
    while time.perf_counter() - t0 < 30.0:
        frames = multi.feed(chunks)
        dispatches += 1
        for ch in frames:
            nframes += len(ch)
            for f in ch:
                mm = decode_frame(f)
                tracker.update(mm)
                nmsgs += 1
    dt = time.perf_counter() - t0
    samples = dispatches * N_CHAN * BLOCK_SAMPLES
    print("E2E_SUSTAINED", {
        "platform": jax.devices()[0].platform,
        "wall_s": round(dt, 1),
        "dispatches": dispatches,
        "ms_per_dispatch": round(dt / max(dispatches, 1) * 1e3, 1),
        "samples": samples,
        "MSps": round(samples / dt / 1e6, 1),
        "x_realtime": round(samples / dt / 2.4e6, 1),
        "frames": nframes,
        "frames_per_s": round(nframes / dt),
        "tracked_aircraft": len(tracker.aircraft),
    }, flush=True)



# ---------------------------------------------------------------------------
# phase ablate2: finer chain splits + write-cost probes + gate sub-stages
# ---------------------------------------------------------------------------

def dense_lite_call(buf2d, halo_rows, outs):
    """Minimal-work dense pass writing only the named outputs — probes the
    WRITE cost of each output plane (outs: subset of corr/pw/cs)."""
    rows_total = buf2d.shape[0]
    ntiles = rows_total // ROWS
    shapes = []
    specs = []
    if "corr" in outs:
        shapes.append(jax.ShapeDtypeStruct((rows_total, LANES), jnp.int8))
        specs.append(pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM))
    if "pw" in outs:
        shapes.append(jax.ShapeDtypeStruct((5, rows_total, 4), jnp.int32))
        specs.append(pl.BlockSpec((5, ROWS, 4), lambda i: (0, i, 0), memory_space=pltpu.VMEM))
    if "pwT" in outs:
        shapes.append(jax.ShapeDtypeStruct((20, rows_total), jnp.int32))
        specs.append(pl.BlockSpec((20, ROWS), lambda i: (0, i), memory_space=pltpu.VMEM))
    if "cs" in outs:
        for _ in range(2):
            shapes.append(jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32))
            specs.append(pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM))

    def kern(thr_ref, m_ref, halo_ref, *out_refs):
        t_id = pl.program_id(0)
        halo_row = halo_ref[pl.ds(pl.multiple_of(t_id * 8, 8), 8), :][:1]
        m_ext = jnp.concatenate(
            [m_ref[:].astype(jnp.int32), halo_row.astype(jnp.int32)], axis=0
        )
        a = m_ext[:ROWS]
        k = 0
        if "corr" in outs:
            out_refs[k][:] = (a & 7).astype(jnp.int8); k += 1
        if "pw" in outs:
            out_refs[k][:] = jnp.broadcast_to(a[:1, :4].reshape(1, 1, 4), (5, ROWS, 4)); k += 1
        if "pwT" in outs:
            out_refs[k][:] = jnp.broadcast_to(a[:1, :20].reshape(1, 20).T, (20, ROWS)); k += 1
        if "cs" in outs:
            out_refs[k][:] = a; k += 1
            out_refs[k][:] = a + 1; k += 1

    return pl.pallas_call(
        kern,
        out_shape=tuple(shapes),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(specs),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=CPU_SMOKE,
    )(thr.reshape(1), buf2d, halo_rows)


def lite_chain(outs):
    @jax.jit
    def run(c):
        m2d, halo = _dense_inputs(c)
        res = dense_lite_call(m2d, halo, outs)
        if not isinstance(res, tuple):
            res = (res,)
        acc = jnp.int32(0)
        for r in res:
            acc = acc + r.reshape(-1)[12345].astype(jnp.int32)
        return acc

    return run


def phase_ablate2():
    @jax.jit
    def chain_null(c):
        return c + 1

    n = timeit("null chain", chain_null, reps=50, sub_rtt=False)
    RTT_S[0] = max(0.0, n)

    mark("--- dense output write-cost probes ---")
    timeit("lite corr only", lite_chain(("corr",)))
    timeit("lite corr+pw", lite_chain(("corr", "pw")))
    timeit("lite corr+pwT (transposed)", lite_chain(("corr", "pwT")))
    timeit("lite corr+cs", lite_chain(("corr", "cs")))
    timeit("lite corr+pw+cs (all)", lite_chain(("corr", "pw", "cs")))

    mark("--- compact / win / gather splits ---")

    @jax.jit
    def chain_dense_only(c):
        corrbits, pwords, cs_hi, cs_lo = common(c)
        return corrbits[999].astype(jnp.int32) + pwords[0, 777] + cs_hi[123]

    @jax.jit
    def chain_plus_compact(c):
        corrbits, pwords, cs_hi, cs_lo = common(c)
        cand = (corrbits[:SCAN] & 8) != 0
        offsets, max_local = _compact_two_level(cand, K, L, SCAN)
        return offsets[77] + max_local + cs_hi[123] + pwords[0, 777]

    @jax.jit
    def chain_plus_win(c):
        corrbits, pwords, cs_hi, cs_lo = common(c)
        cand = (corrbits[:SCAN] & 8) != 0
        offsets, max_local = _compact_two_level(cand, K, L, SCAN)
        win, nv = demod_ops.win_rows(corrbits, pwords, SCAN)
        return offsets[77] + win[999, 3] + cs_hi[123]

    timeit("dense only (production)", chain_dense_only)
    timeit("+ compaction", chain_plus_compact)
    timeit("+ win rows (no gather)", chain_plus_win)

    @jax.jit
    def chain_prefix_only(c):
        rows, offsets, cs_hi, cs_lo = kernel_prefix(c)
        return rows[77, 3] + offsets[11] + cs_hi[123]

    timeit("+ row gather (= prefix)", chain_prefix_only)

    mark("--- extract variants ---")
    timeit("extract rot-only", extract_chain("rot"))
    timeit("extract +unpack", extract_chain("unpack"))
    timeit("extract +mat1", extract_chain("mat1"))
    timeit("extract full (variant)", extract_chain("full"))

    @jax.jit
    def chain_prod_extract(c):
        rows, offsets, cs_hi, cs_lo = kernel_prefix(c)
        comb = pk.extract_syndromes_pallas(rows, offsets, interpret=CPU_SMOKE)
        return comb[33, 0] + comb[55, 9] + offsets[11]

    timeit("extract production", chain_prod_extract)

    mark("--- gate sub-stages ---")
    timeit("gate none (bc only)", gate_chain("none"))
    timeit("gate member", gate_chain("member"))
    timeit("gate +teach", gate_chain("teach"))
    timeit("gate +keepcompact", gate_chain("keepcompact"))
    timeit("gate +sums", gate_chain("sums"))
    timeit("gate FULL (score_gate)", gate_full_chain())



def phase_prod():
    """Production-path timings after the r5 kernel/layout fixes (pw lane
    matmul, fused compaction select, row-gather window sums)."""
    @jax.jit
    def chain_null(c):
        return c + 1

    n = timeit("null chain", chain_null, reps=50, sub_rtt=False)
    RTT_S[0] = max(0.0, n)

    @jax.jit
    def chain_dense_only(c):
        corrbits, pwords, cs_hi, cs_lo = common(c)
        return corrbits[999].astype(jnp.int32) + pwords[0, 777] + cs_hi[123]

    @jax.jit
    def chain_plus_compact(c):
        corrbits, pwords, cs_hi, cs_lo = common(c)
        cand = (corrbits[:SCAN] & 8) != 0
        offsets, max_local = _compact_two_level(cand, K, L, SCAN)
        return offsets[77] + max_local + cs_hi[123] + pwords[0, 777]

    @jax.jit
    def chain_prefix_only(c):
        rows, offsets, cs_hi, cs_lo = kernel_prefix(c)
        return rows[77, 3] + offsets[11] + cs_hi[123]

    @jax.jit
    def chain_prod_extract(c):
        rows, offsets, cs_hi, cs_lo = kernel_prefix(c)
        comb = pk.extract_syndromes_pallas(rows, offsets, interpret=CPU_SMOKE)
        return comb[33, 0] + comb[55, 9] + offsets[11]

    timeit("dense (new pw layout)", chain_dense_only)
    timeit("+ compaction (fused select)", chain_plus_compact)
    timeit("+ win + gather", chain_prefix_only)
    timeit("+ extract", chain_prod_extract)
    timeit("gate FULL (row-gather sums)", gate_full_chain())

    # the full multichannel production program (the driver bench shape)
    mark("--- multichannel production program (bench shape) ---")
    N_CHAN = 64
    words = jnp.asarray(
        np.frombuffer(raw.tobytes()[: N_CHAN * BLOCK_SAMPLES * 2 * 2][: N_CHAN * BLOCK_SAMPLES * 2], dtype="<u2")
        .reshape(N_CHAN, BLOCK_SAMPLES)
    ) if SCAN >= N_CHAN * BLOCK_SAMPLES else None
    if words is None:
        mark("workload too small for C=64; skipped")
        return
    from readsb_tpu.pipeline import MultiDemodulator

    multi = MultiDemodulator(N_CHAN, blocks_per_batch=1)
    vl = jnp.int32(multi.seg_valid)
    tbl = jnp.full(128, TBL_SENTINEL, jnp.int32)
    margs = dict(
        k=multi.k, scan_len=multi.scan_len, l=multi.compact_l, k2=multi.gate_k2,
        nfix=multi.nfix, fix_df=multi.fix_df, reset_every=multi.block_samples,
        seg_stride=multi.seg_stride, seg_valid=multi.seg_valid,
        keep_l=multi.gate_keep_l,
    )

    @functools.partial(jax.jit, static_argnames=tuple(margs))
    def chain_multi(c, **kw):
        ovs = jnp.zeros((N_CHAN, TRAILING_SAMPLES), jnp.uint16) + c.astype(jnp.uint16)
        gc = pl_mod._demod_and_gate_multi_raw(words, ovs, vl, jnp.int32(58), tbl, **kw)
        return gc.n_cand + gc.n_keep + gc.offsets[5]

    run_multi = lambda c: chain_multi(c, **margs)  # noqa: E731
    timeit("MULTI production (C=64 raw)", run_multi)


if __name__ == "__main__":
    for ph in PHASES:
        try:
            {"ablate": phase_ablate, "ablate2": phase_ablate2, "prod": phase_prod, "shard": phase_shard, "e2e": phase_e2e}[ph]()
        except Exception as e:
            import traceback

            traceback.print_exc()
            mark(f"phase {ph} FAILED: {e}")
    mark("session done")
