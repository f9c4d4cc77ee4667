"""One TPU measurement session: convert variants + stage ablation +
multichannel aggregate — a single process, a single relay claim.

Through the axon relay, claim acquisition can take many minutes and each
process exit risks wedging the claim; batching every measurement into
one python process is the only reliable way to profile (round-3 note).

Run: python tools/tpu_session.py [n_blocks]
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from readsb_tpu.constants import BLOCK_SAMPLES, TRAILING_SAMPLES
from readsb_tpu.ops import demod as demod_ops
from readsb_tpu.ops import pallas_kernels as pk
from readsb_tpu.ops.demod import _compact_two_level
from readsb_tpu import pipeline as pl_mod

N_BLOCKS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SCAN = N_BLOCKS * BLOCK_SAMPLES
K = 2048 * N_BLOCKS
L = 64
T0 = time.time()


def mark(s):
    print(f"+{time.time()-T0:5.0f}s {s}", flush=True)


rng = np.random.default_rng(0)
raw = rng.integers(0, 256, SCAN * 2, dtype=np.int64).astype(np.uint8)
raw_j = jnp.asarray(raw)
overlap = jnp.zeros(TRAILING_SAMPLES, dtype=jnp.uint16)
thr = jnp.int32(58)
_ = float(jnp.sum(jnp.zeros(4)))
mark("attached")


def _sync(out):
    """Force a real device->host readback (block_until_ready through the
    relay has been observed to lie even after poisoning; see PROGRESS)."""
    leaves = jax.tree_util.tree_leaves(out)
    small = min(leaves, key=lambda a: getattr(a, "size", 1 << 60))
    np.asarray(small)


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
            _sync(out)  # per-rep readback: honest, costs ~1 relay RTT
        best = min(best, (time.perf_counter() - t0) / reps)
    mark(f"{name:30s} {best*1e3:9.3f} ms {SCAN/best/1e6:9.0f} MS/s")
    return best


# ---------------------------------------------------------------- convert
def conv_variant(kernel):
    @jax.jit
    def run(iq):
        n = iq.shape[0] // 2
        words = jax.lax.bitcast_convert_type(
            iq.reshape(n, 2), jnp.uint16
        ).reshape(n // pk.LANES, pk.LANES)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n // pk.LANES, pk.LANES), jnp.uint16),
            grid=(n // (pk.ROWS_PER_STEP * pk.LANES),),
            in_specs=[
                pl.BlockSpec((1, pk.LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((pk.ROWS_PER_STEP, pk.LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((pk.ROWS_PER_STEP, pk.LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(pk._sq_table_np()).reshape(1, pk.LANES), words)
    return run


def _conv_nogather(sqtab_ref, words_ref, mag_ref):
    w = words_ref[:].astype(jnp.int32)
    fi = ((w & 0xFF).astype(jnp.float32) - 127.5) * jnp.float32(1.0 / 127.5)
    fq = (((w >> 8) & 0xFF).astype(jnp.float32) - 127.5) * jnp.float32(1.0 / 127.5)
    s = jnp.minimum(fi * fi + fq * fq, jnp.float32(1.0))
    m = pk._cr_sqrt(s) * jnp.float32(65535.0) + jnp.float32(0.5)
    mag_ref[:] = m.astype(jnp.int32).astype(jnp.uint16)


def _conv_nocr(sqtab_ref, words_ref, mag_ref):
    w = words_ref[:].astype(jnp.int32)
    ib = w & 0xFF
    qb = (w >> 8) & 0xFF
    tab = jnp.broadcast_to(sqtab_ref[:], (w.shape[0], pk.LANES))
    sq_i = jnp.take_along_axis(tab, jnp.minimum(ib, 255 - ib), axis=1)
    sq_q = jnp.take_along_axis(tab, jnp.minimum(qb, 255 - qb), axis=1)
    s = jnp.minimum(sq_i + sq_q, jnp.float32(1.0))
    m = jnp.sqrt(s) * jnp.float32(65535.0) + jnp.float32(0.5)
    mag_ref[:] = m.astype(jnp.int32).astype(jnp.uint16)


def _conv_minimal(sqtab_ref, words_ref, mag_ref):
    w = words_ref[:].astype(jnp.int32)
    m = (((w & 0xFF) * (w & 0xFF)) + ((w >> 8) & 0xFF)).astype(jnp.float32)
    mag_ref[:] = m.astype(jnp.int32).astype(jnp.uint16)


# null-program control: if this also costs ~12 ms, the baseline is relay
# dispatch overhead, not kernel time — divide it out of every number
@jax.jit
def v_null(iq):
    return iq[:256]


timeit("null program (overhead)", v_null, raw_j)
timeit("null reps=100", v_null, raw_j, reps=100)

timeit("conv a: current exact", conv_variant(pk._uc8_kernel), raw_j)
timeit("conv b: no gather", conv_variant(_conv_nogather), raw_j)
timeit("conv c: no cr_sqrt", conv_variant(_conv_nocr), raw_j)
timeit("conv d: minimal", conv_variant(_conv_minimal), raw_j)


# ---------------------------------------------------------------- stages
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


@jax.jit
def v_compact(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    return offsets[::64], max_local, cs_hi[::4096]


@jax.jit
def v_kernel(raw_u8, ov, t):
    corrbits, pwords, cs_hi, cs_lo = common(raw_u8, ov, t)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    win, nv = demod_ops.win_rows(corrbits, pwords, SCAN)
    rows = win[jnp.clip(offsets >> 8, 0, nv - 1)]
    comb = pk.extract_syndromes_pallas(rows, offsets)
    return comb[::64], offsets[::64], cs_hi[::4096]


timeit("convert+dense", v_dense, raw_j, overlap, thr)
timeit("+compaction", v_compact, raw_j, overlap, thr)
timeit("+win/gather/extract-kernel", v_kernel, raw_j, overlap, thr)

full = jax.jit(
    lambda r, ov, t: demod_ops.demod_block(
        jnp.concatenate([ov, pl_mod._to_mag(r, "uc8")]), t, k=K, scan_len=SCAN, l=L
    )
)
timeit("FULL demod_block", full, raw_j, overlap, thr)


def gated(r, ov, t):
    from readsb_tpu.ops.gate import TBL_SENTINEL

    tbl = jnp.full(2048, TBL_SENTINEL, jnp.int32)
    return pl_mod._demod_and_gate(
        pl_mod._to_mag(r, "uc8"), ov, jnp.int32(SCAN), t, tbl,
        k=K, scan_len=SCAN, l=L, k2=1024, nfix=1, fix_df=True,
        reset_every=BLOCK_SAMPLES,
    )


best_gate = timeit("FULL demod+gate", gated, raw_j, overlap, thr)

# ------------------------------------------------------------ multichannel
from readsb_tpu.ops.gate import TBL_SENTINEL

mag_full = jax.jit(lambda r: pl_mod._to_mag(r, "uc8"))(raw_j)
jax.block_until_ready(mag_full)

for n_chan in (8, 64):
    bpb = max(1, N_BLOCKS // n_chan)
    seg_valid = bpb * BLOCK_SAMPLES
    stride = seg_valid + 512
    scan_len = n_chan * stride
    total = n_chan * seg_valid
    kk = 2048 * bpb * n_chan
    mags = mag_full[:total].reshape(n_chan, seg_valid)
    ovs = jnp.zeros((n_chan, TRAILING_SAMPLES), jnp.uint16)
    tbl = jnp.full(2048, TBL_SENTINEL, jnp.int32)

    def multi(m, o):
        return pl_mod._demod_and_gate_multi(
            m, o, jnp.int32(seg_valid), thr, tbl,
            k=kk, scan_len=scan_len, l=L, k2=max(1024, 64 * n_chan),
            nfix=1, fix_df=True, reset_every=BLOCK_SAMPLES,
            seg_stride=stride, seg_valid=seg_valid,
        )

    out = multi(mags, ovs)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = multi(mags, ovs)
            _sync(out)
        best = min(best, (time.perf_counter() - t0) / 10)
    mark(
        f"multichannel C={n_chan:3d} x {bpb} blk   {best*1e3:9.3f} ms "
        f"{total/best/1e6:9.0f} MS/s aggregate"
    )

mark("session done")
