"""One TPU measurement session: convert variants + stage ablation +
multichannel aggregate — a single process, a single relay claim.

Measurement methodology for the axon relay (round-3 findings):
- block_until_ready can return fire-and-forget mirages even after the
  process's first readback;
- an explicit per-rep readback is honest but pays ~26 ms relay RTT plus
  ~50 ms/MB transfer, drowning the kernel time.

So every timed program threads a tiny int32 carry through the reps: the
carry depends on the program's outputs, forcing each rep's compute to
actually run and the reps to serialize ON DEVICE, while only ONE scalar
readback happens at the end.  per-rep = (wall - one RTT) / reps.

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
from readsb_tpu.ops.gate import TBL_SENTINEL
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

RTT_S = [0.0]  # measured null chain overhead per rep


def timeit(name, chain_fn, reps=10, sub_rtt=True):
    """chain_fn: jitted (carry:int32) -> new_carry — whole rep on device."""
    c = chain_fn(jnp.int32(0))
    int(c)  # warm + honest barrier
    best = float("inf")
    for _ in range(3):
        c = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(reps):
            c = chain_fn(c)
        int(c)  # ONE readback for the whole chain
        total = time.perf_counter() - t0
        best = min(best, total / reps)
    net = best - (RTT_S[0] if sub_rtt else 0.0)
    mark(f"{name:30s} {net*1e3:9.3f} ms {SCAN/max(net,1e-9)/1e6:9.0f} MS/s")
    return net


# --------------------------------------------------------------- null chain
@jax.jit
def chain_null(c):
    return c + 1


n = timeit("null chain (per-rep ovh)", chain_null, reps=50, sub_rtt=False)
RTT_S[0] = max(0.0, n)
mark(f"(per-rep dispatch overhead {RTT_S[0]*1e3:.3f} ms subtracted below)")


# ---------------------------------------------------------------- convert
def conv_chain(kernel):
    @jax.jit
    def run(c):
        iq = raw_j
        nsl = iq.shape[0] // 2
        words = jax.lax.bitcast_convert_type(
            (iq + c.astype(jnp.uint8)).reshape(nsl, 2), jnp.uint16
        ).reshape(nsl // pk.LANES, pk.LANES)
        mag = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nsl // pk.LANES, pk.LANES), jnp.uint16),
            grid=(nsl // (pk.ROWS_PER_STEP * pk.LANES),),
            in_specs=[
                pl.BlockSpec((1, pk.LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((pk.ROWS_PER_STEP, pk.LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((pk.ROWS_PER_STEP, pk.LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.asarray(pk._sq_table_np()).reshape(1, pk.LANES), words)
        return mag[123, 45].astype(jnp.int32)

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


timeit("conv a: current exact", conv_chain(pk._uc8_kernel))
timeit("conv b: no gather", conv_chain(_conv_nogather))
timeit("conv c: no cr_sqrt", conv_chain(_conv_nocr))
timeit("conv d: minimal", conv_chain(_conv_minimal))


# ---------------------------------------------------------------- stages
def common(c):
    mag = pl_mod._to_mag(raw_j, "uc8")
    buf = jnp.concatenate([overlap + c.astype(jnp.uint16), mag])
    tile = pk.DENSE_ROWS * pk.LANES
    padded = ((buf.shape[0] + tile - 1) // tile) * tile
    bufp = jnp.pad(buf, (0, padded - buf.shape[0]))
    return pk.dense_scan_pallas(bufp, thr)


@jax.jit
def chain_dense(c):
    corrbits, pwords, cs_hi, cs_lo = common(c)
    return corrbits[999].astype(jnp.int32) + pwords[0, 777] + cs_hi[123] - cs_lo[45]


@jax.jit
def chain_compact(c):
    corrbits, pwords, cs_hi, cs_lo = common(c)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    return offsets[77] + max_local + cs_hi[123]


@jax.jit
def chain_kernel(c):
    corrbits, pwords, cs_hi, cs_lo = common(c)
    cand = (corrbits[:SCAN] & 8) != 0
    offsets, max_local = _compact_two_level(cand, K, L, SCAN)
    win, nv = demod_ops.win_rows(corrbits, pwords, SCAN)
    rows = win[jnp.clip(offsets >> 8, 0, nv - 1)]
    comb = pk.extract_syndromes_pallas(rows, offsets)
    return comb[33, 0] + comb[55, 9] + offsets[11]


@jax.jit
def chain_full(c):
    bc = demod_ops.demod_block(
        jnp.concatenate([overlap + c.astype(jnp.uint16), pl_mod._to_mag(raw_j, "uc8")]),
        thr, k=K, scan_len=SCAN, l=L,
    )
    return bc.offsets[3] + bc.syn112[9, 2] + bc.n_cand + bc.sig_long[4, 0]


_tbl = jnp.full(2048, TBL_SENTINEL, jnp.int32)


@jax.jit
def chain_gate(c):
    gc, ov2, lv, pw = pl_mod._demod_and_gate(
        pl_mod._to_mag(raw_j, "uc8"), overlap + c.astype(jnp.uint16),
        jnp.int32(SCAN), thr, _tbl,
        k=K, scan_len=SCAN, l=L, k2=1024, nfix=1, fix_df=True,
        reset_every=BLOCK_SAMPLES,
    )
    return gc.n_cand + gc.n_keep + gc.offsets[5] + gc.syn112[7, 1]


timeit("convert+dense", chain_dense)
timeit("+compaction", chain_compact)
timeit("+win/gather/extract-kernel", chain_kernel)
timeit("FULL demod_block", chain_full)
best_gate = timeit("FULL demod+gate", chain_gate)

# ------------------------------------------------------------ multichannel
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

    def make_chain(mags, ovs, seg_valid, stride, scan_len, kk, k2):
        @jax.jit
        def chain(c):
            gc, ov2, lv, pw = pl_mod._demod_and_gate_multi(
                mags, ovs + c.astype(jnp.uint16), jnp.int32(seg_valid), thr, _tbl,
                k=kk, scan_len=scan_len, l=L, k2=k2,
                nfix=1, fix_df=True, reset_every=BLOCK_SAMPLES,
                seg_stride=stride, seg_valid=seg_valid,
            )
            return gc.n_cand + gc.n_keep + gc.offsets[5]

        return chain

    ch = make_chain(mags, ovs, seg_valid, stride, scan_len, kk, max(1024, 64 * n_chan))
    c = ch(jnp.int32(0))
    int(c)
    best = float("inf")
    for _ in range(3):
        c = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(10):
            c = ch(c)
        int(c)
        best = min(best, (time.perf_counter() - t0) / 10)
    net = best - RTT_S[0]
    mark(
        f"multichannel C={n_chan:3d} x {bpb} blk   {net*1e3:9.3f} ms "
        f"{total/max(net,1e-9)/1e6:9.0f} MS/s aggregate"
    )

mark("session done")
