"""Ablate the score gate's jnp half on-device: where do its ~5 ms go?

Pieces (on top of the known 13.3 ms dense+compact+win/extract chain):
  teach   in-block teach-set compaction + s_vals compare
  class   classification compares (t112/t56/fix/known)
  keep    kept-candidate compaction + row gathers + sig sums
  drops   drop_cum bookkeeping (cumsums + searchsorted)
Run detached; ONE TPU process at a time.
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
from readsb_tpu.ops import demod as demod_ops
from readsb_tpu.ops import pallas_kernels as pk
from readsb_tpu.ops.demod import BlockCandidates, _compact_two_level, window_sums
from readsb_tpu.ops.gate import TBL_SENTINEL, _df_delta_np, _table_syndromes_np, _DF17_FIXABLE
from bench import build_workload

N_CHAN = 64
SEG_VALID = BLOCK_SAMPLES
STRIDE = SEG_VALID + 512
SCAN = N_CHAN * STRIDE
TOTAL = N_CHAN * SEG_VALID
K = 2048 * N_CHAN
K2 = 4096
T0 = time.time()


def mark(s):
    print(f"+{time.time()-T0:5.0f}s {s}", flush=True)


raw, total = build_workload(N_CHAN)
words = jnp.asarray(np.frombuffer(raw.tobytes(), dtype="<u2").reshape(N_CHAN, SEG_VALID))
thr = jnp.int32(58)
tbl = jnp.full(128, TBL_SENTINEL, jnp.int32)
_ = float(jnp.sum(jnp.zeros(4)))
mark("attached")

RTT = [0.0]


def timeit(name, fn, reps=10, sub=True):
    try:
        c = fn(jnp.int32(0))
        int(c)
    except Exception as e:
        mark(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:200]}")
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
    mark(f"{name:34s} {net*1e3:8.3f} ms {TOTAL/max(net,1e-9)/1e6:8.0f} MS/s")
    return net


@jax.jit
def chain_null(c):
    return c + 1


n = timeit("null", chain_null, reps=50, sub=False)
RTT[0] = max(0.0, n or 0.0)


def base(c):
    gap = STRIDE - SEG_VALID - TRAILING_SAMPLES
    ovs = jnp.full((N_CHAN, TRAILING_SAMPLES), 0x8080, jnp.uint16) + c.astype(jnp.uint16)
    seg = jnp.concatenate([ovs, words, jnp.zeros((N_CHAN, gap), words.dtype)], axis=1)
    buf = jnp.pad(seg.reshape(-1), (0, 512))
    tile = pk.DENSE_ROWS * pk.LANES
    padded = ((buf.shape[0] + 512 + tile - 1) // tile) * tile
    corr, pw, ch, cl = pk.dense_scan_uc8_pallas(
        jnp.pad(buf, (0, padded - buf.shape[0])), thr
    )
    cand = (corr[:SCAN] & 8) != 0
    pos = jnp.arange(SCAN, dtype=jnp.int32)
    cand = cand & ((pos % STRIDE) < SEG_VALID)
    offsets, max_local = _compact_two_level(cand, K, 64, SCAN)
    win, nv = demod_ops.win_rows(corr, pw, SCAN)
    rows = win[jnp.clip(offsets >> 8, 0, nv - 1)]
    comb = pk.extract_syndromes_pallas(rows, offsets)
    n_cand = jnp.sum(cand.astype(jnp.int32))
    bc = BlockCandidates(
        offsets=offsets, n_cand=n_cand, max_local=max_local,
        corr_fired=(comb[:, 80:83] != 0) & (offsets < SCAN)[:, None],
        msg=comb[:, 10:80].reshape(K, 5, 14).astype(jnp.uint8),
        syn112=comb[:, 0:5], syn56=comb[:, 5:10],
        sig_long=jnp.zeros((K, 2), jnp.int32),
        sig_short=jnp.zeros((K, 2), jnp.int32),
    )
    return bc, ch, cl


def classify(bc):
    msg = bc.msg.astype(jnp.int32)
    df = msg[:, :, 0] >> 3
    syn112, syn56 = bc.syn112, bc.syn56
    cf = bc.corr_fired
    fired = jnp.stack([cf[:, 0], cf[:, 0], cf[:, 1], cf[:, 1], cf[:, 2]], axis=1)
    zero7 = jnp.sum(msg[:, :, :7], axis=2) == 0
    t112 = jnp.asarray(_table_syndromes_np(112, 1))
    t56 = jnp.asarray(_table_syndromes_np(56, 1))
    in_t112 = jnp.any(syn112[:, :, None] == t112[None, None, :], axis=-1)
    in_t56 = jnp.any(syn56[:, :, None] == t56[None, None, :], axis=-1)
    fix_ok = jnp.zeros_like(df, dtype=bool)
    deltas = _df_delta_np()
    for d in _DF17_FIXABLE:
        fix_ok |= (df == d) & (syn112 == int(deltas[d]))
    residual = jnp.where(df >= 16, syn112, syn56) & 0xFFFFFF
    in_tbl = jnp.any(residual[:, :, None] == tbl[None, None, :], axis=-1)
    is_short = (df == 0) | (df == 4) | (df == 5)
    is_long = (df == 16) | (df == 20) | (df == 21)
    icao_dep = is_short | is_long
    long_ok = ((df == 17) | (df == 18)) & ((syn112 == 0) | in_t112)
    df11_clean = (df == 11) & ((syn56 & 0xFFFF80) == 0)
    df11_corr = (df == 11) & ((syn56 & 0xFFFF80) != 0) & in_t56
    pass_p = ~zero7 & (long_ok | fix_ok | df11_clean | df11_corr | (icao_dep & in_tbl))
    cls = jnp.where(pass_p, 2, jnp.where(~zero7 & icao_dep & ~in_tbl, 1, 0))
    cls = jnp.where(fired, cls, -1)
    return jnp.max(cls, axis=1), df, syn112, syn56


def teach(bc, df, syn112, syn56, fired_any):
    learn = fired_any & (((df == 17) & (syn112 == 0)) | ((df == 11) & (syn56 == 0)))
    flat = learn.reshape(-1)
    aa = ((bc.msg[:, :, 1].astype(jnp.int32) << 16)
          | (bc.msg[:, :, 2].astype(jnp.int32) << 8)
          | bc.msg[:, :, 3].astype(jnp.int32)).reshape(-1)
    nf = flat.shape[0]
    pad = (-nf) % 256
    if pad:
        flat = jnp.pad(flat, (0, pad))
        aa = jnp.pad(aa, (0, pad))
    s_idx, s_w = _compact_two_level(flat, 256, 32, flat.shape[0])
    s_vals = jnp.where(s_idx < nf, aa[jnp.minimum(s_idx, nf - 1)], -1)
    resid = jnp.where(df >= 16, syn112, syn56) & 0xFFFFFF
    in_s = jnp.any(resid[:, :, None] == s_vals[None, None, :], axis=-1)
    return in_s, s_w


def keep_stage(bc, cand_cls, cs_hi, cs_lo):
    valid = (bc.offsets < SCAN) & ((bc.offsets % STRIDE) < SEG_VALID)
    keep = valid & (cand_cls == 2)
    kidx, kw = _compact_two_level(keep, K2, 64, K)
    safe = jnp.minimum(kidx, K - 1)
    live = kidx < K
    offs2 = jnp.where(live, bc.offsets[safe], SCAN)
    msg2 = jnp.where(live[:, None, None], bc.msg[safe], 0)
    sl, ss = window_sums(offs2, cs_hi, cs_lo)
    return offs2, msg2, sl, ss, keep, kw


def drops(bc, cand_cls, keep, offs2):
    valid = (bc.offsets < SCAN) & ((bc.offsets % STRIDE) < SEG_VALID)
    dropped = valid & ~keep
    unk = (dropped & (cand_cls == 1)).astype(jnp.int32)
    bad = (dropped & (cand_cls == 0)).astype(jnp.int32)
    cum_u = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(unk)])
    cum_b = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(bad)])

    def cumlt(x):
        r = jnp.searchsorted(bc.offsets, x, side="left")
        return jnp.stack([cum_u[r], cum_b[r]])

    q = jnp.stack([offs2, offs2 + 113, offs2 + 225], axis=0)
    dq = cumlt(q)
    nb = SEG_VALID // BLOCK_SAMPLES
    local = jnp.arange(1, nb + 1, dtype=jnp.int32) * BLOCK_SAMPLES
    bnds = (jnp.arange(N_CHAN, dtype=jnp.int32)[:, None] * STRIDE + local[None, :]).reshape(-1)
    db = cumlt(jnp.minimum(bnds, SCAN))
    cum_p = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(dropped.astype(jnp.int32))])
    cst = jnp.arange(N_CHAN + 1, dtype=jnp.int32) * STRIDE
    rch = jnp.searchsorted(bc.offsets, cst, side="left")
    dc = jnp.stack([cum_p[rch], cum_u[rch], cum_b[rch]])
    return dq, db, dc


def mk(stages):
    @jax.jit
    def run(c):
        bc, ch, cl = base(c)
        out = bc.offsets[11] + bc.n_cand
        cand_cls, df, s112, s56 = classify(bc)
        if "class" in stages:
            out = out + jnp.sum(cand_cls == 2)
        if "teach" in stages:
            cf = bc.corr_fired
            fired = jnp.stack([cf[:, 0], cf[:, 0], cf[:, 1], cf[:, 1], cf[:, 2]], axis=1)
            in_s, s_w = teach(bc, df, s112, s56, fired)
            out = out + jnp.sum(in_s.astype(jnp.int32)) + s_w
        if "keep" in stages or "drops" in stages:
            offs2, msg2, sl, ss, keep, kw = keep_stage(bc, cand_cls, ch, cl)
            out = out + offs2[5] + sl[3, 0] + kw
            if "drops" in stages:
                dq, db, dc = drops(bc, cand_cls, keep, offs2)
                out = out + dq[0, 0, 0] + db[1, 3] + dc[2, 1]
        return out

    return run


timeit("base (extract chain)", mk(()))
timeit("+classify", mk(("class",)))
timeit("+classify+teach", mk(("class", "teach")))
timeit("+classify+keep", mk(("class", "keep")))
timeit("+classify+keep+drops", mk(("class", "keep", "drops")))
timeit("+ALL", mk(("class", "teach", "keep", "drops")))
mark("done")

# NOTE (r4): the "+classify" composition — extract_syndromes_pallas feeding
# a (K, 5, T) broadcast-compare chain — reproducibly crashes the TPU worker
# process on two separate sessions ("kernel fault"), while the production
# program containing the same math (pipeline._demod_and_gate_multi_raw)
# runs fine.  Likely an XLA fusion across the pallas custom-call boundary;
# kept here as a reproducer, do not run on a chip you need soon.
