"""Micro-benchmarks of TPU primitive variants for the demod hot stages.

Run on the real chip to choose implementations (see tools/profile_demod.py
for the stage-level numbers that motivated these experiments).
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

N = 16 * 131072  # 2.1M scan
K = 32768
BLK = 256  # two-level block size

rng = np.random.default_rng(0)
cand_np = rng.random(N) < 0.013
cand = jnp.asarray(cand_np)
m = jnp.asarray(rng.integers(0, 65535, N + 512, dtype=np.uint16))
offsets = jnp.asarray(np.sort(rng.integers(0, N, K)).astype(np.int32))
bits = jnp.asarray(rng.integers(0, 2, (K, 5, 112), dtype=np.int8))

# Axon relay: block_until_ready is a no-op until the process's first
# device->host readback; do one now so every timing below is honest.
# (Each dispatch still pays ~2.4 ms of relay overhead afterwards, so treat
# small absolute numbers as overhead-dominated; compare deltas.)
_ = float(jnp.sum(m[:128].astype(jnp.float32)))


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:46s} {best*1e3:9.3f} ms", flush=True)
    return out


# ---------------- compaction variants ----------------

@jax.jit
def compact_scatter(c):
    ci = c.astype(jnp.int32)
    pos = jnp.cumsum(ci) - 1
    idx = jnp.where(c, pos, K + 10)
    out = jnp.full(K + 16, N, dtype=jnp.int32)
    out = out.at[idx].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    return out[:K]

ref = timeit("compact: cumsum+scatter (current)", compact_scatter, cand)


@jax.jit
def compact_sort(c):
    keys = jnp.where(c, jnp.arange(N, dtype=jnp.int32), jnp.int32(2**31 - 1))
    return jax.lax.sort(keys)[:K]

o = timeit("compact: lax.sort 2M i32", compact_sort, cand)
print("   sort matches:", bool(jnp.all(jnp.where(o == 2**31 - 1, N, o) == ref)))


@jax.jit
def compact_topk(c):
    keys = jnp.where(c, -jnp.arange(N, dtype=jnp.float32), -jnp.float32(3e9))
    v, _ = jax.lax.top_k(keys, K)
    return (-v).astype(jnp.int32)

o = timeit("compact: top_k f32", compact_topk, cand)


@jax.jit
def compact_twolevel(c):
    nb = N // BLK
    c2 = c.reshape(nb, BLK)
    ci = c2.astype(jnp.float32)
    # intra-block exclusive prefix via triangular f32 matmul (exact: sums < 2^24)
    tri = jnp.asarray(np.tril(np.ones((BLK, BLK), np.float32), -1))
    local_excl = jax.lax.dot(ci, tri.T, preferred_element_type=jnp.float32)
    counts = jnp.sum(ci, axis=1)
    block_excl = (jnp.cumsum(counts) - counts).astype(jnp.int32)  # (nb,)
    slot = (local_excl.astype(jnp.int32) + block_excl[:, None])  # (nb, BLK)
    # rank->block map: scatter block starts (nb els) then cummax over K
    starts = jnp.zeros(K + 1, jnp.int32)
    starts = starts.at[jnp.minimum(block_excl, K)].max(
        jnp.arange(nb, dtype=jnp.int32), mode="drop")
    blk_of_rank = jax.lax.cummax(starts[:K])
    # local one-hot offsets via small matmul: off_in_blk[b, j] for j < L
    L = 32
    j_iota = jnp.arange(L, dtype=jnp.int32)
    onehot = ((local_excl.astype(jnp.int32)[:, :, None] == j_iota[None, None, :])
              & c2[:, :, None]).astype(jnp.float32)  # (nb, BLK, L)
    i_iota = jnp.arange(BLK, dtype=jnp.float32)
    local_off = jnp.einsum("bil,i->bl", onehot, i_iota).astype(jnp.int32)  # (nb, L)
    rank = jnp.arange(K, dtype=jnp.int32)
    local_rank = rank - block_excl[blk_of_rank]
    off = local_off[blk_of_rank, jnp.minimum(local_rank, L - 1)]
    total = jnp.sum(counts).astype(jnp.int32)
    return jnp.where(rank < total, blk_of_rank * BLK + off, N)

o = timeit("compact: two-level matmul", compact_twolevel, cand)
print("   two-level matches:", bool(jnp.all(o == ref)))

# ---------------- cumsum variants ----------------

x32 = m[:N].astype(jnp.int32)

timeit("cumsum 2M i32 (jnp)", jax.jit(jnp.cumsum), x32)

@jax.jit
def cumsum_twolevel(x):
    nb = N // BLK
    x2 = x.reshape(nb, BLK)
    hi = (x2 >> 8).astype(jnp.float32)   # < 256
    lo = (x2 & 0xFF).astype(jnp.float32)
    tri = jnp.asarray(np.tril(np.ones((BLK, BLK), np.float32)))
    phi = jax.lax.dot(hi, tri.T)  # sums < 2^16 * BLK = exact in f32
    plo = jax.lax.dot(lo, tri.T)
    local = (phi.astype(jnp.int32) << 8) + plo.astype(jnp.int32)
    bsum = local[:, -1]
    bpre = jnp.cumsum(bsum) - bsum
    return (local + bpre[:, None]).reshape(-1)

o = timeit("cumsum 2M two-level matmul", cumsum_twolevel, x32)
print("   cumsum matches:", bool(jnp.all(o == jnp.cumsum(x32))))

# ---------------- plane packing variants ----------------

planes = jnp.asarray(rng.integers(0, 2, (5, N), dtype=np.uint8) > 0)

@jax.jit
def pack_shift_sum(p):
    nwords = N // 32
    b = p.reshape(5, nwords, 32).astype(jnp.int32)
    return jnp.sum(b << jnp.arange(32, dtype=jnp.int32)[None, None, :], axis=-1)

ref_w = timeit("pack: reshape+shift+sum (current)", pack_shift_sum, planes)

@jax.jit
def pack_matmul(p):
    nwords = N // 32
    b = p.reshape(5 * nwords, 32).astype(jnp.float32)
    w = jnp.asarray((1 << np.arange(16)).astype(np.float32))
    lo = jax.lax.dot(b[:, :16], w[:, None])
    hi = jax.lax.dot(b[:, 16:], w[:, None])
    return (lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)).reshape(5, nwords)

o = timeit("pack: two-half f32 matmul", pack_matmul, planes)
print("   pack matches:", bool(jnp.all(o == ref_w)))

@jax.jit
def pack_dot_general(p):
    # (5, nwords, 32) x (32,) batched via dot_general on the last dim
    nwords = N // 32
    b = p.reshape(5 * nwords, 32)
    blo = b[:, :16].astype(jnp.bfloat16)
    bhi = b[:, 16:].astype(jnp.bfloat16)
    w = jnp.asarray((1 << np.arange(16)).astype(np.float32)).astype(jnp.bfloat16)
    lo = jax.lax.dot(blo, w[:, None], preferred_element_type=jnp.float32)
    hi = jax.lax.dot(bhi, w[:, None], preferred_element_type=jnp.float32)
    return (lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)).reshape(5, nwords)

o = timeit("pack: two-half bf16 matmul", pack_dot_general, planes)
print("   pack bf16 matches:", bool(jnp.all(o == ref_w)))

# ---------------- syndrome matmul variants ----------------

comb_np = rng.integers(0, 2, (112, 48)).astype(np.float32)
pack_np = np.zeros((112, 16), np.float32)
for b in range(112):
    pack_np[b, b // 8] = float(128 >> (b % 8))
comb62 = np.concatenate([comb_np, pack_np[:, :14]], axis=1)

@jax.jit
def syn_bf16(bits):
    c = jnp.asarray(comb62, dtype=jnp.bfloat16)
    out = jax.lax.dot(bits.reshape(K * 5, 112).astype(jnp.bfloat16), c,
                      preferred_element_type=jnp.float32)
    return out.astype(jnp.int32)

timeit("syn: bf16 dot (K*5,112)@(112,62)", syn_bf16, bits)

@jax.jit
def syn_f32(bits):
    c = jnp.asarray(comb62, dtype=jnp.float32)
    out = jax.lax.dot(bits.reshape(K * 5, 112).astype(jnp.float32), c)
    return out.astype(jnp.int32)

timeit("syn: f32 dot", syn_f32, bits)

@jax.jit
def syn_int8(bits):
    c = jnp.asarray(np.concatenate([comb_np, pack_np[:, :14] / 2], axis=1),
                    dtype=jnp.int8)  # max 64, fits int8
    out = jax.lax.dot(bits.reshape(K * 5, 112), c,
                      preferred_element_type=jnp.int32)
    return out

timeit("syn: int8 dot -> int32", syn_int8, bits)

@jax.jit
def syn_pad128(bits):
    b = jnp.zeros((K * 5, 128), jnp.bfloat16)
    b = b.at[:, :112].set(bits.reshape(K * 5, 112).astype(jnp.bfloat16))
    c = jnp.zeros((128, 128), jnp.bfloat16)
    c = c.at[:112, :62].set(jnp.asarray(comb62, dtype=jnp.bfloat16))
    out = jax.lax.dot(b, c, preferred_element_type=jnp.float32)
    return out[:, :62].astype(jnp.int32)

timeit("syn: bf16 dot padded to 128", syn_pad128, bits)

# ---------------- word gather / extract sub-parts ----------------

NW = N // 32 + 16
pw = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (5, NW), dtype=np.int64).astype(np.int32))

@jax.jit
def g_words(pw, offsets):
    w0 = offsets >> 5
    widx = w0[:, None] + jnp.arange(11, dtype=jnp.int32)[None, :]
    return pw[:, widx]  # (5, K, 11)

words = timeit("s4a word gather (5,K,11)", g_words, pw, offsets)

@jax.jit
def g_words_T(pw, offsets):
    # gather from transposed table: rows = words, minor = planes
    pwt = pw.T  # (NW, 5)
    w0 = offsets >> 5
    widx = w0[:, None] + jnp.arange(11, dtype=jnp.int32)[None, :]
    return pwt[widx]  # (K, 11, 5)

words_t = timeit("s4a word gather rows-of-5 (K,11,5)", g_words_T, pw, offsets)

@jax.jit
def g_transpose(words):
    return jnp.transpose(words, (1, 0, 2)).reshape(K, 55)

wf = timeit("s4b transpose (5,K,11)->(K,55)", g_transpose, words)

flat_lo_np = rng.integers(0, 54, (5, 112)).astype(np.int32)

@jax.jit
def g_take(wf, offsets):
    s = offsets & 31
    flat_lo = jnp.asarray(flat_lo_np)
    bitpos = jnp.asarray(rng.integers(0, 31, (5, 112)).astype(np.int32))[None] + s[:, None, None]
    lo = wf[:, flat_lo]
    hi = wf[:, flat_lo + 1]
    sel = jnp.where(bitpos < 32, lo, hi)
    return (jax.lax.shift_right_logical(sel, bitpos & 31) & 1).astype(jnp.bfloat16)

timeit("s4c static take+shift (K,5,112)", g_take, wf, offsets)
