"""Micro-benchmarks of TPU primitives that the demod redesign depends on."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

N = 16 * 131072  # 2.1M scan
K = 32768

rng = np.random.default_rng(0)
cand_np = rng.random(N) < 0.013
cand = jnp.asarray(cand_np)
m = jnp.asarray(rng.integers(0, 65535, N + 512, dtype=np.uint16))
offsets = jnp.asarray(np.sort(rng.integers(0, N, K)).astype(np.int32))


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
    print(f"{name:42s} {best*1e3:9.3f} ms")
    return out


timeit("cumsum i32 2M", jax.jit(lambda c: jnp.cumsum(c.astype(jnp.int32))), cand)
timeit("cumsum f32 2M", jax.jit(lambda x: jnp.cumsum(x.astype(jnp.float32) ** 2)), m[:N])

timeit("nonzero size=K", jax.jit(lambda c: jnp.nonzero(c, size=K, fill_value=N)[0]), cand)


@jax.jit
def compact_scatter(c):
    ci = c.astype(jnp.int32)
    pos = jnp.cumsum(ci) - 1  # destination slot for each set bit
    idx = jnp.where(c, pos, K + 10)
    out = jnp.full(K + 16, N, dtype=jnp.int32)
    out = out.at[idx].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    return out[:K]

o2 = timeit("compact: cumsum+scatter", compact_scatter, cand)
print("   scatter-compaction matches nonzero:",
      bool(jnp.all(o2 == jnp.nonzero(cand, size=K, fill_value=N)[0])))

# row gathers at various granularities
for row in (8, 32, 128, 256):
    m2d = m[: (N // row) * row].reshape(-1, row)
    nrows_per_cand = 320 // row + 2
    ridx = (offsets // row)[:, None] + jnp.arange(nrows_per_cand, dtype=jnp.int32)[None, :]
    timeit(f"row gather (K,{nrows_per_cand}) rows of {row} u16",
           jax.jit(lambda md, ri: md[ri]), m2d, ridx)

# packed-word gather: (K, 11) i32 from 1D
w = jnp.asarray(rng.integers(-2**31, 2**31 - 1, N // 32 + 64, dtype=np.int64).astype(np.int32))
widx = (offsets // 32)[:, None] + jnp.arange(11, dtype=jnp.int32)[None, :]
timeit("word gather (K,11) i32 1D", jax.jit(lambda ww, wi: ww[wi]), w, widx)

# 5-plane packed words: gather (K, 11) from each of 5 planes
w5 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (5, N // 32 + 64), dtype=np.int64).astype(np.int32))
timeit("word gather 5x(K,11) i32", jax.jit(lambda ww, wi: ww[:, wi]), w5, widx)

# 2-point cumsum lookup for sig power
cs = jnp.cumsum((m[:N].astype(jnp.float32) / 65535.0) ** 2)
timeit("sig 2-pt lookup (K,2)", jax.jit(lambda c, o: c[o + 288] - c[o + 19]), cs, offsets)

# bit extraction cost model: (K,) ops x 560
@jax.jit
def extract(words, s):
    # words: (K, 11) i32, s: (K,) bit offset 0..31
    acc = jnp.zeros(words.shape[0], dtype=jnp.int32)
    for b in range(0, 560, 5):
        off = 19 + (b * 12) // 5
        w0, r0 = off // 32, off % 32
        bitpos = r0 + s
        lo = words[:, w0] >> jnp.minimum(bitpos, 31)
        hi = words[:, min(w0 + 1, 10)] >> jnp.maximum(bitpos - 32, 0)
        acc += jnp.where(bitpos < 32, lo, hi) & 1
    return acc

timeit("bit extract 112x (K,) shifts", extract, w5[0][widx], offsets % 32)
