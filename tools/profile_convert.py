"""Isolate the UC8 convert kernel's cost: which part of the 12 ms is the
lane gather vs the correctly-rounded sqrt vs everything else.

Variants b/c are NOT bit-exact — timing only.
Run on the real chip: python tools/profile_convert.py [n_blocks]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from readsb_tpu.constants import BLOCK_SAMPLES
from readsb_tpu.ops import pallas_kernels as pk

N_BLOCKS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = N_BLOCKS * BLOCK_SAMPLES

rng = np.random.default_rng(0)
raw = jnp.asarray(rng.integers(0, 256, N * 2, dtype=np.int64).astype(np.uint8))
_ = float(jnp.sum(jnp.zeros(4)))
T0 = time.time()


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
    print(f"+{time.time()-T0:5.0f}s {name:28s} {best*1e3:9.3f} ms {N/best/1e6:9.0f} MS/s",
          flush=True)


def variant(kernel):
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


timeit("a: current (exact)", variant(pk._uc8_kernel), raw)


def _kernel_nogather(sqtab_ref, words_ref, mag_ref):
    w = words_ref[:].astype(jnp.int32)
    ib = w & 0xFF
    qb = (w >> 8) & 0xFF
    fi = (ib.astype(jnp.float32) - 127.5) * jnp.float32(1.0 / 127.5)
    fq = (qb.astype(jnp.float32) - 127.5) * jnp.float32(1.0 / 127.5)
    s = jnp.minimum(fi * fi + fq * fq, jnp.float32(1.0))
    g = pk._cr_sqrt(s)
    m = g * jnp.float32(65535.0) + jnp.float32(0.5)
    mag_ref[:] = m.astype(jnp.int32).astype(jnp.uint16)


timeit("b: no gather (approx)", variant(_kernel_nogather), raw)


def _kernel_nocrsqrt(sqtab_ref, words_ref, mag_ref):
    w = words_ref[:].astype(jnp.int32)
    ib = w & 0xFF
    qb = (w >> 8) & 0xFF
    ui = jnp.minimum(ib, 255 - ib)
    uq = jnp.minimum(qb, 255 - qb)
    tab = jnp.broadcast_to(sqtab_ref[:], (w.shape[0], pk.LANES))
    sq_i = jnp.take_along_axis(tab, ui, axis=1)
    sq_q = jnp.take_along_axis(tab, uq, axis=1)
    s = jnp.minimum(sq_i + sq_q, jnp.float32(1.0))
    m = jnp.sqrt(s) * jnp.float32(65535.0) + jnp.float32(0.5)
    mag_ref[:] = m.astype(jnp.int32).astype(jnp.uint16)


timeit("c: no cr_sqrt (approx)", variant(_kernel_nocrsqrt), raw)


def _kernel_minimal(sqtab_ref, words_ref, mag_ref):
    w = words_ref[:].astype(jnp.int32)
    ib = w & 0xFF
    qb = (w >> 8) & 0xFF
    m = (ib * ib + qb * qb).astype(jnp.float32)
    mag_ref[:] = m.astype(jnp.int32).astype(jnp.uint16)


timeit("d: minimal arith", variant(_kernel_minimal), raw)
