"""Pinpoint the Mosaic compile failure of the v2 extract kernel.

Compiles staged variants on the real chip, simplest-last-failure wins.
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

import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from readsb_tpu.ops import pallas_kernels as pk
from readsb_tpu.ops.gate import TBL_SENTINEL

T0 = time.time()


def mark(s):
    print(f"+{time.time()-T0:5.0f}s {s}", flush=True)


K = 2048
rng = np.random.default_rng(0)
rows = jnp.asarray(rng.integers(-(2**31), 2**31, (K, 128), np.int64).astype(np.int32))
offsets = jnp.asarray(np.sort(rng.integers(0, 1 << 20, K).astype(np.int32)))
tbl = jnp.full(2048, TBL_SENTINEL, jnp.int32)
_ = float(jnp.sum(jnp.zeros(4)))
mark("attached")


def try_compile(name, fn):
    try:
        out = fn()
        s = int(jnp.sum(out[:, 0]))
        mark(f"{name:44s} OK (sum {s})")
        return True
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:400]
        mark(f"{name:44s} FAIL {type(e).__name__}: {msg}")
        return False


# 1. full v2 with the SMEM dfd fix, ex_rows=1024 then 512
ok1024 = try_compile(
    "v2 full (SMEM dfd) ex=1024",
    lambda: pk.extract_classify_pallas(rows, offsets, tbl, ex_rows=1024),
)
ok512 = try_compile(
    "v2 full (SMEM dfd) ex=512",
    lambda: pk.extract_classify_pallas(rows, offsets, tbl, ex_rows=512),
)

if not (ok1024 or ok512):
    # staged ablation: build reduced kernels from the same pieces
    s_np, sh_np, m1p_np, m2p_np = pk._extract_v2_mats()

    def make(stage, ex_rows=512):
        def kern(off_ref, rows_ref, s_ref, sh_ref, m1_ref, m2_ref, out_ref):
            ex = rows_ref.shape[0]
            rws = rows_ref[:]
            off = off_ref[:]
            sw, wrot, sb = pk._align_windows(rws, off, ex)
            if stage == "align":
                out_ref[:] = jnp.concatenate(
                    [sw, jnp.zeros((ex, 128 - 55), jnp.int32)], axis=1
                )
                return
            lo16 = (sw & 0xFFFF).astype(jnp.float32)
            hi16 = jax.lax.shift_right_logical(sw, 16).astype(jnp.float32)
            sel = s_ref[:]
            wlo = jax.lax.dot(lo16, sel, preferred_element_type=jnp.float32)
            whi = jax.lax.dot(hi16, sel, preferred_element_type=jnp.float32)
            w560 = wlo.astype(jnp.int32) | (whi.astype(jnp.int32) << 16)
            if stage == "select":
                out_ref[:] = w560[:, :128]
                return
            bits = (
                jax.lax.shift_right_logical(
                    w560, jnp.broadcast_to(sh_ref[:], (ex, pk.N_EMIT))
                )
                & 1
            ).astype(jnp.bfloat16)
            counts = jax.lax.dot(
                bits, m1_ref[:], preferred_element_type=jnp.float32
            ).astype(jnp.int32)
            if stage == "m1":
                out_ref[:] = counts[:, :128]
                return
            parity = (counts & 1).astype(jnp.bfloat16)
            syn = jax.lax.dot(
                parity, m2_ref[:], preferred_element_type=jnp.float32
            ).astype(jnp.int32)
            msg = jnp.concatenate(
                [counts[:, p * 62 + 48 : p * 62 + 62] for p in range(5)], axis=1
            )
            corr = pk._corr_lanes(rws, wrot, sb, ex)
            out_ref[:] = jnp.concatenate(
                [syn[:, :10], msg, corr, jnp.zeros((ex, 128 - 83), jnp.int32)],
                axis=1,
            )

        @jax.jit
        def run():
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((K, 128), jnp.int32),
                grid=(K // ex_rows,),
                in_specs=[
                    pl.BlockSpec((ex_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((ex_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((55, pk.N_EMIT), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, pk.N_EMIT), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((pk.N_EMIT, 310), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((310, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (ex_rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            )(
                offsets.reshape(K, 1),
                rows,
                jnp.asarray(s_np),
                jnp.asarray(sh_np).reshape(1, pk.N_EMIT),
                jnp.asarray(m1p_np, dtype=jnp.bfloat16),
                jnp.asarray(m2p_np, dtype=jnp.bfloat16),
            )

        return run

    for stage in ("align", "select", "m1", "full-noclassify"):
        try_compile(f"v2 stage '{stage}' ex=512", make(stage))

mark("debug session done")
