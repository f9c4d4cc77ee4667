"""Benchmark: sustained Mode-S demodulation throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "demod_throughput", "value": <M samples/s>, "unit": "Msamples/s",
   "vs_baseline": <value / 2.4>}

Baseline: the reference readsb demodulator sustains 2.4 MS/s realtime on
a single CPU core (BASELINE.md); vs_baseline is the "x realtime" factor
per chip.  North star: >= 1000x (2.4 G samples/s/chip).

The headline is the AGGREGATE multichannel rate: 64 virtual receiver
channels (one 131072-sample block each — the reference's SDR buffer
cadence, readsb.c:228) demodulated by one dispatch of the production
channel-batched program (pipeline._demod_and_gate_multi), i.e. the
designed batch x phase x channel route to the north star (SURVEY 2.5).
A single-channel 64-block superblock is measured as an extra.

Measurement methodology (round-3; see tools/tpu_session.py and the
verify skill): through the axon relay, block_until_ready can return
fire-and-forget mirages and explicit readbacks cost ~26 ms + 50 ms/MB.
Reps therefore thread an int32 carry (derived from the outputs) back
into the next dispatch's overlap rows: compute serializes ON DEVICE and
one scalar readback settles the chain; the null-chain dispatch overhead
(~1 ms) is measured and subtracted.

Compile-time rule: cold remote compiles take minutes — more than the
driver budget — so bench.py uses the committed .jax_cache_bench/
persistent cache; keep it warm by rerunning bench.py after touching the
device program.
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

T_START = time.time()
EXTRAS_DEADLINE_S = float(os.environ.get("BENCH_EXTRAS_DEADLINE", "240"))

N_CHAN = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def mark(what):
    print(f"# bench +{time.time()-T_START:.0f}s: {what}", file=sys.stderr, flush=True)


def build_workload(n_blocks: int, seed: int = 3):
    """UC8 IQ bytes for n_blocks demod blocks with realistic traffic."""
    from readsb_tpu.constants import BLOCK_SAMPLES
    from tools.synth import build_standard_capture

    total = n_blocks * BLOCK_SAMPLES
    dur = total / 2.4e6
    cap = build_standard_capture(duration_s=dur + 0.1, n_aircraft=8, seed=seed)
    iq = cap.render_iq()[:total]
    i8 = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    q8 = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    raw = np.empty(total * 2, dtype=np.uint8)
    raw[0::2] = i8
    raw[1::2] = q8
    return raw, total


def run():
    import jax

    cache_dir = os.path.join(_REPO, ".jax_cache_bench")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # cache is an optimization, never a requirement
        mark(f"compilation cache unavailable: {e}")

    import jax.numpy as jnp

    from readsb_tpu.constants import BLOCK_SAMPLES, TRAILING_SAMPLES
    from readsb_tpu import pipeline as pl_mod
    from readsb_tpu.pipeline import MultiDemodulator

    raw, total = build_workload(N_CHAN)
    mark("workload built")

    # one 131072-sample block per channel per dispatch
    multi = MultiDemodulator(N_CHAN, blocks_per_batch=1)
    chunks = [
        bytes(raw[c * BLOCK_SAMPLES * 2 : (c + 1) * BLOCK_SAMPLES * 2])
        for c in range(N_CHAN)
    ]

    _ = float(jnp.sum(jnp.zeros(8, jnp.float32)))
    mark("device attached")

    frames = multi.feed(chunks)
    nframes = sum(len(f) for f in frames)
    mark(f"pipeline compiled + warm ({nframes} frames, k={multi.k})")

    words = jnp.asarray(
        np.frombuffer(raw.tobytes(), dtype="<u2").reshape(N_CHAN, BLOCK_SAMPLES)
    )
    jax.block_until_ready(words)
    margs = dict(
        k=multi.k, scan_len=multi.scan_len, l=multi.compact_l, k2=multi.gate_k2,
        nfix=multi.nfix, fix_df=multi.fix_df, reset_every=multi.block_samples,
        seg_stride=multi.seg_stride, seg_valid=multi.seg_valid,
        keep_l=multi.gate_keep_l,
    )
    vl = jnp.int32(multi.seg_valid)
    thr = jnp.int32(58)
    tbl = multi.mirror.tbl

    import functools

    @functools.partial(jax.jit, static_argnames=tuple(margs))
    def chain(c, **kw):
        # the production fused path: raw UC8 words, no magnitude array
        ovs = jnp.zeros((N_CHAN, TRAILING_SAMPLES), jnp.uint16) + c.astype(jnp.uint16)
        gc = pl_mod._demod_and_gate_multi_raw(words, ovs, vl, thr, tbl, **kw)
        return gc.n_cand + gc.n_keep + gc.offsets[5]

    @jax.jit
    def chain_null(c):
        return c + 1

    # null chain: per-rep dispatch overhead
    c = chain_null(jnp.int32(0))
    int(c)
    t0 = time.perf_counter()
    c = jnp.int32(0)
    for _ in range(50):
        c = chain_null(c)
    int(c)
    ovh = (time.perf_counter() - t0) / 50
    mark(f"null-chain overhead {ovh*1e3:.2f} ms/rep")

    c = chain(jnp.int32(0), **margs)
    int(c)
    mark("measurement program warm")
    reps = 10
    runs = []
    for _ in range(5):
        c = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(reps):
            c = chain(c, **margs)
        int(c)
        runs.append((time.perf_counter() - t0) / reps)
    runs.sort()
    med = runs[len(runs) // 2]  # median, not best-of (relay variance ~15%)
    mark(f"runs ms: {[round(r*1e3,2) for r in runs]} (median reported)")
    net = max(med - ovh, 1e-9)
    msps = total / net / 1e6

    # ---- HEADLINE: print the moment it exists; extras follow ----------------
    print(
        json.dumps(
            {
                "metric": "demod_throughput",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / 2.4, 1),
            }
        ),
        flush=True,
    )
    mark(
        f"headline: C={N_CHAN} channels x 1 block, {net*1e3:.1f} ms/dispatch"
        f" -> {msps:.0f} MS/s aggregate ({msps/2.4:.0f}x realtime)"
        f" | {jax.devices()[0]}"
    )

    # --- extras (best-effort within the wall budget) ------------------------
    if time.time() - T_START < EXTRAS_DEADLINE_S:
        t0 = time.perf_counter()
        nframes = sum(len(f) for f in multi.feed(chunks))
        dt = time.perf_counter() - t0
        mark(
            f"e2e multichannel feed: {total/dt/1e6:.0f} MS/s, {nframes} frames"
            " (relay-transfer-bound here; PCIe hosts approach the device rate)"
        )
    else:
        mark("skipping e2e extras (wall budget)")


if __name__ == "__main__":
    run()
