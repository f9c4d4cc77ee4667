"""Benchmark: sustained Mode-S demodulation throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "demod_throughput", "value": <M samples/s>, "unit": "Msamples/s",
   "vs_baseline": <value / 2.4>}

Baseline: the reference readsb demodulator sustains 2.4 MS/s realtime on a
single CPU core (BASELINE.md); vs_baseline is therefore the "x realtime"
factor per chip.  North star: >= 1000x (2.4 G samples/s/chip).

The workload is realistic: Gaussian noise at a typical SDR noise floor
plus embedded ADS-B traffic, pre-rendered as UC8 IQ bytes.  The timed
region covers the full device pipeline: UC8 bytes -> magnitude LUT ->
dense preamble correlation -> candidate compaction -> 5-phase slicing ->
CRC syndromes — one flat call per superblock.

Timing uses best-of-trials: the TPU is reached through a tunnel whose
latency is high-variance, so the minimum over several trials reflects the
chip's sustained rate.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from readsb_tpu.constants import BLOCK_SAMPLES, TRAILING_SAMPLES  # noqa: E402


def build_workload(n_blocks: int, seed: int = 3):
    """UC8 IQ bytes for n_blocks demod blocks with realistic traffic."""
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


import jax
import jax.numpy as jnp

from readsb_tpu.ops import convert as convert_ops
from readsb_tpu.ops import demod as demod_ops

N_BLOCKS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
K = 2048 * N_BLOCKS + 256  # +256 dodges a poisoned remote-compile cache entry
TOTAL_SCAN = N_BLOCKS * BLOCK_SAMPLES


# NOTE: the jitted pipeline must be defined at module level: with the
# tunneled TPU backend, jit functions defined inside another function
# reproducibly compile to a ~3000x slower executable (same HLO hash).
@jax.jit
def pipeline(raw_u8, overlap, threshold):
    mag = convert_ops.mag_uc8(raw_u8)
    stream = jnp.concatenate([overlap, mag])
    return demod_ops.demod_block(stream, threshold, k=K, scan_len=TOTAL_SCAN)


def run():
    n_blocks, k, total_scan = N_BLOCKS, K, TOTAL_SCAN
    raw, total = build_workload(n_blocks)

    raw_j = jnp.asarray(raw)
    overlap = jnp.zeros(TRAILING_SAMPLES, dtype=jnp.uint16)
    thr = jnp.int32(58)

    # warmup / compile
    out = pipeline(raw_j, overlap, thr)
    jax.block_until_ready(out)
    n_cand = int(out.n_cand)

    # timed: several trials, keep the best sustained rate
    reps = 10
    best_dt = float("inf")
    for _trial in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = pipeline(raw_j, overlap, thr)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best_dt = min(best_dt, dt)

    msps = total * reps / best_dt / 1e6

    # end-to-end check including the host finalizer (not the headline
    # metric yet; the native finalizer lands in a later milestone)
    from readsb_tpu.decode.score import Scorer, finalize_block

    scorer = Scorer()
    host = [
        np.asarray(out.offsets), np.asarray(out.corr_fired), np.asarray(out.msg),
        np.asarray(out.syn112), np.asarray(out.syn56),
        np.asarray(out.sigsum_long), np.asarray(out.sigsum_short),
    ]
    t0 = time.perf_counter()
    frames, _ = finalize_block(
        scorer, host[0], n_cand, host[1], host[2], host[3], host[4], host[5],
        host[6], scan_len=total_scan, reset_every=BLOCK_SAMPLES,
    )
    dt_host = time.perf_counter() - t0
    host_msps = total / dt_host / 1e6

    print(
        json.dumps(
            {
                "metric": "demod_throughput",
                "value": round(msps, 1),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / 2.4, 1),
            }
        )
    )
    print(
        f"# device: blocks={n_blocks} reps={reps} best_dt={best_dt:.3f}s -> {msps:.0f} MS/s"
        f" | host finalize: {len(frames)} frames, {host_msps:.0f} MS/s-equiv"
        f" | candidates/block={n_cand / n_blocks:.0f} | {jax.devices()[0]}",
        file=sys.stderr,
    )


run()
