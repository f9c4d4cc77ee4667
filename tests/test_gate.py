"""Device score gate equivalence: gated pipeline == ungated pipeline.

The gate (ops/gate.py) drops only candidates the host finalizer would
provably reject, so frames AND stats must be bit-identical with the full
path.  Runs the pure-jnp gate on CPU — the same code the TPU executes.
"""

import numpy as np
import pytest

from readsb_tpu.pipeline import Demodulator
from tools.synth import build_standard_capture


def _run(raw: bytes, use_gate: bool, use_native):
    demod = Demodulator(
        fmt="uc8", blocks_per_batch=2, use_gate=use_gate, use_native=use_native
    )
    frames = demod.feed(raw)
    frames += demod.flush()
    return frames, demod.stats


@pytest.fixture(scope="module")
def capture_bytes():
    cap = build_standard_capture(duration_s=1.0, n_aircraft=5, seed=11)
    iq = cap.render_iq()
    i8 = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    q8 = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    raw = np.empty(len(iq) * 2, dtype=np.uint8)
    raw[0::2] = i8
    raw[1::2] = q8
    return bytes(raw)


def _assert_equal(fa, sa, fb, sb):
    assert [(f.msg, f.timestamp, f.phase, f.score) for f in fa] == [
        (f.msg, f.timestamp, f.phase, f.score) for f in fb
    ]
    assert sa.preambles == sb.preambles
    assert sa.rejected_bad == sb.rejected_bad
    assert sa.rejected_unknown_icao == sb.rejected_unknown_icao
    assert list(sa.accepted) == list(sb.accepted)


def test_gate_equivalence_python(capture_bytes):
    fa, sa = _run(capture_bytes, use_gate=False, use_native=False)
    fb, sb = _run(capture_bytes, use_gate=True, use_native=False)
    assert len(fa) > 10  # the capture actually decodes traffic
    _assert_equal(fa, sa, fb, sb)


def test_gate_equivalence_native(capture_bytes):
    from readsb_tpu import native as native_mod

    if native_mod.load() is None:
        pytest.skip("native finalizer unavailable")
    fa, sa = _run(capture_bytes, use_gate=False, use_native=True)
    fb, sb = _run(capture_bytes, use_gate=True, use_native=True)
    _assert_equal(fa, sa, fb, sb)


def test_gate_transfers_little(capture_bytes):
    demod = Demodulator(fmt="uc8", blocks_per_batch=2, use_gate=True, use_native=False)
    frames = demod.feed(capture_bytes)
    # gate keeps only plausible candidates: payload rows ~frames, not ~1% of samples
    assert demod.gate_k2 <= 2048
    assert demod._gate_drops[0] > 0  # noise candidates were dropped on device
    assert len(frames) > 0
