"""Channel-batched pipeline parity: MultiDemodulator == C independent
Demodulators, frame-for-frame and stats-counter exact, per channel.

The multichannel program shares one device dispatch and one ICAO union
table across channels; per-channel exactness is the invariant that makes
the channel axis a pure throughput knob (SURVEY 2.5 batch axis).
"""

import numpy as np
import pytest

from readsb_tpu.pipeline import Demodulator, MultiDemodulator
from tools.synth import build_standard_capture


def _uc8(cap) -> bytes:
    iq = cap.render_iq()
    i8 = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    q8 = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    raw = np.empty(len(iq) * 2, dtype=np.uint8)
    raw[0::2] = i8
    raw[1::2] = q8
    return bytes(raw)


@pytest.fixture(scope="module")
def captures():
    return [
        _uc8(build_standard_capture(duration_s=0.4, n_aircraft=3, seed=s))
        for s in (5, 6, 7)
    ]


def _key(frames):
    return [(f.msg, f.timestamp, f.phase, f.score) for f in frames]


def _stats_tuple(s):
    return (s.preambles, s.rejected_bad, s.rejected_unknown_icao, list(s.accepted))


@pytest.mark.parametrize("use_native", [False, True])
def test_multichannel_parity(captures, use_native):
    if use_native:
        from readsb_tpu import native as native_mod

        if native_mod.load() is None:
            pytest.skip("native finalizer unavailable")
    n = len(captures)
    multi = MultiDemodulator(n, blocks_per_batch=1, use_native=use_native)
    got = multi.feed(captures)
    tail = multi.flush()
    for c in range(n):
        got[c].extend(tail[c])

    total = 0
    for c in range(n):
        single = Demodulator(
            fmt="uc8", blocks_per_batch=1, use_gate=True, use_native=use_native
        )
        want = single.feed(captures[c])
        want += single.flush()
        assert _key(got[c]) == _key(want), f"channel {c} frames diverge"
        assert _stats_tuple(multi.channel_stats(c)) == _stats_tuple(single.stats), (
            f"channel {c} stats diverge"
        )
        total += len(want)
    assert total > 10  # the capture actually decodes traffic


def test_app_multichannel_ifile(tmp_path):
    """--ifile a.dat,b.dat drives the channel-batched pipeline; the union
    of decoded frames matches per-capture reference decodes."""
    import subprocess
    import sys

    from tests.conftest import REFERENCE_BIN, REPO, run_reference_raw

    caps = [
        build_standard_capture(duration_s=0.4, n_aircraft=3, seed=s)
        for s in (31, 32)
    ]
    paths = []
    for i, cap in enumerate(caps):
        p = str(tmp_path / f"ch{i}.uc8.dat")
        with open(p, "wb") as f:
            f.write(_uc8(cap))
        paths.append(p)

    out = subprocess.run(
        [sys.executable, "-m", "readsb_tpu.app.main", "--device-type", "ifile",
         "--ifile", ",".join(paths), "--iformat", "uc8", "--quiet", "--raw"],
        capture_output=True, text=True, timeout=600, cwd=str(REPO),
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    got = sorted(
        l.strip().lstrip("*").rstrip(";")
        for l in out.stdout.splitlines() if l.startswith("*")
    )
    assert got, out.stderr[-2000:]

    if REFERENCE_BIN.exists():
        want = sorted(
            run_reference_raw(str(REFERENCE_BIN), paths[0], "uc8")
            + run_reference_raw(str(REFERENCE_BIN), paths[1], "uc8")
        )
        assert got == want
