"""Native C++ finalizer equivalence vs the Python reference implementation."""

import numpy as np
import pytest

from readsb_tpu.constants import BLOCK_SAMPLES, TRAILING_SAMPLES
from readsb_tpu.decode.score import Scorer, finalize_block
from readsb_tpu.ops import demod as demod_ops


@pytest.fixture(scope="module")
def native():
    from readsb_tpu import native as native_mod

    if native_mod.load() is None:
        pytest.skip("g++ not available")
    return native_mod


def _candidates(capture_small):
    import jax.numpy as jnp

    from readsb_tpu.ops import convert as convert_ops

    raw = np.fromfile(capture_small + ".uc8.dat", dtype=np.uint8)
    n_blocks = len(raw) // (BLOCK_SAMPLES * 2)
    total = n_blocks * BLOCK_SAMPLES
    mag = convert_ops.mag_uc8(jnp.asarray(raw[: total * 2]))
    buf = jnp.concatenate([jnp.zeros(TRAILING_SAMPLES, dtype=jnp.uint16), mag])
    out = demod_ops.demod_block(buf, 58, k=4096 * n_blocks, scan_len=total)
    return {
        "offsets": np.asarray(out.offsets),
        "n_cand": int(out.n_cand),
        "corr": np.asarray(out.corr_fired),
        "msg": np.asarray(out.msg),
        "s112": np.asarray(out.syn112),
        "s56": np.asarray(out.syn56),
        "sl": np.asarray(out.sigsum_long),
        "ss": np.asarray(out.sigsum_short),
        "scan_len": total,
    }


def test_native_matches_python(capture_small, native):
    c = _candidates(capture_small)

    scorer = Scorer()
    py_frames, py_left = finalize_block(
        scorer, c["offsets"], c["n_cand"], c["corr"], c["msg"], c["s112"],
        c["s56"], c["sl"], c["ss"], scan_len=c["scan_len"],
        reset_every=BLOCK_SAMPLES,
    )

    nf = native.NativeFinalizer()
    nat_frames, nat_left = nf.finalize_block(
        c["offsets"], c["n_cand"], c["corr"], c["msg"], c["s112"], c["s56"],
        c["sl"], c["ss"], scan_len=c["scan_len"], reset_every=BLOCK_SAMPLES,
    )

    assert len(nat_frames) == len(py_frames)
    for pf, nf_ in zip(py_frames, nat_frames):
        assert pf.msg == nf_.msg
        assert pf.timestamp == nf_.timestamp
        assert pf.score == nf_.score
        assert pf.phase == nf_.phase
        assert pf.correctedbits == nf_.correctedbits
        assert pf.addr == nf_.addr
        assert pf.iid == nf_.iid
        assert pf.signal_power == pytest.approx(nf_.signal_power, rel=1e-5)
    assert nat_left == py_left

    st = nf.stats()
    assert st["preambles"] == scorer.stats.preambles
    assert st["rejected_bad"] == scorer.stats.rejected_bad
    assert st["rejected_unknown_icao"] == scorer.stats.rejected_unknown_icao
    assert st["accepted"] == scorer.stats.accepted


def test_native_speed(capture_small, native):
    import time

    c = _candidates(capture_small)
    nf = native.NativeFinalizer()
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        nf2 = native.NativeFinalizer()
        nf2.finalize_block(
            c["offsets"], c["n_cand"], c["corr"], c["msg"], c["s112"], c["s56"],
            c["sl"], c["ss"], scan_len=c["scan_len"], reset_every=BLOCK_SAMPLES,
        )
    dt = (time.perf_counter() - t0) / reps
    rate = c["scan_len"] / dt / 1e6
    print(f"native finalize: {dt*1000:.2f} ms/block-set -> {rate:.0f} MS/s-equiv")
    # must comfortably beat the Python finalizer; the bar is conservative
    # so scheduler noise on a loaded CI box doesn't flake the suite
    assert rate > 100
