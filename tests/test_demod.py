"""End-to-end demod tests on synthetic captures + frame parity vs reference."""

import json

import numpy as np
import pytest

from readsb_tpu.pipeline import demodulate_file
from tests.conftest import run_reference_raw


def test_synthetic_decode(capture_small):
    truth = json.load(open(capture_small + ".truth.json"))
    frames, demod = demodulate_file(capture_small + ".uc8.dat", fmt="uc8")
    truth_hex = {t["hex"] for t in truth}
    got_hex = {f.msg.hex() for f in frames}
    # all strong clean synthetic frames should decode
    recovered = len(truth_hex & got_hex)
    assert recovered >= 0.9 * len(truth_hex), (recovered, len(truth_hex))
    # timestamps are monotonic and in 12MHz units
    ts = [f.timestamp for f in frames]
    assert ts == sorted(ts)


def test_reference_parity_uc8(capture_small, reference_binary):
    """Frame-for-frame parity with the reference demodulator."""
    ref = run_reference_raw(reference_binary, capture_small + ".uc8.dat", "uc8")
    frames, demod = demodulate_file(capture_small + ".uc8.dat", fmt="uc8")
    ours = [f.msg.hex() for f in frames]
    # multiset comparison, order preserved
    assert ours == ref, (
        f"ours={len(ours)} ref={len(ref)} "
        f"missing={set(ref) - set(ours)} extra={set(ours) - set(ref)}"
    )


def test_reference_parity_sc16(capture_small, reference_binary):
    ref = run_reference_raw(reference_binary, capture_small + ".sc16.dat", "sc16")
    frames, _ = demodulate_file(capture_small + ".sc16.dat", fmt="sc16")
    ours = [f.msg.hex() for f in frames]
    assert ours == ref


def test_stats_counters(capture_small, reference_binary):
    import re
    import subprocess

    out = subprocess.run(
        [reference_binary, "--device-type", "ifile", "--ifile",
         capture_small + ".uc8.dat", "--iformat", "uc8", "--quiet", "--stats"],
        capture_output=True, text=True, timeout=600,
    ).stdout
    m = re.search(r"(\d+) Mode-S message preambles", out)
    ref_preambles = int(m.group(1))
    accepted = [int(x) for x in re.findall(r"(\d+) accepted with", out)]

    frames, demod = demodulate_file(capture_small + ".uc8.dat", fmt="uc8")
    st = demod.stats
    assert st.preambles == ref_preambles
    assert st.accepted[0] == accepted[0]
    assert st.accepted[1] == accepted[1] if len(accepted) > 1 else True


def test_compaction_variants_equal():
    """Sort-based compaction == matmul/one-hot compaction, bit for bit."""
    import jax.numpy as jnp

    from readsb_tpu.ops.demod import _compact_two_level, _compact_two_level_sort

    rng = __import__("numpy").random.default_rng(3)
    for density, l in ((0.01, 16), (0.05, 64), (0.0, 16)):
        scan = 131072 + 17
        cand = jnp.asarray(rng.random(scan) < density)
        o1, m1 = _compact_two_level(cand, 4096, l, scan)
        o2, m2 = _compact_two_level_sort(cand, 4096, l, scan)
        assert (np.asarray(o1) == np.asarray(o2)).all()
        assert int(m1) == int(m2)


def test_compaction_topk_equal():
    import jax.numpy as jnp

    from readsb_tpu.ops.demod import _compact_topk, _compact_two_level

    rng = np.random.default_rng(9)
    scan = 100_000
    cand = jnp.asarray(rng.random(scan) < 0.02)
    o1, _ = _compact_two_level(cand, 4096, 64, scan)
    o2, _ = _compact_topk(cand, 4096, 64, scan)
    assert (np.asarray(o1) == np.asarray(o2)).all()
