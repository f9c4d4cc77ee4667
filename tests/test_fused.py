"""Fused dense->compact->extract kernel == the staged path, bit for bit
(Mosaic interpreter; the candidate SET, per-candidate extract rows and
the prefix sums must all match)."""

import numpy as np
import jax.numpy as jnp
import pytest

from readsb_tpu.constants import TRAILING_SAMPLES
from readsb_tpu.ops import demod as demod_ops
from readsb_tpu.ops import fused as fused_mod
from readsb_tpu.ops.fused import TILE, fused_demod_tiles


@pytest.fixture(scope="module")
def workload():
    from readsb_tpu.ops import convert as convert_ops
    from tools.synth import build_standard_capture

    cap = build_standard_capture(duration_s=0.12, n_aircraft=4, seed=13)
    iq = cap.render_iq()
    i8 = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    q8 = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    raw = np.empty(len(iq) * 2, dtype=np.uint8)
    raw[0::2] = i8
    raw[1::2] = q8
    magj = convert_ops.mag_uc8(jnp.asarray(raw))
    n = (int(magj.shape[0]) // TILE) * TILE
    return magj[:n], n


def test_fused_matches_staged(workload):
    buf, n = workload
    ntiles = n // TILE
    cap_t = 1024
    k = ntiles * cap_t

    comb, off, live, meta, cs_hi, cs_lo = fused_demod_tiles(
        buf, 58, cap=cap_t, interpret=True
    )
    # staged oracle
    bc, cs_hi_s, cs_lo_s = demod_ops._demod_core(
        jnp.concatenate([buf, jnp.zeros(TRAILING_SAMPLES + 512, jnp.uint16)]),
        58, k=k, scan_len=n, l=64,
    )
    n_cand = int(bc.n_cand)
    assert n_cand > 50
    assert int(np.asarray(meta)[:, 0].sum()) == n_cand
    assert int(np.asarray(meta)[:, 2].max()) <= fused_mod.L_ROW

    off = np.asarray(off)
    live = np.asarray(live)
    fused_offs = off[live]
    staged_offs = np.asarray(bc.offsets)[:n_cand]
    np.testing.assert_array_equal(np.sort(fused_offs), staged_offs)
    # fused offsets are already nondecreasing incl. sentinels
    assert (np.diff(off) >= 0).all()

    # per-candidate extract rows
    comb = np.asarray(comb)
    syn112 = np.asarray(bc.syn112)
    syn56 = np.asarray(bc.syn56)
    msg = np.asarray(bc.msg)
    cfired = np.asarray(bc.corr_fired)
    staged_by_off = {int(o): i for i, o in enumerate(staged_offs)}
    nchecked = 0
    for row in np.nonzero(live)[0]:
        i = staged_by_off[int(off[row])]
        np.testing.assert_array_equal(comb[row, 0:5], syn112[i])
        np.testing.assert_array_equal(comb[row, 5:10], syn56[i])
        np.testing.assert_array_equal(
            comb[row, 10:80].reshape(5, 14).astype(np.uint8), msg[i]
        )
        np.testing.assert_array_equal(comb[row, 80:83] != 0, cfired[i])
        nchecked += 1
    assert nchecked == n_cand

    # prefix sums identical
    np.testing.assert_array_equal(np.asarray(cs_hi), np.asarray(cs_hi_s)[:n])
    np.testing.assert_array_equal(np.asarray(cs_lo), np.asarray(cs_lo_s)[:n])


def test_fused_pipeline_frames_match(workload, monkeypatch):
    """USE_FUSED end to end through the gated pipeline (interpret mode):
    identical frames and gate stats to the staged path."""
    import readsb_tpu.ops.demod as demod_ops2
    import readsb_tpu.ops.pallas_kernels as pk2
    from readsb_tpu.pipeline import Demodulator

    buf, n = workload
    mag = np.asarray(buf, np.uint16)
    blocks = n // 131072
    if blocks == 0:
        pytest.skip("workload shorter than a block")
    mag = mag[: blocks * 131072]

    def run():
        d = Demodulator(blocks_per_batch=blocks, use_gate=True)
        frames = d.process_mag(mag) + d.flush()
        return [f.msg.hex() for f in frames], d.stats

    monkeypatch.setattr(pk2, "INTERPRET", True)
    base, st_base = run()
    monkeypatch.setattr(demod_ops2, "USE_FUSED", True)
    fused, st_fused = run()
    assert fused == base and len(base) > 0
    assert st_fused.preambles == st_base.preambles
    assert st_fused.rejected_bad == st_base.rejected_bad
    assert st_fused.rejected_unknown_icao == st_base.rejected_unknown_icao


def test_fused_overflow_falls_back_to_staged(workload, monkeypatch):
    """When a tile exceeds the fused kernel's per-row capacity, the
    pipeline must detect fused_overflow and redo the block via the staged
    path (sticky), producing identical frames."""
    import readsb_tpu.ops.demod as demod_ops2
    import readsb_tpu.ops.fused as fused2
    import readsb_tpu.ops.pallas_kernels as pk2
    from readsb_tpu.pipeline import Demodulator

    buf, n = workload
    mag = np.asarray(buf, np.uint16)
    blocks = n // 131072
    if blocks == 0:
        pytest.skip("workload shorter than a block")
    mag = mag[: blocks * 131072]

    monkeypatch.setattr(pk2, "INTERPRET", True)
    d0 = Demodulator(blocks_per_batch=blocks, use_gate=True)
    base = [f.msg.hex() for f in d0.process_mag(mag) + d0.flush()]

    # L_ROW=1 guarantees per-row overflow on this capture.  The jitted
    # wrappers cache traces keyed on static args, so clear them around
    # the patched constant (and again after, so later tests retrace
    # with the real L_ROW).
    import readsb_tpu.pipeline as pl_mod2

    def _clear():
        fused2.fused_demod_tiles.clear_cache()
        pl_mod2._demod_and_gate.clear_cache()

    monkeypatch.setattr(fused2, "L_ROW", 1)
    monkeypatch.setattr(demod_ops2, "USE_FUSED", True)
    _clear()
    try:
        d1 = Demodulator(blocks_per_batch=blocks, use_gate=True)
        got = [f.msg.hex() for f in d1.process_mag(mag) + d1.flush()]
    finally:
        monkeypatch.undo()
        _clear()
    assert got == base and len(base) > 0
    assert getattr(d1, "_force_staged", False), "fallback should be sticky"
