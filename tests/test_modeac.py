"""Mode A/C: Gillham conversion, message decode, device demod kernel."""

import numpy as np
import pytest

from readsb_tpu.decode import mode_ac
from readsb_tpu.decode.fields import INVALID_ALTITUDE, MODES_NON_ICAO_ADDRESS, Source
from readsb_tpu.pipeline import Demodulator
from readsb_tpu.track.tracker import Tracker
from tools.synth import CaptureBuilder


def test_index_roundtrip():
    for i in range(4096):
        modea = mode_ac.index_to_modea(i)
        assert mode_ac.modea_to_index(modea) == i
        assert (modea & 0x8888) == 0


def test_gillham_roundtrip():
    # every valid Mode C altitude must round-trip C -> A -> C
    n_valid = 0
    for modec in range(-12, 4083):
        modea = mode_ac.modec_to_modea(modec)
        if modea == 0:
            continue
        n_valid += 1
        assert mode_ac.modea_to_modec(modea) == modec
    assert n_valid > 1000  # the Gillham code space covers -1200..+126700 ft


def test_gillham_known_values():
    # 100 ft: C1+C4 set only => onehundreds pattern; spot anchors computed
    # from the reference algorithm (mode_ac.c:101-160)
    assert mode_ac.modea_to_modec(0x0030) == -9  # C1+C2 -> onehundreds 4
    assert mode_ac.modea_to_modec(0x0010) == -8  # C1 -> onehundreds 7->5
    # codes with D1 set or C all-zero are invalid
    assert mode_ac.modea_to_modec(0x0001) == INVALID_ALTITUDE
    assert mode_ac.modea_to_modec(0x7707) == INVALID_ALTITUDE


def test_decode_modeac_message():
    mm = mode_ac.decode_modeac_message(0x1200 | 0x0080)  # squawk 1200 + ident
    assert mm.msgtype == mode_ac.DFTYPE_MODEAC
    assert mm.squawk_hex == 0x1200
    assert mm.spi is True
    assert mm.baro_alt is None  # SPI suppresses Mode C interpretation
    assert mm.addr & MODES_NON_ICAO_ADDRESS
    assert mm.source == Source.MODE_AC

    mm2 = mode_ac.decode_modeac_message(0x0030)
    assert mm2.baro_alt == -900
    assert mm2.spi is False


def test_modeac_demod_end_to_end():
    cap = CaptureBuilder(duration_s=0.35, noise_rms=0.012, seed=11)
    codes = [0x1200, 0x7700, 0x0030, 0x2644]
    times = [0.02, 0.09, 0.17, 0.25]
    for code, t in zip(codes, times):
        # near-zero sub-sample phase: the reference's quadratic clock-phase
        # heuristic (demod_2400.c:644-650) rejects unlucky phases; detection
        # is per-reply, and SSR replies repeat at interrogation rate
        cap.add_modeac(code, t, amplitude=0.5, phase=0.05)
    iq = cap.render_iq()
    i8 = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    q8 = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    raw = np.empty(len(iq) * 2, dtype=np.uint8)
    raw[0::2] = i8
    raw[1::2] = q8

    demod = Demodulator(fmt="uc8", blocks_per_batch=2, modeac=True)
    demod.feed(raw.tobytes())
    demod.flush()

    got = {mm.squawk_hex for mm in demod.modeac_msgs}
    assert got == set(codes), f"decoded {got}"
    # timestamps land at the F2 pulse ~20.3us after frame start; the scan
    # grid leads the file by TRAILING_SAMPLES (the zero-primed overlap)
    from readsb_tpu.constants import TRAILING_SAMPLES

    for mm, t in zip(sorted(demod.modeac_msgs, key=lambda m: m.timestamp), times):
        expect_ts = (t + 20.3e-6) * 12e6 + TRAILING_SAMPLES * 5
        assert abs(mm.timestamp - expect_ts) < 120  # within 10 us


def test_tracker_modeac_count_and_match():
    tr = Tracker()
    now = 100_000
    # feed 5 identical Mode A replies
    for _ in range(5):
        mm = mode_ac.decode_modeac_message(0x1200, sys_timestamp_ms=now)
        assert tr.update(mm) is None
    idx = mode_ac.modea_to_index(0x1200)
    assert tr.modeac_count[idx] == 5

    # a Mode-S aircraft squawking 1200 matches
    from readsb_tpu.decode.fields import ModesMessage

    a = None
    # squawk needs double-confirmation with the tentative held >750 ms
    # (track.c:2081-2087)
    for t in (now, now + 800):
        ms = ModesMessage(msgtype=11, addr=0xABCDEF, sys_timestamp_ms=t,
                          source=Source.MODE_S, squawk_hex=0x1200)
        a = tr.update(ms)
    now += 800
    assert a is not None and a.squawk == 0x1200
    tr.match_ac(now)
    assert a.modea_hit
    assert tr.modeac_match[idx] == 0xABCDEF
