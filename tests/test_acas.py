"""ACAS RA daily log parity with the reference's formats
(json_out.c:175-630, globe_index.c:3415)."""

import json

from readsb_tpu.io import acas


# real-world RA: climb advisory, ARA set (BDS 3,0 style payload)
RA_CLIMB = bytes.fromhex("30E20000000000".replace("E2", "e2"))


def _mk(bits_on):
    b = bytearray(7)
    for n in bits_on:
        b[(n - 1) // 8] |= 1 << (7 - ((n - 1) % 8))
    return bytes(b)


def test_ra_valid_gates():
    assert not acas.ra_valid(_mk([]), 17)  # nothing set
    assert not acas.ra_valid(_mk([9, 23, 24]), 17)  # both pass-above+below
    assert acas.ra_valid(_mk([9, 10, 11]), 16)
    assert not acas.ra_valid(_mk([9, 30]), 16)  # DF16 reserved bits set


def test_advisory_texts():
    # corrective positive downward => Descend
    assert acas.advisory_text(_mk([9, 10, 11, 15])) == "Descend"
    assert acas.advisory_text(_mk([9, 10, 15])) == "Climb"
    assert acas.advisory_text(_mk([27])) == "Clear of Conflict"
    assert acas.advisory_text(_mk([9, 10])) == "Level Off"
    assert acas.advisory_text(_mk([9])) == "Monitor vertical Speed"


def test_logger_dedup_and_files(tmp_path):
    lg = acas.AcasLogger(str(tmp_path))
    ra = _mk([9, 10, 15])
    now = 1_700_000_000_000
    assert lg.log(0xABCDEF, ra, None, None, now)
    assert not lg.log(0xABCDEF, ra, None, None, now + 100)  # dedup 300ms
    assert lg.log(0xABCDEF, ra, None, None, now + 400)
    lg.close()
    day = "2023-11-14"
    csv = (tmp_path / day / "acas" / "acas.csv").read_text().strip().split("\n")
    js = (tmp_path / day / "acas" / "acas.json").read_text().strip().split("\n")
    assert len(csv) == 2 and len(js) == 2
    rec = json.loads(js[0])
    assert rec["advisory"] == "Climb"
    assert rec["ARA"] == "1100001"
    assert "abcdef" in csv[0] or "ABCDEF" in csv[0].upper()
