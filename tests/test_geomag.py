"""WMM declination vs reference-implementation golden values."""

import pytest

from readsb_tpu.track.geomag import declination

# golden values computed with the reference's geomag.c (WMM2020) at 2025.5
GOLDEN = {
    (51.5, 0.0): 1.15,
    (47.6, -122.3): 15.08,
    (35.7, 139.7): -7.99,
    (-33.9, 151.2): 12.87,
    (80, 0): 1.57,
    (0, 120): -0.32,
    (-80, -120): 68.84,
}


def test_declination_golden():
    for (lat, lon), ref in GOLDEN.items():
        d = declination(lat, lon, 0, 2025.5)
        assert d == pytest.approx(ref, abs=0.5), (lat, lon)
