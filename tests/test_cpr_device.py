"""Device CPR (ops/cpr_device.py, exact-int airborne global decode) vs
the scalar host chain: cprtests golden vectors plus a broad fuzz of
random CPR pairs — decisions AND resulting f64 degrees must be
bit-identical with decode_airborne (VERDICT r5 #5 stage 2)."""

import numpy as np

from readsb_tpu.decode import cpr
from readsb_tpu.ops.cpr_device import airborne_latlon_f64, decode_airborne_device
from tests.test_cpr_golden import GLOBAL_AIRBORNE


def _run(elat, elon, olat, olon, fflag):
    dev = decode_airborne_device(
        np.asarray(elat, np.int32), np.asarray(elon, np.int32),
        np.asarray(olat, np.int32), np.asarray(olon, np.int32),
        np.asarray(fflag, np.int32),
    )
    dev = {k: np.asarray(v) for k, v in dev.items()}
    lat, lon = airborne_latlon_f64(dev, elat, elon, olat, olon, fflag)
    return dev["ok"].astype(bool), lat, lon


def test_golden_vectors():
    for elat, elon, olat, olon, er_lat, er_lon, or_lat, or_lon in GLOBAL_AIRBORNE:
        for fflag, want in ((0, (er_lat, er_lon)), (1, (or_lat, or_lon))):
            ok, lat, lon = _run([elat], [elon], [olat], [olon], [fflag])
            assert ok[0]
            assert abs(lat[0] - want[0]) < 1e-6, (fflag, lat[0], want)
            assert abs(lon[0] - want[1]) < 1e-6, (fflag, lon[0], want)


def test_fuzz_vs_scalar_chain():
    rng = np.random.default_rng(23)
    n = 20000
    elat = rng.integers(0, 1 << 17, n).astype(np.int64)
    elon = rng.integers(0, 1 << 17, n).astype(np.int64)
    # half the odd frames near the even ones (same zone, the realistic
    # case), half fully random (exercises zone-mismatch rejection)
    olat = np.where(
        rng.random(n) < 0.5,
        np.clip(elat + rng.integers(-600, 600, n), 0, (1 << 17) - 1),
        rng.integers(0, 1 << 17, n),
    )
    olon = np.clip(elon + rng.integers(-600, 600, n), 0, (1 << 17) - 1)
    fflag = rng.integers(0, 2, n)

    ok, lat, lon = _run(elat, elon, olat, olon, fflag)
    n_ok = 0
    for i in range(n):
        ref = cpr.decode_airborne(
            int(elat[i]), int(elon[i]), int(olat[i]), int(olon[i]), int(fflag[i])
        )
        if ref is None:
            assert not ok[i], i
            continue
        assert ok[i], i
        # bit-identical: the host map replays the reference f64 formulas
        assert lat[i] == ref[0], (i, lat[i], ref[0])
        assert lon[i] == ref[1], (i, lon[i], ref[1])
        n_ok += 1
    assert n_ok > 4000  # plenty of accepted decodes exercised


# --------------------------- surface decode --------------------------------

from readsb_tpu.ops.cpr_device import (  # noqa: E402
    decode_surface_device,
    surface_latlon_f64,
    surface_quadrant_consts,
)
from tests.test_cpr_golden import GLOBAL_SURFACE  # noqa: E402


def _run_surface(reflat, reflon, elat, elon, olat, olon, fflag):
    q = surface_quadrant_consts(reflat)
    dev = decode_surface_device(
        np.asarray(elat, np.int32), np.asarray(elon, np.int32),
        np.asarray(olat, np.int32), np.asarray(olon, np.int32),
        np.asarray(fflag, np.int32),
        np.int32(q["zneg"]), np.int32(q["zpos"]),
        np.int32(q["t0"]), np.int32(q["t1"]),
    )
    dev = {k: np.asarray(v) for k, v in dev.items()}
    lat, lon = surface_latlon_f64(
        dev, reflat, reflon, elat, elon, olat, olon, fflag
    )
    return dev["ok"].astype(bool), lat, lon


def test_surface_golden_vectors():
    for reflat, reflon, elat, elon, olat, olon, er_lat, er_lon, or_lat, or_lon in GLOBAL_SURFACE:
        for fflag, want in ((0, (er_lat, er_lon)), (1, (or_lat, or_lon))):
            ok, lat, lon = _run_surface(
                reflat, reflon, [elat], [elon], [olat], [olon], [fflag]
            )
            assert ok[0], (reflat, reflon, fflag)
            assert abs(lat[0] - want[0]) < 1e-5, (fflag, lat[0], want)
            assert abs(lon[0] - want[1]) < 1e-5, (fflag, lon[0], want)


def test_surface_fuzz_vs_scalar_chain():
    rng = np.random.default_rng(31)
    n = 4000
    # quadrant-stressing reference points: both zero-latitude branches,
    # both sides of the 45-deg shift threshold, and mid-latitudes
    refs = [(-60.0, 10.0), (-44.9, -170.0), (0.0, 0.0), (30.0, 100.0),
            (46.0, 5.0), (52.0, -1.0), (80.0, 179.5)]
    total_ok = 0
    for reflat, reflon in refs:
        elat = rng.integers(0, 1 << 17, n).astype(np.int64)
        elon = rng.integers(0, 1 << 17, n).astype(np.int64)
        olat = np.where(
            rng.random(n) < 0.5,
            np.clip(elat + rng.integers(-600, 600, n), 0, (1 << 17) - 1),
            rng.integers(0, 1 << 17, n),
        )
        olon = np.clip(elon + rng.integers(-600, 600, n), 0, (1 << 17) - 1)
        fflag = rng.integers(0, 2, n)

        ok, lat, lon = _run_surface(reflat, reflon, elat, elon, olat, olon, fflag)
        for i in range(n):
            ref = cpr.decode_surface(
                reflat, reflon,
                int(elat[i]), int(elon[i]), int(olat[i]), int(olon[i]),
                int(fflag[i]),
            )
            if ref is None:
                assert not ok[i], (reflat, i)
                continue
            assert ok[i], (reflat, i)
            assert lat[i] == ref[0], (reflat, i, lat[i], ref[0])
            assert lon[i] == ref[1], (reflat, i, lon[i], ref[1])
            total_ok += 1
    assert total_ok > 3000


# --------------------------- relative decode -------------------------------

from readsb_tpu.ops.cpr_device import (  # noqa: E402
    make_decode_relative_device,
    relative_latlon_f64,
)


def test_relative_fuzz_vs_scalar_chain():
    rng = np.random.default_rng(47)
    n = 4000
    refs = [(52.0, -1.0), (-33.9, 151.2), (0.0, 0.0), (61.2, -149.9),
            (-54.8, -68.3), (35.6, 139.7), (78.2, 15.6)]
    total_ok = 0
    for reflat, reflon in refs:
        run = make_decode_relative_device(reflat, reflon)
        clat = rng.integers(0, 1 << 17, n).astype(np.int64)
        clon = rng.integers(0, 1 << 17, n).astype(np.int64)
        fflag = rng.integers(0, 2, n)
        surface = rng.integers(0, 2, n)
        dev = run(
            np.asarray(clat, np.int32), np.asarray(clon, np.int32),
            np.asarray(fflag, np.int32), np.asarray(surface, np.int32),
        )
        dev = {k: np.asarray(v) for k, v in dev.items()}
        lat, lon = relative_latlon_f64(dev, clat, clon, fflag, surface)
        ok = dev["ok"].astype(bool)
        for i in range(n):
            ref = cpr.decode_relative(
                reflat, reflon, int(clat[i]), int(clon[i]),
                int(fflag[i]), bool(surface[i]),
            )
            if ref is None:
                assert not ok[i], (reflat, i)
                continue
            assert ok[i], (reflat, i)
            assert lat[i] == ref[0], (reflat, i, lat[i], ref[0])
            assert lon[i] == ref[1], (reflat, i, lon[i], ref[1])
            total_ok += 1
    # relative decodes accept anything within half a zone of the
    # reference: the bulk of random CPR values decode
    assert total_ok > 10000
