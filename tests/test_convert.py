"""IQ->magnitude conversion parity with the reference formulas."""

import numpy as np

from readsb_tpu.ops import convert


def _uc8_expected(i, q):
    """The reference's f32 evaluation sequence (convert.c:45-58)."""
    fi = ((i - 127.5) / 127.5).astype(np.float32)
    fq = ((q - 127.5) / 127.5).astype(np.float32)
    magsq = np.minimum(fi * fi + fq * fq, np.float32(1.0))
    return (np.sqrt(magsq) * np.float32(65535.0) + np.float32(0.5)).astype(np.uint16)


def test_uc8_lut_matches_formula():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=2048, dtype=np.uint8)
    out = np.asarray(convert.mag_uc8(raw))
    i = raw[0::2].astype(np.float64)
    q = raw[1::2].astype(np.float64)
    np.testing.assert_array_equal(out, _uc8_expected(i, q))


def test_sc16_path():
    rng = np.random.default_rng(1)
    raw = rng.integers(-32768, 32768, size=1024, dtype=np.int16)
    out = np.asarray(convert.mag_sc16(raw))
    fi = raw[0::2].astype(np.float32) / 32768.0
    fq = raw[1::2].astype(np.float32) / 32768.0
    magsq = np.minimum(fi * fi + fq * fq, np.float32(1.0))
    exp = (np.sqrt(magsq) * np.float32(65535.0) + np.float32(0.5)).astype(np.uint16)
    # float32 rounding may differ by 1 LSB at fused-multiply boundaries
    diff = np.abs(out.astype(np.int32) - exp.astype(np.int32))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_block_stats():
    mag = np.full(1000, 32768, dtype=np.uint16)
    level, power = convert.block_stats(np.asarray(mag))
    assert abs(float(level) - 0.5) < 1e-3
    assert abs(float(power) - 0.25) < 1e-3


def test_dc_block_matches_serial():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    x = rng.normal(0.1, 0.05, size=4096).astype(np.float32)
    a = convert.dc_filter_coeff(2.4e6)
    y, z_last = convert.dc_block(jnp.asarray(x), jnp.float32(0.0), a)
    # serial reference
    z = 0.0
    ys = np.empty_like(x)
    for n in range(len(x)):
        z = x[n] * a + z * (1 - a)
        ys[n] = x[n] - z
    np.testing.assert_allclose(np.asarray(y), ys, atol=1e-5)
    assert abs(float(z_last) - z) < 1e-5
