"""IQ -> magnitude conversion kernels.

TPU-first design: input formats arrive as flat byte/int16 tensors, and the
conversion is a fused elementwise pipeline (or a 64k LUT gather for UC8)
that XLA vectorizes onto the VPU.  Per-block mean level / mean power fall
out of the same pass as reductions.

Behavioral contract matches the reference (wiedehopf/readsb convert.c):
- UC8: mag = round(65535 * sqrt(min(1, ((I-127.5)/127.5)^2 + ((Q-127.5)/127.5)^2)))
  via 256x256 uint16 LUT (convert.c:35-62); mean_level = sum(mag)/65536/n,
  mean_power = sum(mag^2)/65535^2/n (convert.c:101-107)
- SC16: fI = I/32768 (convert.c:227-241); SC16Q11: fI = I/2048 clamped
- optional 1-pole DC-block IIR: z1 += (f - z1) * a with
  a = 1 - exp(-1/(rate * 4.16e-5 / log(5)))  (convert.c:443-485), carried
  across blocks as scan state
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# LUTs (built once on host, copied to device)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def uc8_lut_np() -> np.ndarray:
    """65536-entry uint16 LUT indexed by I + 256*Q (symmetric in I/Q).

    Emulates the reference's float32 evaluation order exactly
    (convert.c:45-58): fI rounded to f32 from the double quotient, f32
    products/sum, sqrtf, f32 scale + 0.5, truncating cast.
    """
    i = np.arange(256, dtype=np.float64)
    fi = ((i - 127.5) / 127.5).astype(np.float32)
    sq = fi * fi  # f32
    magsq = sq[:, None] + sq[None, :]  # f32
    magsq = np.minimum(magsq, np.float32(1.0))
    mag = np.sqrt(magsq)  # f32, correctly rounded like sqrtf
    return (mag * np.float32(65535.0) + np.float32(0.5)).astype(np.uint16).reshape(-1)


def mag_uc8(iq: jax.Array) -> jax.Array:
    """UC8 interleaved bytes (2N,) uint8 -> (N,) uint16 magnitudes."""
    lut = jnp.asarray(uc8_lut_np())
    pairs = iq.reshape(-1, 2).astype(jnp.int32)
    idx = pairs[:, 0] * 256 + pairs[:, 1]
    return lut[idx]


def _mag_from_float(fi: jax.Array, fq: jax.Array) -> jax.Array:
    magsq = jnp.minimum(fi * fi + fq * fq, 1.0)
    mag = jnp.sqrt(magsq)
    return (mag * 65535.0 + 0.5).astype(jnp.uint16)


def mag_sc16(iq: jax.Array) -> jax.Array:
    """SC16 interleaved int16 (2N,) -> (N,) uint16 magnitudes."""
    pairs = iq.reshape(-1, 2).astype(jnp.float32) * (1.0 / 32768.0)
    return _mag_from_float(pairs[:, 0], pairs[:, 1])


def mag_sc16q11(iq: jax.Array) -> jax.Array:
    """SC16Q11 interleaved int16 (2N,) -> (N,) uint16 magnitudes."""
    pairs = iq.reshape(-1, 2).astype(jnp.float32) * (1.0 / 2048.0)
    return _mag_from_float(pairs[:, 0], pairs[:, 1])


def block_stats(mag: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(mean_level, mean_power) of a magnitude block, in [0,1] units."""
    m = mag.astype(jnp.float32)
    n = mag.shape[0]
    mean_level = jnp.sum(m) / 65536.0 / n
    mean_power = jnp.sum(m * m) / (65535.0 * 65535.0) / n
    return mean_level, mean_power


# ---------------------------------------------------------------------------
# DC-block IIR as an associative scan (cross-block state carried by caller)
# ---------------------------------------------------------------------------


def dc_filter_coeff(sample_rate: float) -> float:
    """1-pole DC block @ 1 Hz: a = 1 - exp(-2*pi/fs) (convert.c:477-480)."""
    return 1.0 - math.exp(-2.0 * math.pi / sample_rate)


def dc_block(f: jax.Array, z0: jax.Array, a: float) -> tuple[jax.Array, jax.Array]:
    """y[n] = f[n] - z[n],  z[n] = (1-a) z[n-1] + a f[n].

    Implemented as an associative scan over affine maps so a multi-million
    sample block is O(log n) depth on device.  Returns (y, z_last).
    """
    b = 1.0 - a

    def combine(c1, c2):
        # each element is (mul, add): z = mul*z_prev + add
        m1, a1 = c1
        m2, a2 = c2
        return m2 * m1, m2 * a1 + a2

    muls = jnp.full(f.shape, b, dtype=jnp.float32)
    adds = a * f.astype(jnp.float32)
    m_scan, a_scan = jax.lax.associative_scan(combine, (muls, adds))
    z = m_scan * z0 + a_scan
    y = f - z
    return y, z[-1]


def mag_with_dc(iq: jax.Array, z1: jax.Array, fmt: str, sample_rate: float = 2.4e6):
    """Full conversion with DC filter; z1 is shape (2,) float32 carry state."""
    scale = {"sc16": 1.0 / 32768.0, "sc16q11": 1.0 / 2048.0, "uc8": None}[fmt]
    if fmt == "uc8":
        pairs = (iq.reshape(-1, 2).astype(jnp.float32) - 127.5) * (1.0 / 127.5)
    else:
        pairs = iq.reshape(-1, 2).astype(jnp.float32) * scale
    a = dc_filter_coeff(sample_rate)
    yi, zi = dc_block(pairs[:, 0], z1[0], a)
    yq, zq = dc_block(pairs[:, 1], z1[1], a)
    mag = _mag_from_float(yi, yq)
    return mag, jnp.stack([zi, zq])


CONVERTERS = {
    "uc8": mag_uc8,
    "sc16": mag_sc16,
    "sc16q11": mag_sc16q11,
}
