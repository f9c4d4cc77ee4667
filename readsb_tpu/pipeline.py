"""Streaming demodulation pipeline: IQ bytes in -> accepted Mode-S frames out.

Host side owns only block bookkeeping (the 326-sample carried overlap, the
scan-global index, EOF padding); all per-sample compute runs on device via
ops.convert + ops.demod.  The device processes *superblocks* of
`blocks_per_batch` x 131072 samples in one flat call (no per-block device
structure — the reference's per-SDR-buffer scan restart is reproduced by
the host finalizer's `reset_every`), which keeps XLA compile time constant
and the chip busy.

Frame-level parity with the reference (sdr_ifile.c:169-260 block cadence):

  stream  = [326 zeros][samples...]
  scan    = offsets 0..valid_len-1 within each superblock
  ts      = scan_global_index * 5 + 768 + try_phase   (12 MHz clock)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .constants import (
    BLOCK_SAMPLES,
    PREAMBLE_THRESHOLD_DEFAULT,
    TRAILING_SAMPLES,
)
from .decode.score import RawFrame, Scorer, finalize_block
from .ops import convert as convert_ops
from .ops import demod as demod_ops
from .ops import pallas_kernels

_BYTES_PER_SAMPLE = {"uc8": 2, "sc16": 4, "sc16q11": 4}

# In-kernel gate classification (extract_classify_v3_pallas): measured
# SLOWER than the jnp score_gate with a compact known table on v5e
# (r4 sessions: 20.1 ms vs 18.4 ms per 64-channel superblock — the
# classifier's per-phase column ops are lane-starved in Mosaic), so the
# production path keeps classification in XLA.  The fused kernel stays
# validated (interpret-mode bit-equality + the multichip dryrun) for
# future re-evaluation.
FUSE_CLASSIFY = False


def _to_mag(raw: np.ndarray, fmt: str) -> jax.Array:
    if fmt == "uc8":
        n = len(raw) // 2
        if pallas_kernels.supported() and n % (pallas_kernels.ROWS_PER_STEP * 128) == 0:
            # bit-exact with the LUT (tests/test_pallas.py), ~6x faster on TPU
            return pallas_kernels.mag_uc8_pallas(
                jnp.asarray(raw), interpret=pallas_kernels.INTERPRET
            )
        return convert_ops.mag_uc8(jnp.asarray(raw))
    iq16 = raw.view("<i2")
    if fmt == "sc16":
        return convert_ops.mag_sc16(jnp.asarray(iq16))
    return convert_ops.mag_sc16q11(jnp.asarray(iq16))


class Demodulator:
    """Stateful streaming demodulator for one receiver channel."""

    def __init__(
        self,
        fmt: str = "uc8",
        block_samples: int = BLOCK_SAMPLES,
        blocks_per_batch: int = 4,
        k_per_block: int = 2048,
        threshold: int = PREAMBLE_THRESHOLD_DEFAULT,
        nfix: int = 1,
        fix_df: bool = True,
        carry_skip: bool = False,
        use_native: bool | None = None,
        modeac: bool = False,
        use_gate: bool | None = None,
    ):
        self.fmt = fmt
        self.block_samples = block_samples
        self.blocks_per_batch = blocks_per_batch
        self.super_samples = block_samples * blocks_per_batch
        self.k = k_per_block * blocks_per_batch
        self.compact_l = 64  # per-256-sample-block compaction capacity
        self.threshold = threshold
        self.carry_skip = carry_skip
        self.scorer = Scorer(nfix=nfix, fix_df=fix_df)
        self.native = None
        if use_native is not False:
            try:
                from . import native as native_mod

                if native_mod.load() is not None:
                    self.native = native_mod.NativeFinalizer(nfix=nfix, fix_df=fix_df)
            except Exception:
                if use_native:
                    raise
        self.overlap = np.zeros(TRAILING_SAMPLES, dtype=np.uint16)
        self.scan_global = 0
        self._skip = 0
        self._pending = b""
        self.mean_level = 0.0
        self.mean_power = 0.0
        self.modeac = modeac
        self.modeac_k = 512 * blocks_per_batch
        self.modeac_msgs: list = []  # decoded ModesMessage, drained by caller
        self.stats_modeac = 0

        # device-side score gate: only plausibly-acceptable candidates are
        # transferred (ops/gate.py); frame output and stats are unchanged.
        # Default on for TPU backends (where the device->host link is the
        # bottleneck); forceable on CPU for the equivalence tests.
        self.use_gate = (
            pallas_kernels.supported() if use_gate is None else use_gate
        )
        self.nfix = nfix
        self.fix_df = fix_df
        self.gate_k2 = 1024
        self.gate_keep_l = 64
        self._gate_drops = [0, 0, 0]  # preambles, rejected_unknown, rejected_bad
        if self.use_gate:
            from .ops.gate import DeviceIcaoMirror

            self.icao_mirror = DeviceIcaoMirror()

    @property
    def stats(self):
        from .decode.score import DemodStats

        if self.native is not None:
            st = self.native.stats()
            d = DemodStats()
            d.preambles = st["preambles"]
            d.rejected_bad = st["rejected_bad"]
            d.rejected_unknown_icao = st["rejected_unknown_icao"]
            d.accepted = st["accepted"]
        else:
            s = self.scorer.stats
            d = DemodStats()
            d.preambles = s.preambles
            d.rejected_bad = s.rejected_bad
            d.rejected_unknown_icao = s.rejected_unknown_icao
            d.accepted = list(s.accepted)
            d.overflow_blocks = s.overflow_blocks
        # candidates classified+dropped on device (ops/gate.py) — the drop
        # counters are exactly what the host would have counted for them
        d.preambles += self._gate_drops[0]
        d.rejected_unknown_icao += self._gate_drops[1]
        d.rejected_bad += self._gate_drops[2]
        return d

    # ------------------------------------------------------------------

    def feed(self, raw: bytes) -> list[RawFrame]:
        """Feed raw IQ bytes; returns frames completed by full superblocks.

        When several superblocks are available, the next chunk's upload +
        magnitude conversion is dispatched before the current chunk's
        host-side finalize — the async analog of the reference's
        12-buffer reader->decode ring (readsb.h:855): device transfer
        overlaps host scoring without changing any per-superblock
        semantics (the demod dispatch itself still happens after the
        previous finalize so the ICAO gate table is exact).
        """
        bps = _BYTES_PER_SAMPLE[self.fmt]
        data = self._pending + raw
        super_bytes = self.super_samples * bps
        frames: list[RawFrame] = []
        chunks = []
        off = 0
        while len(data) - off >= super_bytes:
            chunks.append(
                np.frombuffer(data, dtype=np.uint8, count=super_bytes, offset=off)
            )
            off += super_bytes
        self._pending = data[off:]
        if (
            len(chunks) > 1 and self.use_gate and not self.modeac
            and not (self.fmt == "uc8" and pallas_kernels.supported())
        ):
            next_mag = _to_mag(chunks[0], self.fmt)
            for i in range(len(chunks)):
                mag = next_mag
                if i + 1 < len(chunks):
                    next_mag = _to_mag(chunks[i + 1], self.fmt)  # prefetch
                frames.extend(self._demod_mag_gated(mag, self.super_samples))
            return frames
        for chunk in chunks:
            frames.extend(self._process(chunk, self.super_samples))
        return frames

    def flush(self) -> list[RawFrame]:
        """Process the final partial superblock (EOF)."""
        bps = _BYTES_PER_SAMPLE[self.fmt]
        n = len(self._pending) // bps
        if n == 0:
            self._pending = b""
            return []
        chunk = np.zeros(self.super_samples * bps, dtype=np.uint8)
        chunk[: n * bps] = np.frombuffer(self._pending, dtype=np.uint8, count=n * bps)
        self._pending = b""
        return self._process(chunk, n)

    # ------------------------------------------------------------------

    def _process(self, raw_bytes: np.ndarray, valid_len: int) -> list[RawFrame]:
        if (
            self.use_gate and not self.modeac and self.fmt == "uc8"
            and pallas_kernels.supported()
        ):
            # fused convert+dense path: raw words in, no magnitude array
            return self._demod_raw_gated(raw_bytes, valid_len)
        mag = _to_mag(raw_bytes, self.fmt)
        if self.use_gate and not self.modeac:
            return self._demod_mag_gated(mag, valid_len)
        level, power = convert_ops.block_stats(
            mag[:valid_len] if valid_len < self.super_samples else mag
        )
        self.mean_level = float(level)
        self.mean_power = float(power)
        buf = jnp.concatenate([jnp.asarray(self.overlap), mag])
        return self._demod_buf(buf, valid_len)

    def process_mag(self, mag: np.ndarray) -> list[RawFrame]:
        """Feed a pre-converted magnitude superblock (super_samples long)."""
        assert len(mag) == self.super_samples
        mag_j = jnp.asarray(mag, dtype=jnp.uint16)
        if self.use_gate and not self.modeac:
            return self._demod_mag_gated(mag_j, self.super_samples)
        if self.modeac:
            level, power = convert_ops.block_stats(mag_j)
            self.mean_level = float(level)
            self.mean_power = float(power)
        buf = jnp.concatenate([jnp.asarray(self.overlap), mag_j])
        return self._demod_buf(buf, self.super_samples)

    def _demod_modeac(self, buf: jax.Array, valid_len: int) -> None:
        """Mode A/C pass over the same magnitude buffer (--modeac)."""
        from .decode import mode_ac as mode_ac_dec
        from .ops import modeac as modeac_ops

        stddev = np.sqrt(max(0.0, self.mean_power - self.mean_level**2))
        noise_level = jnp.int32(int((self.mean_power + stddev) * 65535 + 0.5))
        k = self.modeac_k
        while True:
            cand = modeac_ops.modeac_block(
                buf, noise_level, k=k, scan_len=self.super_samples
            )
            n = int(cand.n_cand)
            if n <= k:
                break
            while k < n:
                k *= 2
            self.modeac_k = k
        offsets = np.asarray(cand.offsets)
        offsets = np.where(offsets < valid_len, offsets, self.super_samples)
        hits = mode_ac_dec.finalize_modeac(
            offsets, np.asarray(cand.ok), np.asarray(cand.modeac),
            np.asarray(cand.f2_clock), n,
            scan_len=self.super_samples, block_scan_start=self.scan_global,
        )
        for code, ts, _off in hits:
            mm = mode_ac_dec.decode_modeac_message(
                code, timestamp=ts, sys_timestamp_ms=ts // 12000
            )
            self.modeac_msgs.append(mm)
        self.stats_modeac += len(hits)

    def _demod_buf(self, buf: jax.Array, valid_len: int) -> list[RawFrame]:
        if self.modeac:
            self._demod_modeac(buf, valid_len)
        k = self.k
        while True:
            cand = demod_ops.demod_block(
                buf, jnp.int32(self.threshold), k=k, scan_len=self.super_samples,
                l=self.compact_l,
            )
            n = int(cand.n_cand)
            max_local = int(cand.max_local)
            if n <= k and max_local <= self.compact_l:
                break
            # capacity overflow: escalate (recompile is cached per (k, l))
            while k < n:
                k *= 2
            self.k = k
            while self.compact_l < max_local:
                self.compact_l *= 2

        offsets = np.asarray(cand.offsets)
        offsets = np.where(offsets < valid_len, offsets, self.super_samples)

        if self.native is not None:
            frames, leftover = self.native.finalize_block(
                offsets,
                n,
                np.asarray(cand.corr_fired),
                np.asarray(cand.msg),
                np.asarray(cand.syn112),
                np.asarray(cand.syn56),
                np.asarray(cand.sigsum_long),
                np.asarray(cand.sigsum_short),
                scan_len=self.super_samples,
                block_scan_start=self.scan_global,
                carry_skip=self._skip,
                reset_every=self.block_samples,
            )
        else:
            frames, leftover = finalize_block(
                self.scorer,
                offsets,
                n,
                np.asarray(cand.corr_fired),
                np.asarray(cand.msg),
                np.asarray(cand.syn112),
                np.asarray(cand.syn56),
                np.asarray(cand.sigsum_long),
                np.asarray(cand.sigsum_short),
                scan_len=self.super_samples,
                block_scan_start=self.scan_global,
                carry_skip=self._skip,
                reset_every=self.block_samples,
            )
        self._skip = leftover if self.carry_skip else 0

        # advance stream state
        self.overlap = np.asarray(buf[-TRAILING_SAMPLES:])
        self.scan_global += valid_len

        # ICAO filter generation aging on the synthetic clock
        now_ms = self.scan_global * 5 // 12000
        if self.native is not None:
            self.native.icao_expire(now_ms)
        else:
            self.scorer.icao.expire(now_ms)
        return frames


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "scan_len", "l", "k2", "nfix", "fix_df", "reset_every", "keep_l",
        "force_staged",
    ),
)
def _demod_and_gate(
    mag, overlap, valid_len, threshold, known_tbl,
    *, k, scan_len, l, k2, nfix, fix_df, reset_every, keep_l=64,
    force_staged=False,
):
    """One dispatch: concat overlap, demod, score-gate, block stats.

    Returns (GatedCandidates, new_overlap, mean_level, mean_power) — the
    only host transfers the gated pipeline needs per superblock.
    """
    from .ops.gate import score_gate

    buf = jnp.concatenate([overlap, mag])
    bc, cs_hi, cs_lo = demod_ops._demod_core(
        buf, threshold, k=k, scan_len=scan_len, l=l,
        known_tbl=known_tbl if FUSE_CLASSIFY else None,
        nfix=nfix, fix_df=fix_df, force_staged=force_staged,
    )
    gc = score_gate(
        bc, known_tbl, cs_hi, cs_lo, valid_len,
        scan_len=scan_len, k2=k2, nfix=nfix, fix_df=fix_df,
        reset_every=reset_every, keep_l=keep_l,
    )
    i = jnp.arange(mag.shape[0], dtype=jnp.int32)
    mv = jnp.where(i < valid_len, mag.astype(jnp.float32), 0.0)
    nv = jnp.maximum(valid_len, 1).astype(jnp.float32)
    level = jnp.sum(mv) / 65536.0 / nv
    power = jnp.sum(mv * mv) / (65535.0 * 65535.0) / nv
    return gc, buf[-TRAILING_SAMPLES:], level, power


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "scan_len", "l", "k2", "nfix", "fix_df", "reset_every", "keep_l",
        "force_staged",
    ),
)
def _demod_and_gate_raw(
    words, overlap_words, valid_len, threshold, known_tbl,
    *, k, scan_len, l, k2, nfix, fix_df, reset_every, keep_l=64,
    force_staged=False,
):
    """Fused-path variant of _demod_and_gate: raw UC8 words in, the
    magnitude array never materializes (dense_scan_uc8_pallas).  Block
    level/power stats are not produced on this path (only the Mode A/C
    noise floor consumed them, and Mode A/C runs on the mag path)."""
    from .ops.gate import score_gate

    buf = jnp.concatenate([overlap_words, words])
    bc, cs_hi, cs_lo = demod_ops._demod_core(
        buf, threshold, k=k, scan_len=scan_len, l=l, raw_uc8=True,
        known_tbl=known_tbl if FUSE_CLASSIFY else None,
        nfix=nfix, fix_df=fix_df, force_staged=force_staged,
    )
    gc = score_gate(
        bc, known_tbl, cs_hi, cs_lo, valid_len,
        scan_len=scan_len, k2=k2, nfix=nfix, fix_df=fix_df,
        reset_every=reset_every, keep_l=keep_l,
    )
    return gc


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "scan_len", "l", "k2", "nfix", "fix_df", "reset_every",
        "seg_stride", "seg_valid", "keep_l", "force_staged",
    ),
)
def _demod_and_gate_multi_raw(
    words, overlap_words, valid_len, threshold, known_tbl,
    *, k, scan_len, l, k2, nfix, fix_df, reset_every, seg_stride, seg_valid,
    keep_l=64, force_staged=False,
):
    """Fused-path variant of _demod_and_gate_multi (raw UC8 words)."""
    from .ops.gate import score_gate

    c = words.shape[0]
    gap = seg_stride - seg_valid - TRAILING_SAMPLES
    seg = jnp.concatenate(
        [overlap_words, words, jnp.zeros((c, gap), words.dtype)], axis=1
    )
    buf = jnp.pad(seg.reshape(-1), (0, 512))
    bc, cs_hi, cs_lo = demod_ops._demod_core(
        buf, threshold, k=k, scan_len=scan_len, l=l,
        seg_stride=seg_stride, seg_valid=seg_valid, raw_uc8=True,
        known_tbl=known_tbl if FUSE_CLASSIFY else None,
        nfix=nfix, fix_df=fix_df, force_staged=force_staged,
    )
    gc = score_gate(
        bc, known_tbl, cs_hi, cs_lo, valid_len,
        scan_len=scan_len, k2=k2, nfix=nfix, fix_df=fix_df,
        reset_every=reset_every, seg_stride=seg_stride, keep_l=keep_l,
    )
    return gc


def _sigsum(a: np.ndarray) -> np.ndarray:
    s = np.asarray(a, dtype=np.int64)
    return ((s[:, 0] << 16) + s[:, 1]).astype(np.float64)


def _demod_mag_gated(self: Demodulator, mag: jax.Array, valid_len: int) -> list[RawFrame]:
    """TPU path: demod + device score gate in one dispatch; tiny transfer."""
    mirror = self.icao_mirror
    if getattr(self, "_overlap_dev", None) is None:
        self._overlap_dev = jnp.asarray(self.overlap)
    while True:
        gc, new_overlap, level, power = _demod_and_gate(
            mag,
            self._overlap_dev,
            jnp.int32(valid_len),
            jnp.int32(self.threshold),
            mirror.tbl,
            k=self.k,
            scan_len=self.super_samples,
            l=self.compact_l,
            k2=self.gate_k2,
            nfix=self.nfix,
            fix_df=self.fix_df,
            reset_every=self.block_samples,
            keep_l=self.gate_keep_l,
            force_staged=getattr(self, "_force_staged", False),
        )
        n, max_local, n_keep, kw = jax.device_get(
            [gc.n_cand, gc.max_local, gc.n_keep, gc.keep_watermark]
        )
        n, max_local, n_keep, kw = int(n), int(max_local), int(n_keep), int(kw)
        if gc.fused_overflow is not None and int(gc.fused_overflow) > 0:
            # fused per-tile/per-row capacity exceeded: redo via the
            # staged path (sticky — the fused capacities are static)
            self._force_staged = True
            continue
        if (
            n <= self.k and max_local <= self.compact_l
            and n_keep <= self.gate_k2 and kw <= self.gate_keep_l
        ):
            break
        while self.k < n:
            self.k *= 2
        while self.compact_l < max_local:
            self.compact_l *= 2
        while self.gate_k2 < n_keep:
            self.gate_k2 *= 2
        while self.gate_keep_l < kw:
            self.gate_keep_l *= 2

    # one batched fetch of everything the host needs this superblock
    (lv, pw) = jax.device_get([level, power])
    self._overlap_dev = new_overlap
    self.mean_level = float(lv)
    self.mean_power = float(pw)
    return _finalize_gated(self, gc, n_keep, valid_len)


def _finalize_gated(self: Demodulator, gc, n_keep: int, valid_len: int) -> list[RawFrame]:
    """Post-dispatch host half shared by the mag and raw gated paths."""
    mirror = self.icao_mirror
    (offs, cf, msg, s112, s56, sl, ss, pre_d, unk_d, bad_d, dcq, dcb) = (
        jax.device_get(
            [
                gc.offsets, gc.corr_fired, gc.msg, gc.syn112, gc.syn56,
                gc.sig_long, gc.sig_short,
                gc.pre_drop, gc.unknown_drop, gc.bad_drop,
                gc.drop_cum_q, gc.drop_cum_bnd,
            ]
        )
    )
    args = (offs, n_keep, cf, msg, s112, s56, _sigsum(sl), _sigsum(ss))
    kw = dict(
        scan_len=self.super_samples,
        block_scan_start=self.scan_global,
        carry_skip=self._skip,
        reset_every=self.block_samples,
    )
    if self.native is not None:
        frames, leftover = self.native.finalize_block(*args, **kw)
    else:
        frames, leftover = finalize_block(self.scorer, *args, **kw)
    self._skip = leftover if self.carry_skip else 0

    # drops inside NMS skip windows are never counted by the serial
    # finalizer; subtract them from the device totals (exact stats parity)
    from .ops.gate import skipped_drops

    sk_u, sk_b = skipped_drops(
        frames, offs, dcq, dcb,
        block_scan_start=self.scan_global, reset_every=self.block_samples,
    )
    self._gate_drops[0] += int(pre_d) - sk_u - sk_b
    self._gate_drops[1] += int(unk_d) - sk_u
    self._gate_drops[2] += int(bad_d) - sk_b

    self.scan_global += valid_len

    now_ms = self.scan_global * 5 // 12000
    if self.native is not None:
        self.native.icao_expire(now_ms)
    else:
        self.scorer.icao.expire(now_ms)
    # keep the device table == host filter state for the NEXT superblock
    mirror.add_from_frames(frames)
    mirror.expire(now_ms)
    return frames


def _demod_raw_gated(self: Demodulator, raw_bytes: np.ndarray, valid_len: int) -> list[RawFrame]:
    """TPU fused path: raw UC8 words straight into the convert+dense
    kernel; the magnitude array never exists in HBM.  Overlap is carried
    as the last 326 raw words host-side (no device readback needed)."""
    words = jnp.asarray(np.frombuffer(raw_bytes.tobytes(), dtype="<u2"))
    if getattr(self, "_overlap_words", None) is None:
        # 0x8080 = I=Q=128 ≈ zero magnitude: matches the mag path's silent
        # initial overlap (0x0000 words would convert to near-full-scale
        # |I-127.4| and could fire spurious preambles in the first block)
        self._overlap_words = np.full(TRAILING_SAMPLES, 0x8080, dtype="<u2")
    ow = jnp.asarray(self._overlap_words)
    mirror = self.icao_mirror
    while True:
        gc = _demod_and_gate_raw(
            words, ow, jnp.int32(valid_len), jnp.int32(self.threshold),
            mirror.tbl,
            k=self.k, scan_len=self.super_samples, l=self.compact_l,
            k2=self.gate_k2, nfix=self.nfix, fix_df=self.fix_df,
            reset_every=self.block_samples, keep_l=self.gate_keep_l,
            force_staged=getattr(self, "_force_staged", False),
        )
        n, max_local, n_keep, kw2 = map(
            int,
            jax.device_get([gc.n_cand, gc.max_local, gc.n_keep, gc.keep_watermark]),
        )
        if gc.fused_overflow is not None and int(gc.fused_overflow) > 0:
            self._force_staged = True
            continue
        if (
            n <= self.k and max_local <= self.compact_l
            and n_keep <= self.gate_k2 and kw2 <= self.gate_keep_l
        ):
            break
        while self.k < n:
            self.k *= 2
        while self.compact_l < max_local:
            self.compact_l *= 2
        while self.gate_k2 < n_keep:
            self.gate_k2 *= 2
        while self.gate_keep_l < kw2:
            self.gate_keep_l *= 2

    self._overlap_words = np.frombuffer(
        raw_bytes.tobytes(), dtype="<u2"
    )[-TRAILING_SAMPLES:]
    return _finalize_gated(self, gc, n_keep, valid_len)


Demodulator._demod_mag_gated = _demod_mag_gated
Demodulator._demod_raw_gated = _demod_raw_gated


# ---------------------------------------------------------------------------
# Channel-batched pipeline: C virtual receiver channels per dispatch
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "scan_len", "l", "k2", "nfix", "fix_df", "reset_every",
        "seg_stride", "seg_valid", "keep_l", "force_staged",
    ),
)
def _demod_and_gate_multi(
    mags, overlaps, valid_len, threshold, known_tbl,
    *, k, scan_len, l, k2, nfix, fix_df, reset_every, seg_stride, seg_valid,
    keep_l=64, force_staged=False,
):
    """One dispatch demodulating C channels (SURVEY 2.5 batch axis).

    mags: uint16[C, seg_valid], overlaps: uint16[C, 326].  Channels are
    laid out as concatenated segments [overlap | samples | zero gap] so
    the dense scan runs once over one flat buffer; the per-channel scan
    ranges are masked inside _demod_core and candidate offsets stay
    global (channel = offset // seg_stride).
    """
    from .ops.gate import score_gate

    c = mags.shape[0]
    gap = seg_stride - seg_valid - TRAILING_SAMPLES
    seg = jnp.concatenate(
        [overlaps, mags, jnp.zeros((c, gap), mags.dtype)], axis=1
    )
    buf = jnp.pad(seg.reshape(-1), (0, 512))
    bc, cs_hi, cs_lo = demod_ops._demod_core(
        buf, threshold, k=k, scan_len=scan_len, l=l,
        seg_stride=seg_stride, seg_valid=seg_valid,
        known_tbl=known_tbl if FUSE_CLASSIFY else None,
        nfix=nfix, fix_df=fix_df, force_staged=force_staged,
    )
    gc = score_gate(
        bc, known_tbl, cs_hi, cs_lo, valid_len,
        scan_len=scan_len, k2=k2, nfix=nfix, fix_df=fix_df,
        reset_every=reset_every, seg_stride=seg_stride, keep_l=keep_l,
    )
    i = jnp.arange(seg_valid, dtype=jnp.int32)[None, :]
    mv = jnp.where(i < valid_len, mags.astype(jnp.float32), 0.0)
    nv = jnp.maximum(valid_len, 1).astype(jnp.float32)
    level = jnp.sum(mv, axis=1) / 65536.0 / nv
    power = jnp.sum(mv * mv, axis=1) / (65535.0 * 65535.0) / nv
    return gc, mags[:, -TRAILING_SAMPLES:], level, power


class MultiDemodulator:
    """Channel-batched streaming demodulator.

    C independent receiver channels move through ONE compiled device
    program per superblock — the designed route to the >=1000x/chip
    target (batch x phase x channel parallelism, SURVEY 2.5, BASELINE
    64-channel host config).  Per-channel frames, timestamps, and stats
    are bit-identical with C independent (gated) Demodulators
    (tests/test_multichan.py); the device-side ICAO table is the union
    of all channels' filters, which is a provably safe over-approximation
    for the score gate (ops/gate.py docstring) and keeps drop counters
    exact per channel via drop_cum_chan differencing.

    feed() takes one bytes chunk per channel (lockstep streams — the
    virtual-channel model is C SDRs sharing one sample clock, the
    reference's per-SDR mag_buf cadence, readsb.h:450-464).
    """

    SEG_PAD = 512  # >= 326-sample halo + margin; keeps 256-alignment

    def __init__(
        self,
        n_chan: int,
        fmt: str = "uc8",
        block_samples: int = BLOCK_SAMPLES,
        blocks_per_batch: int = 1,
        k_per_block: int = 2048,
        threshold: int = PREAMBLE_THRESHOLD_DEFAULT,
        nfix: int = 1,
        fix_df: bool = True,
        use_native: bool | None = None,
    ):
        from .ops.gate import DeviceIcaoMirror

        self.n_chan = n_chan
        self.fmt = fmt
        self.block_samples = block_samples
        self.seg_valid = block_samples * blocks_per_batch  # S per channel
        self.seg_stride = self.seg_valid + self.SEG_PAD
        self.scan_len = n_chan * self.seg_stride
        self.threshold = threshold
        self.nfix = nfix
        self.fix_df = fix_df
        self.k = k_per_block * blocks_per_batch * n_chan
        self.compact_l = 64
        self.gate_k2 = max(1024, 64 * n_chan)
        self.gate_keep_l = 64
        self.mirror = DeviceIcaoMirror()
        self.fins = []
        native_cls = None
        if use_native is not False:
            try:
                from . import native as native_mod

                if native_mod.load() is not None:
                    native_cls = native_mod.NativeFinalizer
            except Exception:
                if use_native:
                    raise
        from .decode.score import Scorer

        self.native = native_cls is not None
        for _ in range(n_chan):
            if native_cls is not None:
                self.fins.append(native_cls(nfix=nfix, fix_df=fix_df))
            else:
                self.fins.append(Scorer(nfix=nfix, fix_df=fix_df))
        self._overlap_dev = jnp.zeros((n_chan, TRAILING_SAMPLES), jnp.uint16)
        self.scan_global = 0  # per-channel sample clock (lockstep)
        self._skips = [0] * n_chan
        self._pending = [b""] * n_chan
        self._gate_drops = [[0, 0, 0] for _ in range(n_chan)]
        self.mean_level = np.zeros(n_chan)
        self.mean_power = np.zeros(n_chan)

    # ------------------------------------------------------------------

    def feed(self, raws: list[bytes]) -> list[list[RawFrame]]:
        """Feed one bytes chunk per channel; returns per-channel frames."""
        assert len(raws) == self.n_chan
        bps = _BYTES_PER_SAMPLE[self.fmt]
        super_bytes = self.seg_valid * bps
        for c, r in enumerate(raws):
            self._pending[c] = self._pending[c] + r if self._pending[c] else r
        out: list[list[RawFrame]] = [[] for _ in range(self.n_chan)]
        while min(len(p) for p in self._pending) >= super_bytes:
            chunk = np.stack(
                [
                    np.frombuffer(p, dtype=np.uint8, count=super_bytes)
                    for p in self._pending
                ]
            )
            self._pending = [p[super_bytes:] for p in self._pending]
            got = self._process(chunk, self.seg_valid)
            for c in range(self.n_chan):
                out[c].extend(got[c])
        return out

    def flush(self) -> list[list[RawFrame]]:
        """Process the final partial superblock (EOF, zero-padded).

        Channels must be lockstep (same pending length) for exact parity;
        shorter channels are padded with silence.
        """
        bps = _BYTES_PER_SAMPLE[self.fmt]
        n = max(len(p) for p in self._pending) // bps
        if n == 0:
            self._pending = [b""] * self.n_chan
            return [[] for _ in range(self.n_chan)]
        super_bytes = self.seg_valid * bps
        chunk = np.zeros((self.n_chan, super_bytes), dtype=np.uint8)
        for c, p in enumerate(self._pending):
            chunk[c, : len(p)] = np.frombuffer(p, dtype=np.uint8)
        self._pending = [b""] * self.n_chan
        return self._process(chunk, n)

    # ------------------------------------------------------------------

    def _process(self, chunk: np.ndarray, valid_len: int) -> list[list[RawFrame]]:
        raw_mode = self.fmt == "uc8" and pallas_kernels.supported()
        if raw_mode:
            # fused convert+dense path: per-channel raw words + raw overlap.
            # A jax.Array chunk is PRE-STAGED device words (C, seg_valid)
            # — the sustained-e2e loops feed those so no per-dispatch IQ
            # upload rides the host->device link.
            if isinstance(chunk, jax.Array):
                words = chunk
            else:
                words = jnp.asarray(
                    np.frombuffer(chunk.tobytes(), dtype="<u2").reshape(
                        self.n_chan, self.seg_valid
                    )
                )
            if getattr(self, "_overlap_words", None) is None:
                # 0x8080 = I=Q=128 ≈ silence (see _demod_raw_gated)
                self._overlap_words = np.full(
                    (self.n_chan, TRAILING_SAMPLES), 0x8080, dtype="<u2"
                )
            ow = jnp.asarray(self._overlap_words)
        else:
            mag = _to_mag(chunk.reshape(-1), self.fmt).reshape(
                self.n_chan, self.seg_valid
            )
        while True:
            if raw_mode:
                gc = _demod_and_gate_multi_raw(
                    words, ow,
                    jnp.int32(valid_len), jnp.int32(self.threshold),
                    self.mirror.tbl,
                    k=self.k, scan_len=self.scan_len, l=self.compact_l,
                    k2=self.gate_k2, nfix=self.nfix, fix_df=self.fix_df,
                    reset_every=self.block_samples,
                    seg_stride=self.seg_stride, seg_valid=self.seg_valid,
                    keep_l=self.gate_keep_l,
                    force_staged=getattr(self, "_force_staged", False),
                )
                new_overlap = level = power = None
            else:
                gc, new_overlap, level, power = _demod_and_gate_multi(
                    mag,
                    self._overlap_dev,
                    jnp.int32(valid_len),
                    jnp.int32(self.threshold),
                    self.mirror.tbl,
                    k=self.k,
                    scan_len=self.scan_len,
                    l=self.compact_l,
                    k2=self.gate_k2,
                    nfix=self.nfix,
                    fix_df=self.fix_df,
                    reset_every=self.block_samples,
                    seg_stride=self.seg_stride,
                    seg_valid=self.seg_valid,
                    keep_l=self.gate_keep_l,
                )
            n, max_local, n_keep, kw = map(
                int,
                jax.device_get(
                    [gc.n_cand, gc.max_local, gc.n_keep, gc.keep_watermark]
                ),
            )
            if gc.fused_overflow is not None and int(gc.fused_overflow) > 0:
                self._force_staged = True
                continue
            if (
                n <= self.k and max_local <= self.compact_l
                and n_keep <= self.gate_k2 and kw <= self.gate_keep_l
            ):
                break
            while self.k < n:
                self.k *= 2
            while self.compact_l < max_local:
                self.compact_l *= 2
            while self.gate_k2 < n_keep:
                self.gate_k2 *= 2
            while self.gate_keep_l < kw:
                self.gate_keep_l *= 2

        (offs, cf, msgb, s112, s56, sl, ss, dcq, dcb, dcc) = jax.device_get(
            [
                gc.offsets, gc.corr_fired, gc.msg, gc.syn112, gc.syn56,
                gc.sig_long, gc.sig_short,
                gc.drop_cum_q, gc.drop_cum_bnd, gc.drop_cum_chan,
            ]
        )
        if raw_mode:
            if isinstance(chunk, jax.Array):
                self._overlap_words = words[:, -TRAILING_SAMPLES:]
            else:
                self._overlap_words = np.frombuffer(
                    chunk.tobytes(), dtype="<u2"
                ).reshape(self.n_chan, self.seg_valid)[:, -TRAILING_SAMPLES:]
        else:
            self._overlap_dev = new_overlap
            lv, pw = jax.device_get([level, power])
            self.mean_level = np.asarray(lv)
            self.mean_power = np.asarray(pw)

        from .ops.gate import skipped_drops

        nb_per_chan = dcb.shape[1] // self.n_chan
        sl64 = _sigsum(sl)
        ss64 = _sigsum(ss)
        bounds = np.searchsorted(
            offs[:n_keep], np.arange(self.n_chan + 1) * self.seg_stride
        )
        results: list[list[RawFrame]] = []
        all_frames: list[RawFrame] = []
        for c in range(self.n_chan):
            a, b = int(bounds[c]), int(bounds[c + 1])
            loc = offs[a:b] - c * self.seg_stride
            kw = dict(
                scan_len=self.seg_valid,
                block_scan_start=self.scan_global,
                carry_skip=self._skips[c],
                reset_every=self.block_samples,
            )
            args = (loc, b - a, cf[a:b], msgb[a:b], s112[a:b], s56[a:b],
                    sl64[a:b], ss64[a:b])
            if self.native:
                frames, leftover = self.fins[c].finalize_block(*args, **kw)
            else:
                frames, leftover = finalize_block(self.fins[c], *args, **kw)
            self._skips[c] = 0  # carry_skip off (matches Demodulator default)

            # exact per-channel drop statistics (see _demod_mag_gated)
            # dcq/dcb slices hold GLOBAL cumulative counts; skipped_drops
            # only ever differences them, so no per-channel rebase needed
            dcb_c = dcb[:, c * nb_per_chan : (c + 1) * nb_per_chan]
            sk_u, sk_b = skipped_drops(
                frames, loc, dcq[:, :, a:b], dcb_c,
                block_scan_start=self.scan_global,
                reset_every=self.block_samples,
            )
            pre_c = int(dcc[0, c + 1] - dcc[0, c])
            unk_c = int(dcc[1, c + 1] - dcc[1, c])
            bad_c = int(dcc[2, c + 1] - dcc[2, c])
            gd = self._gate_drops[c]
            gd[0] += pre_c - sk_u - sk_b
            gd[1] += unk_c - sk_u
            gd[2] += bad_c - sk_b
            results.append(frames)
            all_frames.extend(frames)

        self.scan_global += valid_len
        now_ms = self.scan_global * 5 // 12000
        for c in range(self.n_chan):
            if self.native:
                self.fins[c].icao_expire(now_ms)
            else:
                self.fins[c].icao.expire(now_ms)
        self.mirror.add_from_frames(all_frames)
        self.mirror.expire(now_ms)
        return results

    # ------------------------------------------------------------------

    @property
    def stats(self):
        """Aggregate demod stats across channels (per-channel via
        channel_stats)."""
        from .decode.score import DemodStats

        d = DemodStats()
        acc: list[int] = []
        for c in range(self.n_chan):
            sc = self.channel_stats(c)
            d.preambles += sc.preambles
            d.rejected_bad += sc.rejected_bad
            d.rejected_unknown_icao += sc.rejected_unknown_icao
            for i, v in enumerate(sc.accepted):
                while len(acc) <= i:
                    acc.append(0)
                acc[i] += v
        d.accepted = acc or [0, 0, 0]
        return d

    def channel_stats(self, c: int):
        from .decode.score import DemodStats

        d = DemodStats()
        if self.native:
            st = self.fins[c].stats()
            d.preambles = st["preambles"]
            d.rejected_bad = st["rejected_bad"]
            d.rejected_unknown_icao = st["rejected_unknown_icao"]
            d.accepted = st["accepted"]
        else:
            s = self.fins[c].stats
            d.preambles = s.preambles
            d.rejected_bad = s.rejected_bad
            d.rejected_unknown_icao = s.rejected_unknown_icao
            d.accepted = list(s.accepted)
            d.overflow_blocks = s.overflow_blocks
        gd = self._gate_drops[c]
        d.preambles += gd[0]
        d.rejected_unknown_icao += gd[1]
        d.rejected_bad += gd[2]
        return d


def demodulate_file(path: str, fmt: str = "uc8", **kw) -> tuple[list[RawFrame], Demodulator]:
    """Demodulate a whole IQ capture file (the reference's --ifile mode)."""
    demod = Demodulator(fmt=fmt, **kw)
    frames: list[RawFrame] = []
    chunk_bytes = demod.super_samples * _BYTES_PER_SAMPLE[fmt]
    with open(path, "rb") as f:
        while True:
            raw = f.read(chunk_bytes)
            if not raw:
                break
            frames.extend(demod.feed(raw))
    frames.extend(demod.flush())
    return frames, demod
