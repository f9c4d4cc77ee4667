"""Device-side score gate: transfer only plausibly-acceptable candidates.

The host finalizer (decode/score.py, native/finalizer.cpp) is the exact,
serial scoring stage.  Through a narrow device->host link its input is the
bottleneck: ~150 B/candidate over a ~1% candidate density.  This gate
reproduces the *rejection* half of scoreModesMessage (mode_s.c:309-419) on
device and keeps only candidates that could possibly score > 0:

  kept    <=>  some fired phase satisfies one of
               - DF17/18 with zero or error-table-correctable syndrome
               - 1-bit-damaged DF17 (fixDF17msgtype syndrome match)
               - DF11 with clean high syndrome bits, or 1-bit-correctable
               - DF0/4/5/16/20/21 whose CRC residual is a *known* ICAO

"Known" is over-approximated by (device ICAO bitmap at superblock start)
UNION (addresses any in-block clean DF17 / DF11-IID0 phase could teach the
filter).  The union is a superset of every filter state the host can reach
while finalizing this superblock, so a candidate dropped here is one the
host would provably reject (score -1/-2):

  - frame output is bit-identical with the ungated pipeline, and
  - the drop counters returned (pre/unknown/bad) are exactly the stats
    the host would have counted for the dropped candidates.

If the in-block teach-set overflows its capacity, membership degrades to
"known" for everyone (pass-through) — more transfer, same semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import crc as crc_ops
from .demod import BlockCandidates, _compact_two_level

ICAO_WORDS = (1 << 24) // 32

_DF17_FIXABLE = (1, 25, 21, 19, 16)


@functools.lru_cache(maxsize=None)
def _df_delta_np() -> np.ndarray:
    from ..decode.score import df_delta_syndromes

    return df_delta_syndromes().astype(np.int64).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _table_syndromes_np(bits: int, nfix: int) -> np.ndarray:
    """Sorted int32 syndrome values of the nfix-bit error table."""
    tab = crc_ops.error_table(bits, min(nfix, 2))
    return np.asarray(tab.syndromes, dtype=np.int64).astype(np.int32)


class GatedCandidates(NamedTuple):
    offsets: jax.Array  # int32[K2] scan offsets of kept candidates (sentinel scan_len)
    n_cand: jax.Array  # int32[] total candidates pre-gate (k-overflow check)
    max_local: jax.Array  # int32[] compaction watermark pre-gate
    n_keep: jax.Array  # int32[] kept count (may exceed K2 => escalate)
    keep_watermark: jax.Array  # int32[] kept-compaction per-block peak
    #   (> the static keep_l capacity => offsets invalid, retry larger)
    pre_drop: jax.Array  # int32[] dropped candidates (stats: preambles)
    unknown_drop: jax.Array  # int32[] dropped with best score -1
    bad_drop: jax.Array  # int32[] dropped with best score -2
    corr_fired: jax.Array  # bool[K2, 3]
    msg: jax.Array  # uint8[K2, 5, 14]
    syn112: jax.Array  # int32[K2, 5]
    syn56: jax.Array  # int32[K2, 5]
    sig_long: jax.Array  # int32[K2, 2]
    sig_short: jax.Array  # int32[K2, 2]
    # cumulative dropped-candidate counts (class 0 = unknown/-1, 1 = bad/-2)
    # evaluated below each kept offset o, o+113, o+225, and each
    # reset_every boundary — lets the host subtract drops that fall inside
    # NMS skip windows (which the serial finalizer never counts).
    drop_cum_q: jax.Array  # int32[2, 3, K2]
    drop_cum_bnd: jax.Array  # int32[2, C*NB]
    # cumulative (pre, unknown, bad) drop counts at channel starts — the
    # host derives exact per-channel stats by differencing
    drop_cum_chan: jax.Array  # int32[3, C+1]
    # fused-kernel overflow passthrough (BlockCandidates.fused_overflow):
    # > 0 means the caller must redo the block via the staged path
    fused_overflow: jax.Array | None = None


def score_gate(
    bc: BlockCandidates,
    known_tbl: jax.Array,
    cs_hi: jax.Array,
    cs_lo: jax.Array,
    valid_len: jax.Array | int | None = None,
    *,
    scan_len: int,
    k2: int = 1024,
    s_cap: int = 256,
    nfix: int = 1,
    fix_df: bool = True,
    reset_every: int | None = None,
    seg_stride: int | None = None,
    keep_l: int = 64,
) -> GatedCandidates:
    """Pure function (jnp; CPU/TPU identical) — see module docstring.

    known_tbl: int32[T] known-ICAO addresses (cur+prev generation union),
    padded with the 0x1000000 sentinel (> any 24-bit residual).  A dense
    broadcast-compare replaces the round-2 bitmap probe: the bitmap cost
    K x 5 scalar word gathers (latency-bound on TPU); the compare is pure
    VPU work and T stays small because a demod channel only ever sees its
    own receiver's aircraft (capacity escalates by power of two).

    cs_hi/cs_lo: the dense stage's exact split prefix sums; signal sums
    are computed here for KEPT rows only (the host scorer needs them for
    accepted frames; dropped candidates never did).
    """
    k = bc.offsets.shape[0]
    if valid_len is None:
        valid_len = scan_len
    # candidates at/after valid_len (EOF padding) are dropped silently and
    # uncounted, matching the ungated host path's offset masking.  In the
    # channel-batched layout (seg_stride set) valid_len is per-channel and
    # sentinels (== scan_len) must stay invalid despite the modulo.
    if seg_stride is not None:
        valid = (bc.offsets < scan_len) & ((bc.offsets % seg_stride) < valid_len)
    else:
        valid = bc.offsets < valid_len  # (K,)
    if bc.live is not None:
        # fused-kernel path: per-tile sentinel rows carry tile-end offsets
        # (list stays nondecreasing); only live rows are candidates
        valid &= bc.live
    msg = bc.msg.astype(jnp.int32)
    df = msg[:, :, 0] >> 3  # (K,5)
    aa = (msg[:, :, 1] << 16) | (msg[:, :, 2] << 8) | msg[:, :, 3]
    syn112 = bc.syn112
    syn56 = bc.syn56

    cf = bc.corr_fired
    fired = jnp.stack([cf[:, 0], cf[:, 0], cf[:, 1], cf[:, 1], cf[:, 2]], axis=1)

    if bc.flags is not None:
        # the fused extract kernel already classified each phase in VMEM
        # (extract_classify_pallas); unpack its per-phase flag bitmask
        fl = bc.flags
        in_t112 = (fl & 1) != 0
        in_t56 = (fl & 2) != 0
        in_tbl_pre = (fl & 4) != 0
        fix_ok = (fl & 8) != 0
        zero7 = (fl & 16) != 0
    else:
        in_tbl_pre = None
        zero7 = jnp.sum(msg[:, :, :7], axis=2) == 0  # (K,5) all-zero message

        # --- syndrome table membership (small tables: broadcast compare) ----
        if nfix > 0:
            t112 = jnp.asarray(_table_syndromes_np(112, nfix))
            t56 = jnp.asarray(_table_syndromes_np(56, nfix))
            in_t112 = jnp.any(syn112[:, :, None] == t112[None, None, :], axis=-1)
            in_t56 = jnp.any(syn56[:, :, None] == t56[None, None, :], axis=-1)
        else:
            in_t112 = jnp.zeros_like(syn112, dtype=bool)
            in_t56 = jnp.zeros_like(syn56, dtype=bool)

        # --- 1-bit damaged DF17 (fixDF17msgtype) ----------------------------
        fix_ok = jnp.zeros_like(df, dtype=bool)
        if fix_df and nfix > 0:
            deltas = _df_delta_np()
            for d in _DF17_FIXABLE:
                fix_ok |= (df == d) & (syn112 == int(deltas[d]))

    # --- in-block teachable addresses (superset of host learns) -------------
    learn = fired & (
        ((df == 17) & (syn112 == 0))
        | ((df == 11) & (syn56 == 0))  # clean CRC and IID==0 <=> syn56 == 0
    )
    flat_learn = learn.reshape(-1)
    flat_aa = aa.reshape(-1)
    n_flat = flat_learn.shape[0]
    pad = (-n_flat) % 256
    if pad:
        flat_learn = jnp.pad(flat_learn, (0, pad))
        flat_aa = jnp.pad(flat_aa, (0, pad))
    # small local capacity: learners are sparse (clean DF17/DF11-IID0
    # phases only); a block overflowing it degrades to pass-through via
    # s_overflow below, which is always safe (gate drops nothing extra)
    s_idx, s_watermark = _compact_two_level(
        flat_learn, s_cap, 32, flat_learn.shape[0]
    )
    s_count = jnp.sum(flat_learn.astype(jnp.int32))
    s_vals = jnp.where(
        s_idx < n_flat, flat_aa[jnp.minimum(s_idx, n_flat - 1)], jnp.int32(-1)
    )
    s_overflow = (s_count > s_cap) | (s_watermark > 32)

    # --- known-ICAO test: residual in (known table U teach-set) -------------
    residual = jnp.where(df >= 16, syn112, syn56) & 0xFFFFFF
    if in_tbl_pre is not None:
        in_tbl = in_tbl_pre  # probed in-kernel against the same table
    else:
        in_tbl = jnp.any(residual[:, :, None] == known_tbl[None, None, :], axis=-1)
    in_s = jnp.any(residual[:, :, None] == s_vals[None, None, :], axis=-1)
    known = in_tbl | in_s | s_overflow

    # --- per-phase class: 2 pass / 1 reject-unknown (-1) / 0 reject-bad (-2)
    is_short_icao = (df == 0) | (df == 4) | (df == 5)
    is_long_icao = (df == 16) | (df == 20) | (df == 21)
    icao_dep = is_short_icao | is_long_icao

    long_ok = ((df == 17) | (df == 18)) & ((syn112 == 0) | in_t112)
    df11_clean = (df == 11) & ((syn56 & 0xFFFF80) == 0)
    df11_corr = (df == 11) & ((syn56 & 0xFFFF80) != 0) & in_t56

    pass_p = ~zero7 & (
        long_ok | fix_ok | df11_clean | df11_corr | (icao_dep & known)
    )
    unk_p = ~zero7 & icao_dep & ~known
    cls = jnp.where(pass_p, 2, jnp.where(unk_p, 1, 0))
    cls = jnp.where(fired, cls, -1)
    cand_cls = jnp.max(cls, axis=1)  # (K,)

    keep = valid & (cand_cls == 2)
    dropped = valid & ~keep
    pre_drop = jnp.sum(dropped.astype(jnp.int32))
    unknown_drop = jnp.sum((dropped & (cand_cls == 1)).astype(jnp.int32))
    bad_drop = pre_drop - unknown_drop

    # --- compact kept candidates to K2 rows ---------------------------------
    kidx, keep_watermark = _compact_two_level(keep, k2, keep_l, k)
    n_keep = jnp.sum(keep.astype(jnp.int32))
    safe = jnp.minimum(kidx, k - 1)
    live = kidx < k

    def take(a):
        return jnp.where(
            live.reshape((k2,) + (1,) * (a.ndim - 1)), a[safe], jnp.zeros_like(a[safe])
        )

    offsets2 = jnp.where(live, bc.offsets[safe], scan_len)

    # signal sums for kept rows only (K2 << K gathers)
    from .demod import window_sums

    sig_long, sig_short = window_sums(offsets2, cs_hi, cs_lo)

    # --- skip-window drop accounting (see GatedCandidates docstring) --------
    unk_mask = (dropped & (cand_cls == 1)).astype(jnp.int32)
    bad_mask = (dropped & (cand_cls == 0)).astype(jnp.int32)
    cum_unk = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(unk_mask)])
    cum_bad = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(bad_mask)])

    def cumlt(x):  # number of dropped candidates with offset < x, per class
        r = jnp.searchsorted(bc.offsets, x, side="left")
        return jnp.stack([cum_unk[r], cum_bad[r]])  # (2, ...)

    q = jnp.stack([offsets2, offsets2 + 113, offsets2 + 225], axis=0)  # (3, K2)
    drop_cum_q = jnp.moveaxis(cumlt(q), 0, 0)  # (2, 3, K2)
    stride = seg_stride or scan_len
    n_chan = scan_len // stride
    re = reset_every or stride
    nb = (stride + re - 1) // re  # reset boundaries per channel segment
    local = jnp.arange(1, nb + 1, dtype=jnp.int32) * re
    bnds = (
        jnp.arange(n_chan, dtype=jnp.int32)[:, None] * stride + local[None, :]
    ).reshape(-1)
    drop_cum_bnd = cumlt(jnp.minimum(bnds, scan_len))  # (2, C*NB)

    # per-channel drop totals: cumulative (pre, unknown, bad) at channel starts
    cum_pre = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(dropped.astype(jnp.int32))]
    )
    cstarts = jnp.arange(n_chan + 1, dtype=jnp.int32) * stride
    rch = jnp.searchsorted(bc.offsets, cstarts, side="left")
    drop_cum_chan = jnp.stack([cum_pre[rch], cum_unk[rch], cum_bad[rch]])

    return GatedCandidates(
        offsets=offsets2,
        n_cand=bc.n_cand,
        max_local=bc.max_local,
        n_keep=n_keep,
        keep_watermark=keep_watermark,
        pre_drop=pre_drop,
        unknown_drop=unknown_drop,
        bad_drop=bad_drop,
        corr_fired=take(bc.corr_fired),
        msg=take(bc.msg),
        syn112=take(bc.syn112),
        syn56=take(bc.syn56),
        sig_long=sig_long,
        sig_short=sig_short,
        drop_cum_q=drop_cum_q,
        drop_cum_bnd=drop_cum_bnd,
        drop_cum_chan=drop_cum_chan,
        fused_overflow=bc.fused_overflow,
    )


def skipped_drops(
    frames,
    offs: np.ndarray,
    drop_cum_q: np.ndarray,
    drop_cum_bnd: np.ndarray,
    *,
    block_scan_start: int,
    reset_every: int | None,
) -> tuple[int, int]:
    """(unknown, bad) device-dropped candidates inside NMS skip windows.

    Reconstructs the serial finalizer's skip windows from the accepted
    frames (windows are disjoint by construction) and evaluates the
    device-computed cumulative drop counts at their endpoints.
    """
    unk = bad = 0
    for f in frames:
        o = f.scan_offset - block_scan_start
        e = o + f.msgbits * 2 + 1
        row = int(np.searchsorted(offs, o))
        base_u = int(drop_cum_q[0, 0, row])
        base_b = int(drop_cum_q[1, 0, row])
        if reset_every is not None:
            bnd_i = o // reset_every
            bnd = (bnd_i + 1) * reset_every
            if bnd < e:
                unk += int(drop_cum_bnd[0, bnd_i]) - base_u
                bad += int(drop_cum_bnd[1, bnd_i]) - base_b
                continue
        qi = 1 if f.msgbits == 56 else 2
        unk += int(drop_cum_q[0, qi, row]) - base_u
        bad += int(drop_cum_q[1, qi, row]) - base_b
    return unk, bad


# ---------------------------------------------------------------------------
# Device mirror of the host's two-generation ICAO filter
# ---------------------------------------------------------------------------

TBL_SENTINEL = 0x1000000  # > any 24-bit address; never equals a residual


class DeviceIcaoMirror:
    """Mirrors IcaoFilter / the native filter's generation clock on device.

    The device representation is a sentinel-padded int32 address table
    (cur U prev generation) consumed by score_gate's broadcast compare.
    The swap schedule replicates IcaoFilter.expire (60 s TTL, initialized
    on first expire call) so the table always equals the host filter
    state at the start of each superblock.  Capacity grows by powers of
    two; a capacity change reshapes the table, which retraces the jitted
    gate (same escalate-and-recompile contract as candidate capacity k).
    """

    TTL_MS = 60_000

    def __init__(self, capacity: int = 2048):
        self.capacity = capacity
        self._cur_set: set[int] = set()
        self._prev_set: set[int] = set()
        self.next_swap_ms: int | None = None
        self._dirty = True
        self._tbl: jax.Array | None = None

    @property
    def tbl(self) -> jax.Array:
        if self._dirty or self._tbl is None:
            vals = sorted(self._cur_set | self._prev_set)
            while len(vals) > self.capacity:
                self.capacity *= 2
            # pad to the smallest 128-lane multiple that holds the live
            # entries: the gate's membership compare is O(K x 5 x T), so a
            # full-capacity pad costs 16x on a quiet table (r4 on-device
            # measurement); growth retraces like any capacity change
            size = max(128, -(-len(vals) // 128) * 128)
            a = np.full(size, TBL_SENTINEL, np.int32)
            a[: len(vals)] = vals
            self._tbl = jnp.asarray(a)
            self._dirty = False
        return self._tbl

    def add_from_frames(self, frames) -> None:
        """Apply filter additions implied by accepted frames (mode_s.c:778)."""
        for f in frames:
            if f.correctedbits:
                continue
            d = f.msg[0] >> 3
            if d == 17 or (d == 11 and f.iid == 0):
                a = f.addr & 0xFFFFFF
                if a not in self._cur_set:
                    self._cur_set.add(a)
                    self._dirty = True

    def expire(self, now_ms: int) -> bool:
        if self.next_swap_ms is None:
            self.next_swap_ms = now_ms + self.TTL_MS
            return False
        if now_ms >= self.next_swap_ms:
            self.next_swap_ms = now_ms + self.TTL_MS
            self._prev_set = self._cur_set
            self._cur_set = set()
            self._dirty = True
            return True
        return False
