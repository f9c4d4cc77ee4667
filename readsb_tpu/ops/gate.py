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
    drop_cum_bnd: jax.Array  # int32[2, NB]


def score_gate(
    bc: BlockCandidates,
    bm_cur: jax.Array,
    bm_prev: jax.Array,
    valid_len: jax.Array | int | None = None,
    *,
    scan_len: int,
    k2: int = 1024,
    s_cap: int = 256,
    nfix: int = 1,
    fix_df: bool = True,
    reset_every: int | None = None,
) -> GatedCandidates:
    """Pure function (jnp; CPU/TPU identical) — see module docstring."""
    k = bc.offsets.shape[0]
    if valid_len is None:
        valid_len = scan_len
    # candidates at/after valid_len (EOF padding) are dropped silently and
    # uncounted, matching the ungated host path's offset masking
    valid = bc.offsets < valid_len  # (K,)
    msg = bc.msg.astype(jnp.int32)
    df = msg[:, :, 0] >> 3  # (K,5)
    aa = (msg[:, :, 1] << 16) | (msg[:, :, 2] << 8) | msg[:, :, 3]
    syn112 = bc.syn112
    syn56 = bc.syn56

    cf = bc.corr_fired
    fired = jnp.stack([cf[:, 0], cf[:, 0], cf[:, 1], cf[:, 1], cf[:, 2]], axis=1)

    zero7 = jnp.sum(msg[:, :, :7], axis=2) == 0  # (K,5) all-zero message

    # --- syndrome table membership (small tables: broadcast compare) --------
    if nfix > 0:
        t112 = jnp.asarray(_table_syndromes_np(112, nfix))
        t56 = jnp.asarray(_table_syndromes_np(56, nfix))
        in_t112 = jnp.any(syn112[:, :, None] == t112[None, None, :], axis=-1)
        in_t56 = jnp.any(syn56[:, :, None] == t56[None, None, :], axis=-1)
    else:
        in_t112 = jnp.zeros_like(syn112, dtype=bool)
        in_t56 = jnp.zeros_like(syn56, dtype=bool)

    # --- 1-bit damaged DF17 (fixDF17msgtype) --------------------------------
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
    # local capacity 256 == block size: can never overflow (exactness)
    s_idx, _ = _compact_two_level(flat_learn, s_cap, 256, flat_learn.shape[0])
    s_count = jnp.sum(flat_learn.astype(jnp.int32))
    s_vals = jnp.where(
        s_idx < n_flat, flat_aa[jnp.minimum(s_idx, n_flat - 1)], jnp.int32(-1)
    )
    s_overflow = s_count > s_cap

    # --- known-ICAO test: residual in (bitmap U teach-set) ------------------
    residual = jnp.where(df >= 16, syn112, syn56) & 0xFFFFFF
    bm = bm_cur | bm_prev
    word = bm[(residual >> 5).reshape(-1)].reshape(residual.shape)
    in_bitmap = ((word >> (residual & 31)) & 1) != 0
    in_s = jnp.any(residual[:, :, None] == s_vals[None, None, :], axis=-1)
    known = in_bitmap | in_s | s_overflow

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
    kidx, _ = _compact_two_level(keep, k2, 256, k)
    n_keep = jnp.sum(keep.astype(jnp.int32))
    safe = jnp.minimum(kidx, k - 1)
    live = kidx < k

    def take(a):
        return jnp.where(
            live.reshape((k2,) + (1,) * (a.ndim - 1)), a[safe], jnp.zeros_like(a[safe])
        )

    offsets2 = jnp.where(live, bc.offsets[safe], scan_len)

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
    re = reset_every or scan_len
    nb = (scan_len + re - 1) // re
    bnds = jnp.arange(1, nb + 1, dtype=jnp.int32) * re
    drop_cum_bnd = cumlt(jnp.minimum(bnds, scan_len))  # (2, NB)

    return GatedCandidates(
        offsets=offsets2,
        n_cand=bc.n_cand,
        max_local=bc.max_local,
        n_keep=n_keep,
        pre_drop=pre_drop,
        unknown_drop=unknown_drop,
        bad_drop=bad_drop,
        corr_fired=take(bc.corr_fired),
        msg=take(bc.msg),
        syn112=take(bc.syn112),
        syn56=take(bc.syn56),
        sig_long=take(bc.sig_long),
        sig_short=take(bc.sig_short),
        drop_cum_q=drop_cum_q,
        drop_cum_bnd=drop_cum_bnd,
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

MAX_ADDS = 256


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _icao_apply(bm_cur, bm_prev, addrs, do_swap):
    """Swap generations (prev<-cur, cur<-0) then OR new addrs into cur.

    addrs int32[MAX_ADDS], -1 = unused.  Caller guarantees each addr is not
    already present in the current generation (so scatter-add == OR).
    """
    bm_prev = jnp.where(do_swap, bm_cur, bm_prev)
    bm_cur = jnp.where(do_swap, jnp.zeros_like(bm_cur), bm_cur)
    ok = addrs >= 0
    w = jnp.where(ok, addrs >> 5, 0)
    v = jnp.where(ok, jnp.left_shift(jnp.uint32(1), (addrs & 31).astype(jnp.uint32)), 0)
    bm_cur = bm_cur.at[w].add(v.astype(jnp.uint32), mode="drop")
    return bm_cur, bm_prev


class DeviceIcaoMirror:
    """Mirrors IcaoFilter / the native filter's generation clock on device.

    The swap schedule replicates IcaoFilter.expire (60 s TTL, initialized
    on first expire call) so the device bitmap always equals the host
    filter state at the start of each superblock.
    """

    TTL_MS = 60_000

    def __init__(self):
        self.bm_cur = jnp.zeros(ICAO_WORDS, jnp.uint32)
        self.bm_prev = jnp.zeros(ICAO_WORDS, jnp.uint32)
        self._cur_set: set[int] = set()
        self.next_swap_ms: int | None = None
        self._pending: list[int] = []

    def add_from_frames(self, frames) -> None:
        """Queue filter additions implied by accepted frames (mode_s.c:778)."""
        for f in frames:
            if f.correctedbits:
                continue
            d = f.msg[0] >> 3
            if d == 17 or (d == 11 and f.iid == 0):
                a = f.addr & 0xFFFFFF
                if a not in self._cur_set:
                    self._cur_set.add(a)
                    self._pending.append(a)

    def expire(self, now_ms: int) -> bool:
        if self.next_swap_ms is None:
            self.next_swap_ms = now_ms + self.TTL_MS
            return False
        if now_ms >= self.next_swap_ms:
            self.next_swap_ms = now_ms + self.TTL_MS
            self._cur_set = set()
            return True
        return False

    def flush(self, do_swap: bool = False) -> None:
        """Apply queued adds (and an optional generation swap) on device."""
        if not self._pending and not do_swap:
            return
        while self._pending or do_swap:
            chunk = self._pending[:MAX_ADDS]
            self._pending = self._pending[MAX_ADDS:]
            a = np.full(MAX_ADDS, -1, np.int32)
            a[: len(chunk)] = chunk
            self.bm_cur, self.bm_prev = _icao_apply(
                self.bm_cur, self.bm_prev, jnp.asarray(a), jnp.bool_(do_swap)
            )
            do_swap = False
