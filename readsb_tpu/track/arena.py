"""Device-side aircraft arena: a dense SoA state store updated in bulk.

The reference tracks aircraft in a 2^20-bucket open hash swept by
threadpools (readsb.h:310-313, track.c:2948-3043, aircraft.c:29-100).  The
TPU-native redesign splits the work:

  host    owns the ICAO -> slot assignment (a Python dict — control plane,
          O(1) per message) and batches per-message field updates into SoA
          tensors;
  device  owns the state (structure-of-arrays over N slots) and applies a
          whole batch per dispatch with vectorized accept_data semantics
          (track.c:128-221) via segment-argmax, plus the staleness sweep
          (track.c:2948) as a masked bulk clear.

Batch-exactness: within one batch the serial accept_data fold over a
slot's messages ends in the state of the *latest message of the highest
source* (acceptance requires src >= current, so accepted sources are
non-decreasing).  That equivalence needs the batch to span less than
TRACK_STALE (15 s) of message time — otherwise staleness could re-admit a
lower source mid-batch — so update_batch auto-splits on that window
(production batches are single superblocks of a few seconds anyway).
tests/test_arena.py replays the same stream through the dict tracker and
diffs final states.

Scope (v1): plain accept_data scalar fields + callsign + counters + seen
+ staleness sweep.  Field-specific logic (altitude outliers, squawk
double-confirmation, the CPR/speed-check position chain) stays in the
host tracker; those land on-device in a later round.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .tracker import TRACK_EXPIRE, TRACK_STALE, Source

ARENA_SLOTS = 1 << 17

# plain-accept scalar fields mirrored on device (tracker.py update()).
# Fields with message-type dispatch or extra logic (track/heading family,
# altitudes, squawk double-confirm) remain host-side in v1.
FIELDS = (
    "gs",
    "track_rate",
    "roll",
    "baro_rate",
    "geom_rate",
    "ias",
    "tas",
    "mach",
)
NFIELDS = len(FIELDS)
FIELD_IDX = {name: i for i, name in enumerate(FIELDS)}
# message attribute carrying each field (tracker.py reads gs_selected)
ATTR_OF = {name: name for name in FIELDS}
ATTR_OF["gs"] = "gs_selected"


class ArenaState(NamedTuple):
    icao: jax.Array  # int32[N], -1 = free slot
    seen: jax.Array  # int32[N] ms of last message
    messages: jax.Array  # int32[N]
    fval: jax.Array  # f32[N, F]
    fts: jax.Array  # int32[N, F] ms of last accept
    fsrc: jax.Array  # int32[N, F] Source enum, -1 = invalid
    callsign: jax.Array  # int32[N, 2] 8 chars packed big-endian
    cs_ts: jax.Array  # int32[N]
    cs_src: jax.Array  # int32[N]


def empty_arena(n: int = ARENA_SLOTS) -> ArenaState:
    return ArenaState(
        icao=jnp.full(n, -1, jnp.int32),
        seen=jnp.zeros(n, jnp.int32),
        messages=jnp.zeros(n, jnp.int32),
        fval=jnp.zeros((n, NFIELDS), jnp.float32),
        fts=jnp.zeros((n, NFIELDS), jnp.int32),
        fsrc=jnp.full((n, NFIELDS), -1, jnp.int32),
        callsign=jnp.zeros((n, 2), jnp.int32),
        cs_ts=jnp.zeros(n, jnp.int32),
        cs_src=jnp.full(n, -1, jnp.int32),
    )


class UpdateBatch(NamedTuple):
    """SoA message batch (M rows); host fills from decoded messages."""

    slot: jax.Array  # int32[M] arena slot (host-assigned); -1 = padding
    icao: jax.Array  # int32[M]
    ts: jax.Array  # int32[M] ms
    src: jax.Array  # int32[M] Source enum
    fmask: jax.Array  # bool[M, F] which fields this message carries
    fval: jax.Array  # f32[M, F]
    cs_valid: jax.Array  # bool[M]
    cs: jax.Array  # int32[M, 2]


@functools.partial(jax.jit, donate_argnums=(0,))
def arena_update(state: ArenaState, b: UpdateBatch) -> ArenaState:
    """Apply one message batch (vectorized accept_data)."""
    n = state.icao.shape[0]
    m = b.slot.shape[0]
    live = b.slot >= 0
    slot = jnp.where(live, b.slot, n)  # padding rows scatter off the end
    seq = jnp.arange(m, dtype=jnp.int32)

    # --- bookkeeping: icao registration, seen, message count ----------------
    icao = state.icao.at[slot].set(jnp.where(live, b.icao, 0), mode="drop")
    seen = state.seen.at[slot].max(jnp.where(live, b.ts, 0), mode="drop")
    messages = state.messages.at[slot].add(live.astype(jnp.int32), mode="drop")

    # --- scalar fields: winner = latest message of the highest source -------
    def lattice(cur_val, cur_ts, cur_src, umask, uval):
        """Generic accept_data merge.

        cur_* are (N, ...) state planes keyed by cur_ts/cur_src of shape S
        (= (N,) or (N, F)); umask is (M,)+S[1:]-shaped; uval matches
        cur_val.  The winner per (slot, field) is the latest message of
        the highest source; acceptance follows track.c:128-221.
        """
        shape_s = cur_ts.shape
        extra = (1,) * (umask.ndim - 1)
        bsrc = b.src.reshape((m,) + extra)
        bseq = seq.reshape((m,) + extra)
        bts = b.ts.reshape((m,) + extra)

        neg1 = jnp.full(shape_s, -1, jnp.int32)
        key_src = jnp.where(umask, bsrc, -1)
        smax = neg1.at[slot].max(key_src, mode="drop")
        is_max = umask & (key_src == smax[slot])
        key_seq = jnp.where(is_max, bseq, -1)
        qmax = neg1.at[slot].max(key_seq, mode="drop")
        winner = is_max & (key_seq == qmax[slot])

        w_ts = jnp.zeros(shape_s, jnp.int32).at[slot].max(
            jnp.where(winner, bts, 0), mode="drop"
        )
        has = smax >= 1  # Source.INVALID (0) never accepts (track.c:130)
        # accept_data gate (track.c:128-221): reject lower source unless
        # the field has gone stale (15 s); never step timestamps backwards
        accept = (
            has
            & ((smax >= cur_src) | (w_ts >= cur_ts + TRACK_STALE))
            & (w_ts >= cur_ts)
        )
        # PRIO is recorded as ADSB (track.c:213)
        new_src = jnp.where(smax == int(Source.PRIO), int(Source.ADSB), smax)

        if cur_val.dtype == jnp.float32:
            vmin = jnp.float32(-jnp.inf)
        else:
            vmin = jnp.int32(-(2**31))
        wmask = winner if cur_val.ndim == umask.ndim else winner[..., None]
        w_val = jnp.full(cur_val.shape, vmin, cur_val.dtype).at[slot].max(
            jnp.where(wmask, uval, vmin), mode="drop"
        )
        amask = accept if cur_val.ndim == accept.ndim else accept[..., None]

        return (
            jnp.where(amask, w_val, cur_val),
            jnp.where(accept, w_ts, cur_ts),
            jnp.where(accept, new_src, cur_src),
        )

    fval, fts, fsrc = lattice(state.fval, state.fts, state.fsrc, b.fmask, b.fval)
    callsign, cs_ts, cs_src = lattice(
        state.callsign, state.cs_ts, state.cs_src, b.cs_valid, b.cs
    )

    return ArenaState(
        icao=icao, seen=seen, messages=messages,
        fval=fval, fts=fts, fsrc=fsrc,
        callsign=callsign, cs_ts=cs_ts, cs_src=cs_src,
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def arena_sweep(state: ArenaState, now_ms, ttl_ms) -> tuple[ArenaState, jax.Array]:
    """Staleness sweep (trackRemoveStale, track.c:2948): clear dead slots.

    Returns (state, freed mask) — the host reclaims freed slot ids.
    """
    dead = (state.icao >= 0) & (now_ms >= state.seen + ttl_ms)

    def clr(a, fill):
        shape = (dead.shape[0],) + (1,) * (a.ndim - 1)
        return jnp.where(dead.reshape(shape), jnp.full_like(a, fill), a)

    ns = ArenaState(
        icao=clr(state.icao, -1),
        seen=clr(state.seen, 0),
        messages=clr(state.messages, 0),
        fval=clr(state.fval, 0),
        fts=clr(state.fts, 0),
        fsrc=clr(state.fsrc, -1),
        callsign=clr(state.callsign, 0),
        cs_ts=clr(state.cs_ts, 0),
        cs_src=clr(state.cs_src, -1),
    )
    return ns, dead


class Arena:
    """Host shell: slot assignment + batch building around the device state."""

    def __init__(self, n: int = ARENA_SLOTS):
        self.n = n
        self.state = empty_arena(n)
        self.slot_of: dict[int, int] = {}
        self.free: list[int] = list(range(n - 1, -1, -1))

    def _slot(self, addr: int) -> int:
        s = self.slot_of.get(addr)
        if s is None:
            s = self.free.pop()
            self.slot_of[addr] = s
        return s

    def update_batch(self, msgs) -> None:
        """msgs: iterable of ModesMessage-likes (time-ordered)."""
        msgs = list(msgs)
        if not msgs:
            return
        # the argmax fold is serial-exact only within a < TRACK_STALE span
        t0 = msgs[0].sys_timestamp_ms
        span = TRACK_STALE // 2
        if msgs[-1].sys_timestamp_ms - t0 >= span:
            cut = next(
                i for i, mm in enumerate(msgs)
                if mm.sys_timestamp_ms - t0 >= span
            )
            self.update_batch(msgs[:cut])
            self.update_batch(msgs[cut:])
            return
        rows = []
        for mm in msgs:
            addr = mm.addr & 0xFFFFFF
            rows.append((self._slot(addr), addr, mm))
        m = len(rows)
        mpad = max(256, 1 << (m - 1).bit_length())
        slot = np.full(mpad, -1, np.int32)
        icao = np.zeros(mpad, np.int32)
        ts = np.zeros(mpad, np.int32)
        src = np.zeros(mpad, np.int32)
        fmask = np.zeros((mpad, NFIELDS), bool)
        fval = np.zeros((mpad, NFIELDS), np.float32)
        cs_valid = np.zeros(mpad, bool)
        cs = np.zeros((mpad, 2), np.int32)
        for i, (s, addr, mm) in enumerate(rows):
            slot[i] = s
            icao[i] = addr
            ts[i] = mm.sys_timestamp_ms
            src[i] = int(mm.source)
            for name, j in FIELD_IDX.items():
                v = getattr(mm, ATTR_OF[name], None)
                if v is not None:
                    fmask[i, j] = True
                    fval[i, j] = np.float32(v)
            call = getattr(mm, "callsign", None)
            if call:
                raw = call.encode()[:8].ljust(8)
                cs_valid[i] = True
                cs[i, 0] = int.from_bytes(raw[:4], "big", signed=False) - (1 << 31)
                cs[i, 1] = int.from_bytes(raw[4:], "big", signed=False) - (1 << 31)
        batch = UpdateBatch(
            slot=jnp.asarray(slot), icao=jnp.asarray(icao), ts=jnp.asarray(ts),
            src=jnp.asarray(src), fmask=jnp.asarray(fmask), fval=jnp.asarray(fval),
            cs_valid=jnp.asarray(cs_valid), cs=jnp.asarray(cs),
        )
        self.state = arena_update(self.state, batch)

    def sweep(self, now_ms: int, ttl_ms: int = 5 * TRACK_EXPIRE) -> int:
        self.state, dead = arena_sweep(
            self.state, jnp.int32(now_ms), jnp.int32(ttl_ms)
        )
        freed = np.nonzero(np.asarray(dead))[0]
        if len(freed):
            inv = {v: k for k, v in self.slot_of.items()}
            for s in freed.tolist():
                addr = inv.get(s)
                if addr is not None:
                    del self.slot_of[addr]
                    self.free.append(s)
        return len(freed)

    # -- host-side readback (snapshot) --------------------------------------

    def snapshot(self, now_ms: int):
        """Fetch live rows as a dict addr -> {field: (value, src) fresh only}."""
        st = jax.device_get(self.state)
        out = {}
        for addr, s in self.slot_of.items():
            if st.icao[s] < 0:
                continue
            row = {"seen": int(st.seen[s]), "messages": int(st.messages[s])}
            for name, j in FIELD_IDX.items():
                if st.fsrc[s, j] >= 0 and now_ms < st.fts[s, j] + TRACK_EXPIRE:
                    row[name] = (float(st.fval[s, j]), int(st.fsrc[s, j]))
            if st.cs_src[s] >= 0 and now_ms < st.cs_ts[s] + TRACK_EXPIRE:
                b0 = int(st.callsign[s, 0]) + (1 << 31)
                b1 = int(st.callsign[s, 1]) + (1 << 31)
                row["callsign"] = (
                    b0.to_bytes(4, "big") + b1.to_bytes(4, "big")
                ).decode().rstrip()
            out[addr] = row
        return out
