"""Device-side aircraft arena: a dense SoA state store updated in bulk.

The reference tracks aircraft in a 2^20-bucket open hash swept by
threadpools (readsb.h:310-313, track.c:2948-3043, aircraft.c:29-100).  The
TPU-native redesign splits the work:

  host    owns the ICAO -> slot assignment (a Python dict — control plane,
          O(1) per message) and batches per-message field updates into SoA
          tensors;
  device  owns the state (structure-of-arrays over N slots) and applies a
          whole batch per dispatch, plus the staleness sweep
          (track.c:2948) as a masked bulk clear.

v2 execution model: the host ranks each message within its slot (message
ordinal r); the device runs a `lax.scan` over rounds — round r applies at
most ONE message per slot as vectorized masked scatters, so the serial
per-aircraft fold of trackUpdateFromMessage is reproduced EXACTLY (the
round decomposition the columnar host tracker uses, track/bulk.py, moved
on-device).  This removes v1's batch-span caveat and lets the
field-specific accept rules run on-device:

  - plain accept_data lattice fields (track.c:128-221)
  - baro-altitude outlier rejection (updateAltitude, track.c:1709-1813):
    reliability score + implied-fpm window from the known vertical rate
  - squawk double-confirmation (track.c:2071-2092): JAERO immediate
    accept, else the tentative must have held unchanged for >750 ms
  - callsign + counters + seen

v3 adds the CPR pair store and the GLOBAL decode on device
(ops/cpr_device.py: exact int32 lattice + NL thresholds inside the
update scan) — airborne always, surface when a fixed receiver location
is configured (the track.c:759-777 reference chain then always picks
it, and the quadrant compares precompute to integer thresholds); the
host applies the surface 450 km reference-distance gate
(track.c:784-792) and converts the integer decisions to f64 degrees
with the reference's exact expressions and keeps the speed-check /
acceptance chain (SURVEY build-plan step 6 staging).  tests/test_arena.py
replays fuzzed streams (altitude excursions, squawk churn, CPR lattices)
through the dict tracker and diffs final states field for field.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bulk import _NIC_V0 as _NIC_V0_B
from .bulk import _RC_V0 as _RC_V0_B
from .tracker import CPR_MAX_INTERVAL, TRACK_EXPIRE, TRACK_STALE, Source

ARENA_SLOTS = 1 << 17
_NEVER = -(1 << 30)

# plain-accept scalar fields mirrored on device (tracker.py update()).
FIELDS = (
    "gs",
    "track_rate",
    "roll",
    "baro_rate",
    "geom_rate",
    "ias",
    "tas",
    "mach",
    "geom_alt",
    "geom_delta",
    "nav_qnh",
    "nav_altitude_mcp",
    "nav_altitude_fms",
    "nav_heading",
)
NFIELDS = len(FIELDS)
FIELD_IDX = {name: i for i, name in enumerate(FIELDS)}
# integer-typed aircraft fields (materializers cast back from the f32 SoA)
INT_FIELDS = frozenset(
    {"geom_alt", "geom_delta", "nav_altitude_mcp", "nav_altitude_fms",
     "baro_rate", "geom_rate", "ias", "tas"}
)
# message attribute carrying each field (tracker.py reads gs_selected)
ATTR_OF = {name: name for name in FIELDS}
ATTR_OF["gs"] = "gs_selected"
ATTR_OF["nav_altitude_mcp"] = "nav_mcp_altitude"
ATTR_OF["nav_altitude_fms"] = "nav_fms_altitude"
_J_BR = FIELD_IDX["baro_rate"]
_J_GR = FIELD_IDX["geom_rate"]


class ArenaState(NamedTuple):
    icao: jax.Array  # int32[N], -1 = free slot
    seen: jax.Array  # int32[N] ms of last message
    messages: jax.Array  # int32[N]
    fval: jax.Array  # f32[N, F]
    fts: jax.Array  # int32[N, F] ms of last accept (_NEVER = unset)
    fsrc: jax.Array  # int32[N, F] Source enum, -1 = invalid
    callsign: jax.Array  # int32[N, 2] 8 chars packed big-endian
    cs_ts: jax.Array  # int32[N]
    cs_src: jax.Array  # int32[N]
    # baro altitude + outlier score (updateAltitude)
    alt: jax.Array  # int32[N] feet
    alt_ts: jax.Array  # int32[N]
    alt_src: jax.Array  # int32[N]
    alt_rel: jax.Array  # int32[N] reliability 0..20
    # baro_alt ever assigned: score exhaustion invalidates alt_src while the
    # stale value is retained (track.c:1793-1800), so alt_src can't encode it
    alt_set: jax.Array  # bool[N]
    # squawk + double-confirmation tentative; -1 = unset
    squawk: jax.Array  # int32[N]
    sq_ts: jax.Array  # int32[N]
    sq_src: jax.Array  # int32[N]
    sq_tent: jax.Array  # int32[N]
    sq_tent_ts: jax.Array  # int32[N] ms of last tentative change
    # CPR pair state (track.c:1249-1385 head): index 0=even, 1=odd;
    # raw values always overwrite, the clock moves via accept_data
    c_lat: jax.Array  # int32[N, 2]
    c_lon: jax.Array  # int32[N, 2]
    c_surf: jax.Array  # bool[N, 2]
    c_ts: jax.Array  # int32[N, 2]
    c_src: jax.Array  # int32[N, 2]
    c_nic: jax.Array  # int32[N, 2] integrity category at pair accept
    c_rc: jax.Array  # f32[N, 2] containment radius (meters)


def empty_arena(n: int = ARENA_SLOTS) -> ArenaState:
    return ArenaState(
        icao=jnp.full(n, -1, jnp.int32),
        seen=jnp.zeros(n, jnp.int32),
        messages=jnp.zeros(n, jnp.int32),
        fval=jnp.zeros((n, NFIELDS), jnp.float32),
        fts=jnp.full((n, NFIELDS), _NEVER, jnp.int32),
        fsrc=jnp.full((n, NFIELDS), -1, jnp.int32),
        callsign=jnp.zeros((n, 2), jnp.int32),
        cs_ts=jnp.full(n, _NEVER, jnp.int32),
        cs_src=jnp.full(n, -1, jnp.int32),
        alt=jnp.zeros(n, jnp.int32),
        alt_ts=jnp.full(n, _NEVER, jnp.int32),
        alt_src=jnp.full(n, -1, jnp.int32),
        alt_rel=jnp.zeros(n, jnp.int32),
        alt_set=jnp.zeros(n, bool),
        squawk=jnp.full(n, -1, jnp.int32),
        sq_ts=jnp.full(n, _NEVER, jnp.int32),
        sq_src=jnp.full(n, -1, jnp.int32),
        sq_tent=jnp.full(n, -1, jnp.int32),
        sq_tent_ts=jnp.full(n, _NEVER, jnp.int32),
        c_lat=jnp.zeros((n, 2), jnp.int32),
        c_lon=jnp.zeros((n, 2), jnp.int32),
        c_surf=jnp.zeros((n, 2), bool),
        c_ts=jnp.full((n, 2), _NEVER, jnp.int32),
        c_src=jnp.full((n, 2), -1, jnp.int32),
        c_nic=jnp.zeros((n, 2), jnp.int32),
        c_rc=jnp.zeros((n, 2), jnp.float32),
    )


class UpdateBatch(NamedTuple):
    """SoA message batch (M rows); host fills from decoded messages."""

    slot: jax.Array  # int32[M] arena slot (host-assigned); -1 = padding
    rank: jax.Array  # int32[M] message ordinal within its slot
    icao: jax.Array  # int32[M]
    ts: jax.Array  # int32[M] ms
    src: jax.Array  # int32[M] Source enum
    fmask: jax.Array  # bool[M, F] which fields this message carries
    fval: jax.Array  # f32[M, F]
    cs_valid: jax.Array  # bool[M]
    cs: jax.Array  # int32[M, 2]
    alt_valid: jax.Array  # bool[M]
    alt: jax.Array  # int32[M] feet
    alt_q: jax.Array  # bool[M] AC q bit
    crc0: jax.Array  # bool[M] mm.crc == 0
    sq_valid: jax.Array  # bool[M]
    sq: jax.Array  # int32[M] squawk hex
    cpr_valid: jax.Array  # bool[M]
    cpr_odd: jax.Array  # bool[M]
    cpr_surf: jax.Array  # bool[M]
    cpr_lat: jax.Array  # int32[M] raw 17-bit CPR
    cpr_lon: jax.Array  # int32[M]
    cpr_nic: jax.Array  # int32[M] NIC at pair accept (v0 tables)
    cpr_rc: jax.Array  # f32[M] Rc (meters)


def _scatter(base, slot, mask, vals, fill):
    """One-row-per-slot scatter of this round's values; unset -> fill."""
    n = base.shape[0]
    sl = jnp.where(mask, slot, n)
    out = jnp.full(base.shape, fill, base.dtype)
    return out.at[sl].set(vals, mode="drop")


@functools.partial(jax.jit, static_argnames=("rounds",), donate_argnums=(0,))
def arena_update(
    state: ArenaState, b: UpdateBatch, rounds: int, surf_q=(0, 0, 0, 0, 0)
) -> ArenaState:
    """Apply one message batch: lax.scan over per-slot message ordinals.

    surf_q: (enabled, zneg, zpos, t0, t1) int scalars from
    ops.cpr_device.surface_quadrant_consts — the fixed-receiver surface
    reference (track.c:759-777 always picks the user location when one
    is set, so a single-receiver arena decodes surface pairs on device
    with exact host-chain semantics; enabled=0 leaves surface rows to
    the host path)."""
    n = state.icao.shape[0]
    live = b.slot >= 0
    slot_all = jnp.where(live, b.slot, n)

    # --- bookkeeping (order-independent) ------------------------------------
    icao = state.icao.at[slot_all].set(jnp.where(live, b.icao, 0), mode="drop")
    seen = state.seen.at[slot_all].max(jnp.where(live, b.ts, 0), mode="drop")
    messages = state.messages.at[slot_all].add(live.astype(jnp.int32), mode="drop")

    def round_step(carry, r):
        (fval, fts, fsrc, callsign, cs_ts, cs_src,
         alt, alt_ts, alt_src, alt_rel, alt_set,
         squawk, sq_ts, sq_src, sq_tent, sq_tent_ts,
         c_lat, c_lon, c_surf, c_ts, c_src, c_nic, c_rc) = carry
        mrow = live & (b.rank == r)
        slot = jnp.where(mrow, b.slot, n)

        # per-slot planes of this round's message (fill = inert)
        u_src = _scatter(jnp.zeros(n, jnp.int32), slot, mrow, b.src, -1)
        u_ts = _scatter(jnp.zeros(n, jnp.int32), slot, mrow, b.ts, _NEVER)
        p_src = jnp.where(u_src == int(Source.PRIO), int(Source.ADSB), u_src)

        def gate(cur_ts, cur_src, msrc=None):
            """accept_data (track.c:128-221) for this round's message."""
            s_ = u_src if msrc is None else msrc
            ok = (s_ >= 1) & (u_ts >= cur_ts)
            ok &= ~((s_ < cur_src) & (u_ts < cur_ts + TRACK_STALE))
            return ok

        # --- altitude outlier logic FIRST (tracker update order: the alt
        # decision reads rate state from strictly earlier messages) --------
        a_have = _scatter(jnp.zeros(n, bool), slot, mrow & b.alt_valid,
                          b.alt_valid, False)
        a_val = _scatter(jnp.zeros(n, jnp.int32), slot, mrow, b.alt, 0)
        a_q = _scatter(jnp.zeros(n, bool), slot, mrow, b.alt_q, False)
        a_crc0 = _scatter(jnp.zeros(n, bool), slot, mrow, b.crc0, False)
        old = jnp.where(alt_set, alt, 0)
        delta = a_val - old
        big = jnp.abs(delta) >= 300
        age_alt = jnp.maximum(0, u_ts - alt_ts)
        # pre-gate (track.c:2059-2068): lower-priority sources only run the
        # outlier logic once the held altitude goes stale
        a_have &= (
            (u_src >= alt_src)
            | (
                (age_alt > 10_000)
                & (alt_src != int(Source.JAERO))
                & (alt_src != int(Source.SBS))
            )
            | (age_alt > 30_000)
        )
        # C trunc division: all quantities here are nonneg denominators
        fpm = (delta * 600) // jnp.maximum(1, (age_alt // 100) + 10)
        fpm = jnp.where(delta < 0, -((-delta * 600) // jnp.maximum(1, (age_alt // 100) + 10)), fpm)
        fpm = jnp.where(big, fpm, 0)
        gr_ok = (fsrc[:, _J_GR] >= 0) & (u_ts < fts[:, _J_GR] + TRACK_EXPIRE)
        br_ok = (fsrc[:, _J_BR] >= 0) & (u_ts < fts[:, _J_BR] + TRACK_EXPIRE)
        age_gr = jnp.maximum(0, u_ts - fts[:, _J_GR])
        age_br = jnp.maximum(0, u_ts - fts[:, _J_BR])
        use_gr = gr_ok & (age_gr < age_br)
        use_br = ~use_gr & br_ok
        slack_gr = 1500 + jnp.minimum(11000, age_gr // 2)
        slack_br = 1500 + jnp.minimum(11000, age_br // 2)
        gr_v = fval[:, _J_GR].astype(jnp.int32)
        br_v = fval[:, _J_BR].astype(jnp.int32)
        min_fpm = jnp.where(use_gr, gr_v - slack_gr,
                            jnp.where(use_br, br_v - slack_br, -12500))
        max_fpm = jnp.where(use_gr, gr_v + slack_gr,
                            jnp.where(use_br, br_v + slack_br, 12500))
        alt_fresh = (alt_src >= 0) & (u_ts < alt_ts + TRACK_EXPIRE) & (
            age_alt < 30_000
        )
        decayed = jnp.where(
            alt_fresh, jnp.minimum(20 - 20 * age_alt // 30_000, alt_rel), 0
        )
        rel_now = jnp.where(a_have & big, decayed, alt_rel)
        good_crc = jnp.where(
            a_crc0 & ((u_src >= int(Source.JAERO)) | (u_src == int(Source.SBS))),
            20, 0,
        )
        good_crc = jnp.where(u_src == int(Source.MLAT), 9, good_crc)
        qbad = (old > 50175) & a_q & (rel_now > 5)
        # the q-bit branch zeroes good_crc and takes the discard path
        # (track.c:1756-1760)
        good_crc = jnp.where(qbad, 0, good_crc)
        accept_a = ~qbad & (
            (good_crc >= rel_now) | (u_src > alt_src) | (rel_now <= 0)
            | (jnp.abs(delta) < 300) | ((fpm > min_fpm) & (fpm < max_fpm))
        )
        latt_a = a_have & accept_a & gate(alt_ts, alt_src)
        discard_a = a_have & ~accept_a
        dec = rel_now - (good_crc + 1)
        # discard epilogue (track.c:1793-1800): clamp at 0 and invalidate the
        # source on exhaustion (the arena carries no JAERO position state,
        # so the pos_reliable JAERO exception never applies here)
        exhausted = discard_a & (dec <= 0)
        alt_rel = jnp.where(
            discard_a, jnp.maximum(0, dec),
            jnp.where(latt_a, jnp.clip(rel_now + good_crc + 1, 0, 20), rel_now),
        )
        alt = jnp.where(latt_a, a_val, alt)
        alt_ts = jnp.where(latt_a, u_ts, alt_ts)
        alt_src = jnp.where(
            exhausted, -1, jnp.where(latt_a, p_src, alt_src)
        )
        alt_set = alt_set | latt_a

        # --- plain lattice fields ------------------------------------------
        u_fm = _scatter(jnp.zeros((n, NFIELDS), bool), slot, mrow, b.fmask, False)
        u_fv = _scatter(jnp.zeros((n, NFIELDS), jnp.float32), slot, mrow, b.fval, 0.0)
        ok_f = (
            u_fm
            & (u_src[:, None] >= 1)
            & (u_ts[:, None] >= fts)
            & ~((u_src[:, None] < fsrc) & (u_ts[:, None] < fts + TRACK_STALE))
        )
        fval = jnp.where(ok_f, u_fv, fval)
        fts = jnp.where(ok_f, u_ts[:, None], fts)
        fsrc = jnp.where(ok_f, p_src[:, None], fsrc)

        # --- callsign ------------------------------------------------------
        u_cm = _scatter(jnp.zeros(n, bool), slot, mrow, b.cs_valid, False)
        u_cs = _scatter(jnp.zeros((n, 2), jnp.int32), slot, mrow, b.cs, 0)
        ok_c = u_cm & gate(cs_ts, cs_src)
        callsign = jnp.where(ok_c[:, None], u_cs, callsign)
        cs_ts = jnp.where(ok_c, u_ts, cs_ts)
        cs_src = jnp.where(ok_c, p_src, cs_src)

        # --- squawk double-confirmation (track.c:2071-2092) ----------------
        # JAERO accepts immediately; otherwise the tentative value must have
        # held unchanged for >750 ms.  The tentative is NOT cleared on
        # confirm.  (The reference's `now - a->seen < 15 s` guard on the
        # tentative change is always true — seen was set this message.)
        q_have = _scatter(jnp.zeros(n, bool), slot, mrow & b.sq_valid,
                          b.sq_valid, False)
        q_val = _scatter(jnp.zeros(n, jnp.int32), slot, mrow, b.sq, -2)
        will_q = gate(sq_ts, sq_src)
        change_tent = q_have & (sq_tent != q_val) & will_q
        confirm = (u_src == int(Source.JAERO)) | (
            (sq_tent == q_val) & (u_ts - sq_tent_ts > 750)
        )
        m1 = q_have & confirm & will_q
        squawk = jnp.where(m1, q_val, squawk)
        sq_ts = jnp.where(m1, u_ts, sq_ts)
        sq_src = jnp.where(m1, p_src, sq_src)
        sq_tent = jnp.where(change_tent, q_val, sq_tent)
        sq_tent_ts = jnp.where(change_tent, u_ts, sq_tent_ts)

        # --- CPR pair + device global airborne decode ----------------------
        # pair raw values always overwrite; the clock moves via accept_data
        # (tracker._update_position head, track.c:1249-1385)
        p_have = _scatter(jnp.zeros(n, bool), slot, mrow & b.cpr_valid,
                          b.cpr_valid, False)
        p_odd = _scatter(jnp.zeros(n, bool), slot, mrow, b.cpr_odd, False)
        p_surf = _scatter(jnp.zeros(n, bool), slot, mrow, b.cpr_surf, False)
        p_lat = _scatter(jnp.zeros(n, jnp.int32), slot, mrow, b.cpr_lat, 0)
        p_lon = _scatter(jnp.zeros(n, jnp.int32), slot, mrow, b.cpr_lon, 0)
        p_nic = _scatter(jnp.zeros(n, jnp.int32), slot, mrow, b.cpr_nic, 0)
        p_rc = _scatter(jnp.zeros(n, jnp.float32), slot, mrow, b.cpr_rc, 0.0)
        par = p_odd.astype(jnp.int32)  # 0=even, 1=odd
        sel = jax.nn.one_hot(par, 2, dtype=bool) & p_have[:, None]
        c_lat = jnp.where(sel, p_lat[:, None], c_lat)
        c_lon = jnp.where(sel, p_lon[:, None], c_lon)
        c_surf = jnp.where(sel, p_surf[:, None], c_surf)
        c_nic = jnp.where(sel, p_nic[:, None], c_nic)
        c_rc = jnp.where(sel, p_rc[:, None], c_rc)
        pair_ts = jnp.take_along_axis(c_ts, par[:, None], axis=1)[:, 0]
        pair_src = jnp.take_along_axis(c_src, par[:, None], axis=1)[:, 0]
        acc_p = p_have & gate(pair_ts, pair_src)
        c_ts = jnp.where(sel & acc_p[:, None], u_ts[:, None], c_ts)
        c_src = jnp.where(sel & acc_p[:, None], p_src[:, None], c_src)

        # global eligibility (tracker._update_position): other parity
        # fresh, close in time, same type; airborne decodes always on
        # device, surface only with a fixed receiver reference (surf_q)
        opar = (1 - par)[:, None]
        o_ts = jnp.take_along_axis(c_ts, opar, axis=1)[:, 0]
        o_src = jnp.take_along_axis(c_src, opar, axis=1)[:, 0]
        o_surf = jnp.take_along_axis(c_surf, opar, axis=1)[:, 0]
        pt = jnp.take_along_axis(c_ts, par[:, None], axis=1)[:, 0]
        glob = (
            p_have
            & (o_src >= 0)
            & (u_ts < o_ts + TRACK_EXPIRE)
            & (jnp.abs(pt - o_ts) <= CPR_MAX_INTERVAL)
            & (o_surf == p_surf)
        )
        from ..ops.cpr_device import decode_airborne_core, decode_surface_core

        surf_en, zneg, zpos, t0q, t1q = (jnp.int32(v) for v in surf_q)
        dec = decode_airborne_core(
            c_lat[:, 0], c_lon[:, 0], c_lat[:, 1], c_lon[:, 1], par
        )
        dsf = decode_surface_core(
            c_lat[:, 0], c_lon[:, 0], c_lat[:, 1], c_lon[:, 1], par,
            zneg, zpos, t0q, t1q,
        )
        dec_ok = glob & jnp.where(
            p_surf, (surf_en != 0) & dsf["ok"], dec["ok"]
        )
        d_j = jnp.where(p_surf, dsf["j"], dec["j"])
        d_nl = jnp.where(p_surf, dsf["nl"], dec["nl"])
        d_ni = jnp.where(p_surf, dsf["ni"], dec["ni"])
        d_m = jnp.where(p_surf, dsf["m"], dec["m"])
        # decoded NIC/Rc for a global fix: worse of the pair halves
        # (doGlobalCPR, track.c:753-756)
        d_nic = jnp.minimum(c_nic[:, 0], c_nic[:, 1])
        d_rc = jnp.maximum(c_rc[:, 0], c_rc[:, 1])
        ys = jnp.stack(
            [dec_ok.astype(jnp.int32), d_j, d_nl, d_ni,
             d_m, c_lat[:, 0], c_lon[:, 0], c_lat[:, 1], c_lon[:, 1],
             d_nic,
             jax.lax.bitcast_convert_type(d_rc, jnp.int32),
             p_surf.astype(jnp.int32)],
            axis=1,
        )  # (n, 12) per-round device decode record

        return (fval, fts, fsrc, callsign, cs_ts, cs_src,
                alt, alt_ts, alt_src, alt_rel, alt_set,
                squawk, sq_ts, sq_src, sq_tent, sq_tent_ts,
                c_lat, c_lon, c_surf, c_ts, c_src, c_nic, c_rc), ys

    carry = (state.fval, state.fts, state.fsrc, state.callsign,
             state.cs_ts, state.cs_src, state.alt, state.alt_ts,
             state.alt_src, state.alt_rel, state.alt_set, state.squawk,
             state.sq_ts, state.sq_src, state.sq_tent, state.sq_tent_ts,
             state.c_lat, state.c_lon, state.c_surf, state.c_ts,
             state.c_src, state.c_nic, state.c_rc)
    carry, cpr_ys = jax.lax.scan(
        round_step, carry, jnp.arange(rounds, dtype=jnp.int32)
    )
    (fval, fts, fsrc, callsign, cs_ts, cs_src, alt, alt_ts, alt_src,
     alt_rel, alt_set, squawk, sq_ts, sq_src, sq_tent, sq_tent_ts,
     c_lat, c_lon, c_surf, c_ts, c_src, c_nic, c_rc) = carry
    return ArenaState(
        icao=icao, seen=seen, messages=messages,
        fval=fval, fts=fts, fsrc=fsrc,
        callsign=callsign, cs_ts=cs_ts, cs_src=cs_src,
        alt=alt, alt_ts=alt_ts, alt_src=alt_src, alt_rel=alt_rel,
        alt_set=alt_set,
        squawk=squawk, sq_ts=sq_ts, sq_src=sq_src, sq_tent=sq_tent,
        sq_tent_ts=sq_tent_ts,
        c_lat=c_lat, c_lon=c_lon, c_surf=c_surf, c_ts=c_ts, c_src=c_src,
        c_nic=c_nic, c_rc=c_rc,
    ), cpr_ys


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
        fts=clr(state.fts, _NEVER),
        fsrc=clr(state.fsrc, -1),
        callsign=clr(state.callsign, 0),
        cs_ts=clr(state.cs_ts, _NEVER),
        cs_src=clr(state.cs_src, -1),
        alt=clr(state.alt, 0),
        alt_ts=clr(state.alt_ts, _NEVER),
        alt_src=clr(state.alt_src, -1),
        alt_rel=clr(state.alt_rel, 0),
        alt_set=clr(state.alt_set, False),
        squawk=clr(state.squawk, -1),
        sq_ts=clr(state.sq_ts, _NEVER),
        sq_src=clr(state.sq_src, -1),
        sq_tent=clr(state.sq_tent, -1),
        sq_tent_ts=clr(state.sq_tent_ts, _NEVER),
        c_lat=clr(state.c_lat, 0),
        c_lon=clr(state.c_lon, 0),
        c_surf=clr(state.c_surf, False),
        c_ts=clr(state.c_ts, _NEVER),
        c_src=clr(state.c_src, -1),
        c_nic=clr(state.c_nic, 0),
        c_rc=clr(state.c_rc, 0.0),
    )
    return ns, dead


class Arena:
    """Host shell: slot assignment + batch building around the device state."""

    def __init__(
        self,
        n: int = ARENA_SLOTS,
        receiver_lat: float | None = None,
        receiver_lon: float | None = None,
    ):
        self.n = n
        self.state = empty_arena(n)
        self.slot_of: dict[int, int] = {}
        self.free: list[int] = list(range(n - 1, -1, -1))
        # device-decoded global positions, appended per batch:
        # (addr, ts_ms, fflag, lat, lon, nic, rc) — consumers (tests, the
        # app's --device-arena path) drain this list
        self.cpr_decodes: list[tuple] = []
        # fixed surface reference: with a configured receiver location the
        # reference chain (track.c:759-777) always picks it, so surface
        # pairs decode on device too (ops/cpr_device.decode_surface_core)
        self.receiver_lat = receiver_lat
        self.receiver_lon = receiver_lon
        if receiver_lat is not None:
            from ..ops.cpr_device import surface_quadrant_consts

            q = surface_quadrant_consts(receiver_lat)
            self._surf_q = (1, q["zneg"], q["zpos"], q["t0"], q["t1"])
        else:
            self._surf_q = (0, 0, 0, 0, 0)

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
        rows = []
        rank_of: dict[int, int] = {}
        for mm in msgs:
            addr = mm.addr & 0xFFFFFF
            s = self._slot(addr)
            r = rank_of.get(s, 0)
            rank_of[s] = r + 1
            rows.append((s, r, addr, mm))
        rounds = max(rank_of.values())
        rounds = max(1, 1 << (rounds - 1).bit_length())  # pow2: bounded retraces
        m = len(rows)
        mpad = max(256, 1 << (m - 1).bit_length())
        slot = np.full(mpad, -1, np.int32)
        rank = np.zeros(mpad, np.int32)
        icao = np.zeros(mpad, np.int32)
        ts = np.zeros(mpad, np.int32)
        src = np.zeros(mpad, np.int32)
        fmask = np.zeros((mpad, NFIELDS), bool)
        fval = np.zeros((mpad, NFIELDS), np.float32)
        cs_valid = np.zeros(mpad, bool)
        cs = np.zeros((mpad, 2), np.int32)
        alt_valid = np.zeros(mpad, bool)
        alt = np.zeros(mpad, np.int32)
        alt_q = np.zeros(mpad, bool)
        crc0 = np.zeros(mpad, bool)
        sq_valid = np.zeros(mpad, bool)
        sq = np.full(mpad, -2, np.int32)
        cpr_valid = np.zeros(mpad, bool)
        cpr_odd = np.zeros(mpad, bool)
        cpr_surf = np.zeros(mpad, bool)
        cpr_lat = np.zeros(mpad, np.int32)
        cpr_lon = np.zeros(mpad, np.int32)
        cpr_nic = np.zeros(mpad, np.int32)
        cpr_rc = np.zeros(mpad, np.float32)
        for i, (s, r, addr, mm) in enumerate(rows):
            slot[i] = s
            rank[i] = r
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
            av = getattr(mm, "baro_alt", None)
            if av is not None:
                alt_valid[i] = True
                alt[i] = int(av)
                alt_q[i] = bool(getattr(mm, "alt_q_bit", 0))
                crc0[i] = getattr(mm, "crc", 1) == 0
            qv = getattr(mm, "squawk_hex", None)
            if qv is not None:
                sq_valid[i] = True
                sq[i] = int(qv)
            if getattr(mm, "cpr_valid", False):
                from ..decode.fields import CprType
                from .bulk import _NIC_V0, _RC_V0

                cpr_valid[i] = True
                cpr_odd[i] = bool(mm.cpr_odd)
                cpr_surf[i] = mm.cpr_type == CprType.SURFACE
                cpr_lat[i] = int(mm.cpr_lat)
                cpr_lon[i] = int(mm.cpr_lon)
                mt = int(getattr(mm, "metype", 0) or 0)
                nb = 1 if getattr(mm, "nic_b", 0) else 0
                cpr_nic[i] = int(_NIC_V0[mt, nb])
                cpr_rc[i] = float(_RC_V0[mt, nb])
        batch = UpdateBatch(
            slot=jnp.asarray(slot), rank=jnp.asarray(rank),
            icao=jnp.asarray(icao), ts=jnp.asarray(ts),
            src=jnp.asarray(src), fmask=jnp.asarray(fmask), fval=jnp.asarray(fval),
            cs_valid=jnp.asarray(cs_valid), cs=jnp.asarray(cs),
            alt_valid=jnp.asarray(alt_valid), alt=jnp.asarray(alt),
            alt_q=jnp.asarray(alt_q), crc0=jnp.asarray(crc0),
            sq_valid=jnp.asarray(sq_valid), sq=jnp.asarray(sq),
            cpr_valid=jnp.asarray(cpr_valid), cpr_odd=jnp.asarray(cpr_odd),
            cpr_surf=jnp.asarray(cpr_surf), cpr_lat=jnp.asarray(cpr_lat),
            cpr_lon=jnp.asarray(cpr_lon), cpr_nic=jnp.asarray(cpr_nic),
            cpr_rc=jnp.asarray(cpr_rc),
        )
        self.state, cpr_ys = arena_update(self.state, batch, rounds, self._surf_q)
        recs = [
            (r, s, addr, mm) for (s, r, addr, mm) in rows
            if getattr(mm, "cpr_valid", False)
        ]
        if recs:
            self._collect_cpr(
                np.array([r for r, _, _, _ in recs]),
                np.array([s for _, s, _, _ in recs]),
                np.array([a for _, _, a, _ in recs]),
                np.array([mm.sys_timestamp_ms for _, _, _, mm in recs]),
                np.array([bool(mm.cpr_odd) for _, _, _, mm in recs]),
                np.asarray(cpr_ys),
            )

    def update_cols(self, cols: dict) -> None:
        """Columnar batch feed (decode/batch.py columns) — the live-app
        --device-arena path: the drained network batch updates the device
        SoA directly, no per-message objects (VERDICT r5 #5 stage 1)."""
        addrs = np.asarray(cols["addr"], np.int64) & 0xFFFFFF
        m = len(addrs)
        if m == 0:
            return
        slots = np.fromiter((self._slot(int(a)) for a in addrs), np.int64, m)
        order = np.argsort(slots, kind="stable")
        ss = slots[order]
        first = np.searchsorted(ss, ss)
        rank = np.empty(m, np.int64)
        rank[order] = np.arange(m) - first
        rounds = int(rank.max()) + 1
        rounds = max(1, 1 << (rounds - 1).bit_length())
        mpad = max(256, 1 << (m - 1).bit_length())

        def pad(a, fill, dtype):
            out = np.full(mpad, fill, dtype)
            out[:m] = a
            return out

        fmask = np.zeros((mpad, NFIELDS), bool)
        fval = np.zeros((mpad, NFIELDS), np.float32)
        for name, col, vcol in (
            ("gs", "gs", "gs_valid"),
            ("baro_rate", "baro_rate", "baro_rate_valid"),
            ("geom_rate", "geom_rate", "geom_rate_valid"),
        ):
            j = FIELD_IDX[name]
            fmask[:m, j] = cols[vcol]
            fval[:m, j] = np.where(cols[vcol], cols[col], 0).astype(np.float32)

        csb = np.asarray(cols["callsign"], np.uint32)  # (m, 8) chars
        cs = np.zeros((mpad, 2), np.int32)
        cs[:m, 0] = (
            (csb[:, 0] << 24) | (csb[:, 1] << 16) | (csb[:, 2] << 8) | csb[:, 3]
        ).astype(np.int64) - (1 << 31)
        cs[:m, 1] = (
            (csb[:, 4] << 24) | (csb[:, 5] << 16) | (csb[:, 6] << 8) | csb[:, 7]
        ).astype(np.int64) - (1 << 31)

        batch = UpdateBatch(
            slot=jnp.asarray(pad(slots, -1, np.int32)),
            rank=jnp.asarray(pad(rank, 0, np.int32)),
            icao=jnp.asarray(pad(addrs, 0, np.int32)),
            ts=jnp.asarray(pad(cols["ts"], 0, np.int32)),
            src=jnp.asarray(pad(cols["source"], 0, np.int32)),
            fmask=jnp.asarray(fmask), fval=jnp.asarray(fval),
            cs_valid=jnp.asarray(pad(cols["callsign_valid"], False, bool)),
            cs=jnp.asarray(cs),
            alt_valid=jnp.asarray(pad(cols["alt_valid"], False, bool)),
            alt=jnp.asarray(pad(cols["alt"], 0, np.int32)),
            alt_q=jnp.asarray(pad(cols["alt_q"], False, bool)),
            crc0=jnp.asarray(pad(cols["crc_zero"], False, bool)),
            sq_valid=jnp.asarray(pad(cols["squawk_valid"], False, bool)),
            sq=jnp.asarray(pad(np.where(cols["squawk_valid"], cols["squawk"], -2), -2, np.int32)),
            cpr_valid=jnp.asarray(pad(cols["cpr_valid"], False, bool)),
            cpr_odd=jnp.asarray(pad(cols["cpr_odd"], False, bool)),
            cpr_surf=jnp.asarray(pad(cols["cpr_surface"], False, bool)),
            cpr_lat=jnp.asarray(pad(cols["cpr_lat"], 0, np.int32)),
            cpr_lon=jnp.asarray(pad(cols["cpr_lon"], 0, np.int32)),
            cpr_nic=jnp.asarray(pad(
                _NIC_V0_B[cols["metype"], cols["nic_b"]], 0, np.int32)),
            cpr_rc=jnp.asarray(pad(
                _RC_V0_B[cols["metype"], cols["nic_b"]], 0.0, np.float32)),
        )
        self.state, cpr_ys = arena_update(self.state, batch, rounds, self._surf_q)
        cmask = np.asarray(cols["cpr_valid"], bool)
        if cmask.any():
            idx = np.nonzero(cmask)[0]
            self._collect_cpr(
                rank[idx], slots[idx], addrs[idx],
                np.asarray(cols["ts"])[idx],
                np.asarray(cols["cpr_odd"], bool)[idx],
                np.asarray(cpr_ys),
            )

    def _collect_cpr(self, rr, ss, addrs, tss, ffs, ys: np.ndarray) -> None:
        """Convert the scan's per-round device decode records into f64
        positions for the per-message CPR rows (arrays rr=rank, ss=slot,
        addrs, tss=ms, ffs=odd flag), using the reference's exact float
        maps (ops.cpr_device airborne_latlon_f64 / surface_latlon_f64;
        surface rows additionally pass the 450 km reference-distance
        gate, track.c:784-792).  Appends
        (addr, ts_ms, fflag, lat, lon, nic, rc) to self.cpr_decodes."""
        from ..ops.cpr_device import airborne_latlon_f64, surface_latlon_f64
        from .tracker import greatcircle

        if len(rr) == 0:
            return
        rec = ys[rr, ss]  # (m, 12): ok, j, nl, ni, m, pairs, d_nic, d_rc, surf
        ok = rec[:, 0] != 0
        if not ok.any():
            return
        dev = {"j": rec[:, 1], "nl": rec[:, 2], "ni": rec[:, 3], "m": rec[:, 4]}
        lat, lon = airborne_latlon_f64(
            dev, rec[:, 5], rec[:, 6], rec[:, 7], rec[:, 8], ffs
        )
        surf = rec[:, 11] != 0
        if surf.any():
            slat, slon = surface_latlon_f64(
                dev, self.receiver_lat, self.receiver_lon,
                rec[:, 5], rec[:, 6], rec[:, 7], rec[:, 8], ffs,
            )
            lat = np.where(surf, slat, lat)
            lon = np.where(surf, slon, lon)
        rc = rec[:, 10].astype(np.int32).view(np.float32)
        for i in np.nonzero(ok)[0]:
            if surf[i] and greatcircle(
                self.receiver_lat, self.receiver_lon,
                float(lat[i]), float(lon[i]),
            ) > 450e3:
                continue
            self.cpr_decodes.append(
                (int(addrs[i]), int(tss[i]), bool(ffs[i]),
                 float(lat[i]), float(lon[i]),
                 int(rec[i, 9]), float(rc[i]))
            )

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
                ).decode().rstrip("\x00").rstrip()
            if st.alt_src[s] >= 0 and now_ms < st.alt_ts[s] + TRACK_EXPIRE:
                row["baro_alt"] = (int(st.alt[s]), int(st.alt_src[s]))
                row["alt_reliable"] = int(st.alt_rel[s])
            if st.sq_src[s] >= 0:
                row["squawk"] = (
                    int(st.squawk[s]) if st.squawk[s] >= 0 else None,
                    int(st.sq_src[s]),
                )
            if st.sq_tent[s] >= 0:
                row["squawk_tentative"] = int(st.sq_tent[s])
            out[addr] = row
        return out
