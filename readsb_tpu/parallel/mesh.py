"""Multi-chip sharding of the demod pipeline.

The sample stream is embarrassingly parallel given a 326-sample halo
(SURVEY §2.5): a Mode-S frame spans <= 288 samples, so time-blocks are
independent once each shard receives the previous shard's tail.  This is
the overlap-save pattern — the same ring communication as ring attention,
but with a constant 326-sample payload, done with `lax.ppermute` over the
`time` mesh axis.  Virtual receiver channels form a second, fully
independent `chan` axis.

Layout:
  mesh axes ("chan", "time")
  stream: (C, T) magnitudes, sharded P("chan", "time")
  each shard scans its local T/t samples; left halo arrives by ppermute
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import TRAILING_SAMPLES
from ..ops import demod as demod_ops


class ShardedCandidates(NamedTuple):
    """Per-shard candidate tensors; global scan offset = local + shard base."""

    offsets: jax.Array  # int32[C, S, K] global scan offsets
    n_cand: jax.Array  # int32[C, S]
    max_local: jax.Array  # int32[C, S] compaction capacity watermark
    corr_fired: jax.Array  # bool[C, S, K, 3]
    msg: jax.Array  # uint8[C, S, K, 5, 14]
    syn112: jax.Array  # int32[C, S, K, 5]
    syn56: jax.Array  # int32[C, S, K, 5]
    sig_long: jax.Array  # int32[C, S, K, 2] exact (hi, lo) split mag^2 sums
    sig_short: jax.Array  # int32[C, S, K, 2]


def make_mesh(n_chan: int, n_time: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_chan * n_time, (devices.size, n_chan, n_time)
    grid = devices[: n_chan * n_time].reshape(n_chan, n_time)
    return Mesh(grid, axis_names=("chan", "time"))


def build_sharded_demod(mesh: Mesh, *, k_per_shard: int = 256, threshold: int = 58):
    """Returns a jitted fn: (C, T) uint16 magnitudes -> ShardedCandidates.

    T must divide evenly by the `time` axis size; each local shard of
    length Tl scans offsets [0, Tl) of its padded buffer, with the halo
    (previous shard's last TRAILING_SAMPLES magnitudes) exchanged over ICI
    by ppermute.  The very first shard sees zeros, matching the stream
    start semantics of the block pipeline.
    """
    n_time = mesh.shape["time"]

    def local_demod(stream_local: jax.Array) -> ShardedCandidates:
        # stream_local: (C_local, 1, T_local) — one (chan, time) shard
        c_l, s_l, t_l = stream_local.shape
        x = stream_local.reshape(c_l, t_l)

        # halo: my last TRAILING samples -> right neighbor's front padding
        tail = x[:, -TRAILING_SAMPLES:]
        perm = [(i, i + 1) for i in range(n_time - 1)]
        halo = jax.lax.ppermute(tail, "time", perm)  # shard 0 receives zeros

        buf = jnp.concatenate([halo, x], axis=1)  # (C_local, T_local + 326)

        cand = jax.vmap(
            lambda b: demod_ops.demod_block(b, threshold, k=k_per_shard, scan_len=t_l)
        )(buf)

        t_idx = jax.lax.axis_index("time").astype(jnp.int32)
        base = t_idx * t_l
        offsets = jnp.where(cand.offsets < t_l, cand.offsets + base, jnp.int32(-1))

        def ex(a):  # add the time-shard axis back for out_specs
            return a[:, None]

        return ShardedCandidates(
            offsets=ex(offsets),
            n_cand=ex(cand.n_cand.reshape(c_l)) if cand.n_cand.ndim else ex(jnp.broadcast_to(cand.n_cand, (c_l,))),
            max_local=ex(cand.max_local.reshape(c_l)) if cand.max_local.ndim else ex(jnp.broadcast_to(cand.max_local, (c_l,))),
            corr_fired=ex(cand.corr_fired),
            msg=ex(cand.msg),
            syn112=ex(cand.syn112),
            syn56=ex(cand.syn56),
            sig_long=ex(cand.sig_long),
            sig_short=ex(cand.sig_short),
        )

    shard_fn = jax.shard_map(
        local_demod,
        mesh=mesh,
        in_specs=P("chan", None, "time"),
        out_specs=ShardedCandidates(
            offsets=P("chan", "time"),
            n_cand=P("chan", "time"),
            max_local=P("chan", "time"),
            corr_fired=P("chan", "time"),
            msg=P("chan", "time"),
            syn112=P("chan", "time"),
            syn56=P("chan", "time"),
            sig_long=P("chan", "time"),
            sig_short=P("chan", "time"),
        ),
    )

    @jax.jit
    def sharded_demod(stream: jax.Array) -> ShardedCandidates:
        # stream: (C, T) -> add a singleton axis so time sharding has a dim
        return shard_fn(stream[:, None, :])

    return sharded_demod


def shard_stream(stream: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a (C, T) magnitude array with the (chan, time) sharding."""
    sharding = NamedSharding(mesh, P("chan", "time"))
    return jax.device_put(stream, sharding)


def build_sharded_gated_demod(
    mesh: Mesh,
    *,
    k_per_shard: int = 512,
    threshold: int = 58,
    k2: int = 256,
    keep_l: int = 32,
    nfix: int = 1,
    fix_df: bool = True,
):
    """The PRODUCTION gated program under shard_map: per-shard fused
    dense-scan/extract (Pallas; Mosaic interpreter on the CPU dryrun via
    ops.pallas_kernels.INTERPRET) + device score gate, with the
    326-sample halo exchanged over ICI by ppermute.  Returns a jitted
    fn: ((C, T) uint16 magnitudes, known_tbl int32[T128]) -> per-shard
    GatedCandidates subset with GLOBAL offsets (sentinel -1).
    """
    from ..ops.gate import score_gate

    n_time = mesh.shape["time"]

    class ShardedGated(NamedTuple):
        offsets: jax.Array  # int32[C, S, K2] global (sentinel -1)
        n_cand: jax.Array  # int32[C, S]
        n_keep: jax.Array  # int32[C, S]
        pre_drop: jax.Array  # int32[C, S]
        corr_fired: jax.Array  # bool[C, S, K2, 3]
        msg: jax.Array  # uint8[C, S, K2, 5, 14]
        syn112: jax.Array  # int32[C, S, K2, 5]
        syn56: jax.Array  # int32[C, S, K2, 5]
        sig_long: jax.Array  # int32[C, S, K2, 2]
        sig_short: jax.Array  # int32[C, S, K2, 2]

    def local_demod(stream_local: jax.Array, tbl: jax.Array) -> ShardedGated:
        c_l, s_l, t_l = stream_local.shape
        x = stream_local.reshape(c_l, t_l)
        tail = x[:, -TRAILING_SAMPLES:]
        perm = [(i, i + 1) for i in range(n_time - 1)]
        halo = jax.lax.ppermute(tail, "time", perm)
        buf = jnp.concatenate([halo, x], axis=1)

        def one(b):
            bc, cs_hi, cs_lo = demod_ops._demod_core(
                b, threshold, k=k_per_shard, scan_len=t_l, l=64,
                known_tbl=tbl, nfix=nfix, fix_df=fix_df,
            )
            return score_gate(
                bc, tbl, cs_hi, cs_lo, t_l, scan_len=t_l, k2=k2,
                nfix=nfix, fix_df=fix_df, keep_l=keep_l,
            )

        gc = jax.vmap(one)(buf)
        t_idx = jax.lax.axis_index("time").astype(jnp.int32)
        base = t_idx * t_l
        offsets = jnp.where(gc.offsets < t_l, gc.offsets + base, jnp.int32(-1))

        def ex(a):
            return a[:, None]

        return ShardedGated(
            offsets=ex(offsets), n_cand=ex(gc.n_cand), n_keep=ex(gc.n_keep),
            pre_drop=ex(gc.pre_drop), corr_fired=ex(gc.corr_fired),
            msg=ex(gc.msg), syn112=ex(gc.syn112), syn56=ex(gc.syn56),
            sig_long=ex(gc.sig_long), sig_short=ex(gc.sig_short),
        )

    shard_fn = jax.shard_map(
        local_demod,
        mesh=mesh,
        in_specs=(P("chan", None, "time"), P()),
        out_specs=ShardedGated(
            offsets=P("chan", "time"), n_cand=P("chan", "time"),
            n_keep=P("chan", "time"), pre_drop=P("chan", "time"),
            corr_fired=P("chan", "time"), msg=P("chan", "time"),
            syn112=P("chan", "time"), syn56=P("chan", "time"),
            sig_long=P("chan", "time"), sig_short=P("chan", "time"),
        ),
        # pallas_call outputs don't carry varying-mesh-axes metadata yet
        check_vma=False,
    )

    @jax.jit
    def sharded_gated(stream: jax.Array, tbl: jax.Array):
        return shard_fn(stream[:, None, :], tbl)

    return sharded_gated
