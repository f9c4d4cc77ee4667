"""Multi-host DCN dry-run: the demod pipeline sharded across two
jax.distributed processes (SURVEY §2.5 DCN row; BASELINE v5e-16 config).

Layout: virtual receiver channels are sharded across HOSTS (the DCN
axis) and time-blocks across each host's local devices (the ICI axis),
so the 326-sample overlap-save halo (lax.ppermute) always rides
intra-host links; cross-host traffic is only the embarrassingly parallel
channel partition — exactly how a v5e-16 deployment splits 512 channels
over 4 hosts.

Each process asserts frame-set equality between its addressable channel
shards and an unsharded local reference decode; the launcher requires
both ranks to succeed, proving cross-host correctness.

Run (single command, spawns rank 1 itself):
    python tools/dcn_dryrun.py
Or explicitly per rank:
    python tools/dcn_dryrun.py --rank 0 &  python tools/dcn_dryrun.py --rank 1
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
COORD = "127.0.0.1:39731"


def launcher() -> int:
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--rank", str(r)],
            cwd=REPO,
        )
        for r in range(N_PROC)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        print(f"dcn_dryrun FAILED: ranks exited {rcs}", file=sys.stderr)
        return 1
    print(f"dcn_dryrun OK: {N_PROC} hosts x {DEV_PER_PROC} devices")
    return 0


def worker(rank: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=N_PROC, process_id=rank
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from readsb_tpu.constants import TRAILING_SAMPLES
    from readsb_tpu.ops import demod as demod_ops
    from readsb_tpu.parallel import mesh as pmesh
    from tools.synth import encode_df17_position, frame_envelope

    # channels across hosts (DCN), time within host (ICI): jax.devices()
    # orders devices process-major, so reshaping (chan, time) with
    # chan = N_PROC * chans_per_host puts each host's devices in its own
    # chan rows
    chan_per_host = 2
    n_chan_shards = N_PROC * chan_per_host  # device-mesh channel axis
    n_time = DEV_PER_PROC // chan_per_host
    mesh = pmesh.make_mesh(n_chan_shards, n_time)

    t_local = 8192
    total_t = t_local * n_time
    n_channels = n_chan_shards  # one channel row per chan shard

    # deterministic global stream; every rank builds the same array and
    # contributes its host-local channel rows
    rng = np.random.default_rng(7)
    stream = rng.integers(0, 3000, size=(n_channels, total_t), dtype=np.uint16)

    def place(row, start, addr, odd):
        msg = encode_df17_position(addr, 51.0, 6.0, 32000, odd=odd)
        env = (frame_envelope(msg, 112, phase=0.0) * 38000).astype(np.uint16)
        row[start : start + len(env)] = env

    for ch in range(n_channels):
        place(stream[ch], 1000 + 37 * ch, 0xB00000 + ch, 0)
        # one frame straddling a time-shard boundary per channel
        place(stream[ch], t_local - 80, 0xB00000 + ch, 1)

    # host-local rows -> global sharded array over the full mesh
    rows_per_host = n_channels // N_PROC
    local = stream[rank * rows_per_host : (rank + 1) * rows_per_host]
    x = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("chan", None)
    )

    fn = pmesh.build_sharded_demod(mesh, k_per_shard=512, threshold=58)
    out = fn(x)
    jax.block_until_ready(out)

    # frame equality on this host's addressable channels
    from readsb_tpu.decode.score import Scorer, finalize_block

    def frames_of(offs, cf, msg, s112, s56, sl, ss, scan_len):
        sc = Scorer()
        fr, _ = finalize_block(
            sc, offs, len(offs), cf, msg, s112, s56, sl, ss, scan_len=scan_len
        )
        return [(f.msg.hex(), f.scan_offset) for f in fr]

    def sigsum(a):
        s = np.asarray(a, dtype=np.int64)
        return ((s[:, 0] << 16) + s[:, 1]).astype(np.float64)

    def local_rows(arr):
        """Collect this host's addressable (chan, time) shard data."""
        shards = {}
        for sh in arr.addressable_shards:
            c0 = sh.index[0].start or 0
            t0 = sh.index[1].start or 0
            shards[(c0, t0)] = np.asarray(sh.data)
        return shards

    cols = [
        out.offsets, out.corr_fired, out.msg, out.syn112, out.syn56,
        out.sig_long, out.sig_short,
    ]
    shard_maps = [local_rows(a) for a in cols]
    my_chans = sorted({c for c, _ in shard_maps[0]})
    checked = 0
    for c0 in my_chans:
        parts = []
        for t0 in sorted({t for cc, t in shard_maps[0] if cc == c0}):
            offs = shard_maps[0][(c0, t0)][0, 0]
            keep = offs >= 0
            row = [offs[keep]]
            for smap in shard_maps[1:5]:
                row.append(smap[(c0, t0)][0, 0][keep])
            row.append(sigsum(shard_maps[5][(c0, t0)][0, 0][keep]))
            row.append(sigsum(shard_maps[6][(c0, t0)][0, 0][keep]))
            parts.append(row)
        merged = [np.concatenate([p[i] for p in parts]) for i in range(7)]
        got = frames_of(*merged, scan_len=total_t)

        ch = c0  # one channel per chan shard row
        buf = np.concatenate([np.zeros(TRAILING_SAMPLES, np.uint16), stream[ch]])
        ref = demod_ops.demod_block(jnp.asarray(buf), 58, k=4096, scan_len=total_t)
        roffs = np.asarray(ref.offsets)
        rkeep = roffs < total_t
        want = frames_of(
            roffs[rkeep],
            np.asarray(ref.corr_fired)[rkeep],
            np.asarray(ref.msg)[rkeep],
            np.asarray(ref.syn112)[rkeep],
            np.asarray(ref.syn56)[rkeep],
            sigsum(np.asarray(ref.sig_long)[rkeep]),
            sigsum(np.asarray(ref.sig_short)[rkeep]),
            scan_len=total_t,
        )
        assert got == want, (rank, ch, got, want)
        assert len(got) >= 2, (rank, ch, "boundary frame must decode")
        checked += 1

    multihost_utils.sync_global_devices("dcn_dryrun_done")
    print(
        f"rank {rank}: {checked} host-local channels frame-equal "
        f"(mesh chan={n_chan_shards} over {N_PROC} hosts x time={n_time})",
        flush=True,
    )


if __name__ == "__main__":
    if "--rank" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--rank") + 1]))
    else:
        sys.exit(launcher())
