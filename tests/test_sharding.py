"""Multi-device sharded demod: halo-exchange correctness on a CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from readsb_tpu.constants import TRAILING_SAMPLES
from readsb_tpu.ops import demod as demod_ops
from readsb_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def cpu_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return pmesh.make_mesh(2, 4)


def _reference_candidates(stream_row: np.ndarray, t_total: int):
    """Unsharded: same scan with a zero halo at the very start."""
    buf = np.concatenate([np.zeros(TRAILING_SAMPLES, np.uint16), stream_row])
    out = demod_ops.demod_block(
        jnp.asarray(buf), 58, k=1024, scan_len=t_total - TRAILING_SAMPLES
    )
    offs = np.asarray(out.offsets)
    return set(offs[offs < t_total - TRAILING_SAMPLES].tolist())


def test_sharded_matches_unsharded(cpu_mesh):
    rng = np.random.default_rng(0)
    n_time = 4
    t_local = 8192
    t_total = t_local * n_time
    stream = rng.integers(0, 2500, size=(2, t_total), dtype=np.uint16)
    # sprinkle a strong synthetic frame across a shard boundary
    from tools.synth import encode_df17_position, frame_envelope

    msg = encode_df17_position(0xABCDEF, 50.0, 9.0, 30000, odd=0)
    env = (frame_envelope(msg, 112, phase=0.0) * 40000).astype(np.uint16)
    # place so the preamble starts just before the boundary between shards 1|2
    start = 2 * t_local - 100  # scan offset in padded stream
    stream[0, start - TRAILING_SAMPLES : start - TRAILING_SAMPLES + len(env)] = env

    fn = pmesh.build_sharded_demod(cpu_mesh, k_per_shard=512, threshold=58)
    x = pmesh.shard_stream(stream, cpu_mesh)
    out = fn(x)

    offs = np.asarray(out.offsets)  # (C, S, K)
    got = set(offs[0][offs[0] >= 0].tolist())

    # unsharded scan of channel 0: offsets land in [0, T - trailing) because
    # the unsharded scan has the halo *prepended*, shifting indices by 326
    buf = np.concatenate([np.zeros(TRAILING_SAMPLES, np.uint16), stream[0]])
    ref_out = demod_ops.demod_block(jnp.asarray(buf), 58, k=4096, scan_len=t_total)
    ref_offs = np.asarray(ref_out.offsets)
    ref = set(ref_offs[ref_offs < t_total].tolist())

    assert got == ref, (len(got), len(ref), got ^ ref)

    # the injected frame's candidate must be present despite the boundary
    # (allow +-2 offsets for the sub-sample phase alignment of the preamble)
    assert any(abs(o - start) <= 2 for o in got), sorted(got)[:10]
