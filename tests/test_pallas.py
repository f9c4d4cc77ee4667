"""Pallas kernel parity tests (Mosaic interpreter on CPU; native on TPU).

The Pallas UC8 convert must be bit-exact with the reference 64k LUT
(wiedehopf/readsb convert.c:35-62) — the pipeline switches between the two
by backend, so any deviation would silently break frame parity on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

from readsb_tpu.ops.convert import uc8_lut_np
from readsb_tpu.ops import pallas_kernels as pk


def _interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


def test_uc8_pallas_exhaustive():
    """All 65536 (I, Q) byte pairs match the LUT exactly."""
    lut = uc8_lut_np()
    gran = pk.ROWS_PER_STEP * pk.LANES
    ii, qq = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    pairs = np.stack([ii.ravel(), qq.ravel()], -1).astype(np.uint8)
    reps = -(-gran // 65536)
    iq = np.tile(pairs, (reps, 1))[:gran].reshape(-1)
    out = np.asarray(pk.mag_uc8_pallas(jnp.asarray(iq), interpret=_interpret()))
    ref = lut[(iq[0::2].astype(np.int64) * 256 + iq[1::2])]
    assert (out == ref).all()


def test_dense_scan_matches_jnp_stages():
    """Fused dense-scan kernel == the pure-jnp stage implementations."""
    from readsb_tpu.ops import demod as demod_ops

    n = pk.DENSE_ROWS * pk.LANES  # one tile (interpret mode is slow)
    rng = np.random.default_rng(3)
    mag = rng.integers(0, 65536, n, dtype=np.int64).astype(np.uint16)
    buf = jnp.asarray(mag)
    thr = jnp.int32(58)

    corr, pwords, cs_hi, cs_lo = pk.dense_scan_pallas(
        buf, thr, interpret=_interpret()
    )
    corr_j, pw_j, ch_j, cl_j = demod_ops._dense_stages_jnp(buf, thr)

    valid = n - 128  # kernel lookahead beyond one tile reads zeros
    assert (np.asarray(corr)[:valid - 19] == np.asarray(corr_j)[:valid - 19]).all()
    nw = (valid - 131) // 32
    assert (np.asarray(pwords)[:, :nw] == np.asarray(pw_j)[:, :nw]).all()
    assert (np.asarray(cs_hi) == np.asarray(ch_j)).all()
    assert (np.asarray(cs_lo) == np.asarray(cl_j)).all()


def test_uc8_pallas_matches_jnp_on_noise():
    from readsb_tpu.ops import convert as convert_ops

    gran = pk.ROWS_PER_STEP * pk.LANES
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, gran * 2, dtype=np.int64).astype(np.uint8)
    a = np.asarray(pk.mag_uc8_pallas(jnp.asarray(raw), interpret=_interpret()))
    b = np.asarray(convert_ops.mag_uc8(jnp.asarray(raw)))
    assert (a == b).all()


def test_extract_syndromes_kernel_bit_equality():
    """Fused Pallas extraction == the pure-jnp stage-4/5 chain, bit for bit."""
    import jax.numpy as jnp
    import numpy as np

    from readsb_tpu.constants import TRAILING_SAMPLES
    from readsb_tpu.ops import demod as demod_ops
    from readsb_tpu.ops.pallas_kernels import extract_syndromes_pallas
    from tools.synth import build_standard_capture

    cap = build_standard_capture(duration_s=0.2, n_aircraft=3, seed=13)
    iq = cap.render_iq()
    i8 = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    q8 = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    mag = np.asarray(
        jnp.asarray((i8.astype(np.uint16) << 0), jnp.uint16)
    )  # placeholder, real conversion below
    from readsb_tpu.ops import convert as convert_ops

    raw = np.empty(len(iq) * 2, dtype=np.uint8)
    raw[0::2] = i8
    raw[1::2] = q8
    magj = convert_ops.mag_uc8(jnp.asarray(raw))
    scan_len = (int(magj.shape[0]) - TRAILING_SAMPLES) // 512 * 512
    buf = magj[: scan_len + TRAILING_SAMPLES]

    k = 8192
    bc, cs_hi, cs_lo = demod_ops._demod_core(buf, 58, k=k, scan_len=scan_len, l=64)
    n = int(bc.n_cand)
    assert 0 < n < k

    corrbits, pwords, _, _ = demod_ops._dense_stages_jnp(buf, 58)
    win, nv = demod_ops.win_rows(corrbits, pwords, scan_len)
    rows = win[jnp.clip(bc.offsets >> 8, 0, nv - 1)]
    comb = np.asarray(extract_syndromes_pallas(rows, bc.offsets, interpret=True))

    np.testing.assert_array_equal(comb[:n, 0:5], np.asarray(bc.syn112)[:n])
    np.testing.assert_array_equal(comb[:n, 5:10], np.asarray(bc.syn56)[:n])
    np.testing.assert_array_equal(
        comb[:n, 10:80].reshape(n, 5, 14).astype(np.uint8), np.asarray(bc.msg)[:n]
    )
    valid = np.asarray(bc.offsets)[:n] < scan_len
    np.testing.assert_array_equal(
        (comb[:n, 80:83] != 0) & valid[:, None], np.asarray(bc.corr_fired)[:n]
    )


def test_fused_uc8_dense_scan_bit_equality():
    """Fused convert+dense kernel == convert LUT then dense kernel."""
    import jax.numpy as jnp
    import numpy as np

    from readsb_tpu.ops import convert as convert_ops
    from readsb_tpu.ops.pallas_kernels import (
        DENSE_ROWS, LANES, dense_scan_pallas, dense_scan_uc8_pallas,
    )

    n = DENSE_ROWS * LANES * 2  # two tiles so the halo path runs
    rng = np.random.default_rng(5)
    raw = rng.integers(0, 256, n * 2, dtype=np.int64).astype(np.uint8)
    words = np.frombuffer(raw.tobytes(), dtype="<u2")
    mag = convert_ops.mag_uc8(jnp.asarray(raw))

    a = dense_scan_uc8_pallas(jnp.asarray(words), jnp.int32(58), interpret=True)
    b = dense_scan_pallas(mag, jnp.int32(58), interpret=True)
    # the synthetic final halo row differs (no uc8 word converts to mag 0),
    # so the last <19 positions diverge — they are always masked by
    # scan_len in real use (the stream carries a 326-sample tail)
    np.testing.assert_array_equal(np.asarray(a[0])[: n - 19], np.asarray(b[0])[: n - 19], err_msg="corr")
    np.testing.assert_array_equal(
        np.asarray(a[1])[:, : n // 32 - 1], np.asarray(b[1])[:, : n // 32 - 1],
        err_msg="pwords",
    )
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]), err_msg="cs_hi")
    np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]), err_msg="cs_lo")


def test_extract_classify_v2_bit_equality():
    """v2 selection-matmul kernel == v1 kernel outputs; fused classifier
    flags == the jnp score_gate membership formulas, bit for bit."""
    from readsb_tpu.constants import TRAILING_SAMPLES
    from readsb_tpu.ops import convert as convert_ops
    from readsb_tpu.ops import demod as demod_ops
    from readsb_tpu.ops.gate import (
        TBL_SENTINEL,
        _DF17_FIXABLE,
        _df_delta_np,
        _table_syndromes_np,
    )
    from readsb_tpu.ops.pallas_kernels import (
        EX2_ROWS,
        extract_classify_pallas,
        extract_classify_v3_pallas,
    )
    from tools.synth import build_standard_capture

    cap = build_standard_capture(duration_s=0.2, n_aircraft=3, seed=13)
    iq = cap.render_iq()
    i8 = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    q8 = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    raw = np.empty(len(iq) * 2, dtype=np.uint8)
    raw[0::2] = i8
    raw[1::2] = q8
    magj = convert_ops.mag_uc8(jnp.asarray(raw))
    scan_len = (int(magj.shape[0]) - TRAILING_SAMPLES) // 512 * 512
    buf = magj[: scan_len + TRAILING_SAMPLES]

    k = 8192
    assert k % EX2_ROWS == 0
    bc, cs_hi, cs_lo = demod_ops._demod_core(buf, 58, k=k, scan_len=scan_len, l=64)
    n = int(bc.n_cand)
    assert 0 < n < k

    corrbits, pwords, _, _ = demod_ops._dense_stages_jnp(buf, 58)
    win, nv = demod_ops.win_rows(corrbits, pwords, scan_len)
    rows = win[jnp.clip(bc.offsets >> 8, 0, nv - 1)]

    # known table with a few addresses that occur as residuals + padding
    tbl_np = np.full(256, TBL_SENTINEL, np.int32)
    tbl_np[:3] = [0x400000, 0x401111, 0x402222]
    tbl = jnp.asarray(tbl_np)

    for (nfix, fix_df), kern in (
        ((1, True), extract_classify_pallas),
        ((0, False), extract_classify_pallas),
        ((1, True), extract_classify_v3_pallas),
        ((0, False), extract_classify_v3_pallas),
    ):
        comb = np.asarray(
            kern(
                rows, bc.offsets, tbl, nfix=nfix, fix_df=fix_df, interpret=True
            )
        )
        np.testing.assert_array_equal(comb[:n, 0:5], np.asarray(bc.syn112)[:n])
        np.testing.assert_array_equal(comb[:n, 5:10], np.asarray(bc.syn56)[:n])
        np.testing.assert_array_equal(
            comb[:n, 10:80].reshape(n, 5, 14).astype(np.uint8),
            np.asarray(bc.msg)[:n],
        )
        valid = np.asarray(bc.offsets)[:n] < scan_len
        np.testing.assert_array_equal(
            (comb[:n, 80:83] != 0) & valid[:, None],
            np.asarray(bc.corr_fired)[:n],
        )

        # jnp reference classification (score_gate formulas)
        msg = np.asarray(bc.msg)[:n].astype(np.int64)
        syn112 = np.asarray(bc.syn112)[:n]
        syn56 = np.asarray(bc.syn56)[:n]
        df = msg[:, :, 0] >> 3
        zero7 = msg[:, :, :7].sum(axis=2) == 0
        if nfix > 0:
            t112 = _table_syndromes_np(112, nfix)
            t56 = _table_syndromes_np(56, nfix)
            in_t112 = np.isin(syn112, t112)
            in_t56 = np.isin(syn56, t56)
        else:
            in_t112 = np.zeros_like(syn112, bool)
            in_t56 = np.zeros_like(syn56, bool)
        fix_ok = np.zeros_like(df, bool)
        if fix_df and nfix > 0:
            deltas = _df_delta_np()
            for d in _DF17_FIXABLE:
                fix_ok |= (df == d) & (syn112 == int(deltas[d]))
        residual = np.where(df >= 16, syn112, syn56) & 0xFFFFFF
        in_tbl = np.isin(residual, tbl_np[:3])

        fl = comb[:n, 83:88]
        np.testing.assert_array_equal((fl & 1) != 0, in_t112)
        np.testing.assert_array_equal((fl & 2) != 0, in_t56)
        np.testing.assert_array_equal((fl & 4) != 0, in_tbl)
        np.testing.assert_array_equal((fl & 8) != 0, fix_ok)
        np.testing.assert_array_equal((fl & 16) != 0, zero7)
        # at least some flags must actually fire on a real capture
        if nfix == 1:
            assert (fl & 4).any() or (fl & 1).any()


def test_score_gate_flags_path_equivalence():
    """score_gate fed kernel flags == score_gate computing memberships."""
    from readsb_tpu.constants import TRAILING_SAMPLES
    from readsb_tpu.ops import convert as convert_ops
    from readsb_tpu.ops import demod as demod_ops
    from readsb_tpu.ops.gate import TBL_SENTINEL, score_gate
    from readsb_tpu.ops.pallas_kernels import extract_classify_pallas
    from tools.synth import build_standard_capture

    cap = build_standard_capture(duration_s=0.2, n_aircraft=3, seed=21)
    iq = cap.render_iq()
    i8 = np.clip(np.round(iq.real * 127.5 + 127.5), 0, 255).astype(np.uint8)
    q8 = np.clip(np.round(iq.imag * 127.5 + 127.5), 0, 255).astype(np.uint8)
    raw = np.empty(len(iq) * 2, dtype=np.uint8)
    raw[0::2] = i8
    raw[1::2] = q8
    magj = convert_ops.mag_uc8(jnp.asarray(raw))
    scan_len = (int(magj.shape[0]) - TRAILING_SAMPLES) // 512 * 512
    buf = magj[: scan_len + TRAILING_SAMPLES]

    k = 8192
    bc, cs_hi, cs_lo = demod_ops._demod_core(buf, 58, k=k, scan_len=scan_len, l=64)

    tbl_np = np.full(256, TBL_SENTINEL, np.int32)
    tbl_np[:2] = [0x400000, 0x401111]
    tbl = jnp.asarray(tbl_np)

    corrbits, pwords, _, _ = demod_ops._dense_stages_jnp(buf, 58)
    win, nv = demod_ops.win_rows(corrbits, pwords, scan_len)
    rows = win[jnp.clip(bc.offsets >> 8, 0, nv - 1)]
    comb = extract_classify_pallas(rows, bc.offsets, tbl, interpret=True)
    bc_fl = bc._replace(flags=comb[:, 83:88])

    kw = dict(scan_len=scan_len, k2=1024, nfix=1, fix_df=True,
              reset_every=131072)
    g0 = score_gate(bc, tbl, cs_hi, cs_lo, scan_len, **kw)
    g1 = score_gate(bc_fl, tbl, cs_hi, cs_lo, scan_len, **kw)
    for f in g0._fields:
        a, b = getattr(g0, f), getattr(g1, f)
        if a is None or b is None:
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f)
    assert int(g0.n_keep) > 0
