"""CRC-24 unit tests: scalar vs GF(2) matrix form vs error tables."""

import numpy as np

from readsb_tpu.ops import crc


def _rand_msgs(n, nbytes, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, nbytes), dtype=np.uint8)


def test_checksum_of_valid_frame_is_zero():
    from tools.synth import encode_df17_position, encode_df11

    msg = encode_df17_position(0x4840D6, 52.25, 3.92, 38000, odd=0)
    assert crc.checksum(msg, 112) == 0
    msg = encode_df11(0xA1B2C3)
    assert crc.checksum(msg, 56) == 0


def test_syndrome_matrix_matches_bytewise():
    for bits in (56, 112):
        msgs = _rand_msgs(64, bits // 8, seed=bits)
        ref = crc.checksum_batch(msgs, bits)
        m = crc.syndrome_matrix(bits)
        bits_arr = np.unpackbits(msgs, axis=1)[:, :bits]
        syn_bits = (bits_arr.astype(np.int64) @ m.astype(np.int64)) & 1
        w = 1 << np.arange(23, -1, -1)
        syn = (syn_bits * w).sum(axis=1).astype(np.uint32)
        np.testing.assert_array_equal(syn, ref)


def test_single_bit_error_diagnosis_roundtrip():
    for bits in (56, 112):
        table = crc.error_table(bits, 1)
        msgs = _rand_msgs(8, bits // 8, seed=3)
        for msg in msgs:
            # make message CRC-clean first
            syn = crc.checksum(msg, bits)
            clean = msg.copy()
            clean[-3] ^= (syn >> 16) & 0xFF
            clean[-2] ^= (syn >> 8) & 0xFF
            clean[-1] ^= syn & 0xFF
            assert crc.checksum(clean, bits) == 0
            for bit in (5, 17, bits - 1):
                bad = crc.fix_message(clean, bit)  # flip one bit
                s = crc.checksum(bad, bits)
                nerr, b0, b1 = table.diagnose(np.uint32(s))
                assert int(nerr) == 1
                assert int(b0) == bit
                fixed = crc.fix_message(bad, int(b0))
                assert crc.checksum(fixed, bits) == 0


def test_error_table_excludes_df_bits():
    # bits 0..4 (the DF field) must not be correctable
    table = crc.error_table(112, 1)
    syn = crc.single_bit_syndromes(112)
    for bit in range(5):
        nerr, b0, b1 = table.diagnose(np.uint32(syn[bit]))
        assert int(nerr) == -1


def test_two_bit_table():
    table = crc.error_table(112, 2)
    msg = np.zeros(14, dtype=np.uint8)
    bad = crc.fix_message(crc.fix_message(msg, 10), 57)
    s = crc.checksum(bad, 112)
    nerr, b0, b1 = table.diagnose(np.uint32(s))
    assert int(nerr) == 2
    assert {int(b0), int(b1)} == {10, 57}


def test_correct_aa_field():
    addr = 0xABCDEF
    assert crc.correct_aa_field(addr, 31) == addr ^ 1
    assert crc.correct_aa_field(addr, 8) == addr ^ (1 << 23)
    assert crc.correct_aa_field(addr, 50) == addr  # outside AA
    assert crc.correct_aa_field(addr, 2) == addr  # DF field
