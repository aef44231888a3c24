"""Entropy codec: VLI edge cases, round-trip property, reference bit patterns."""
import numpy as np
import pytest

from mjpeg423_tpu.ops import entropy_ref as ent


def _roundtrip(coeffs, is_p):
    """encode -> decode -> compare.

    For I-frames the decoder returns cumulative DC, so re-derive the encoder
    input convention before comparing.
    """
    coeffs = np.asarray(coeffs, dtype=np.int16)
    bits = ent.encode_plane(coeffs)
    amps = ent.decode_plane(bits, coeffs.shape[0], is_p)
    if is_p:
        return amps, coeffs
    # I-frame: encoder input has DC diffs; decoder output has cumulative DC.
    expect = coeffs.copy()
    with np.errstate(over="ignore"):
        expect[:, 0] = np.cumsum(coeffs[:, 0].astype(np.int64)).astype(np.int16)
    return amps, expect


def test_single_dc_only_block():
    c = np.zeros((1, 64), dtype=np.int16)
    c[0, 0] = 5
    amps, expect = _roundtrip(c, is_p=False)
    np.testing.assert_array_equal(amps, expect)


def test_all_zero_blocks():
    c = np.zeros((3, 64), dtype=np.int16)
    amps, expect = _roundtrip(c, is_p=True)
    np.testing.assert_array_equal(amps, expect)
    # DC=0 is 4 bits, END is 8 bits -> 12 bits/block, 36 bits -> 5 bytes
    assert len(ent.encode_plane(c)) == 5


def test_vli_amplitude_extremes():
    # Every representable size 1..11, both signs, in AC positions
    vals = [1, -1, 3, -3, 7, -7, 15, -15, 31, -31, 63, -63, 127, -127,
            255, -255, 511, -511, 1023, -1023, 2047, -2047]
    c = np.zeros((len(vals), 64), dtype=np.int16)
    for i, v in enumerate(vals):
        c[i, 0] = v % 7  # small DC
        c[i, 1] = v      # natural idx 1 == zigzag idx 1
    amps, expect = _roundtrip(c, is_p=True)
    np.testing.assert_array_equal(amps, expect)


def test_zrl_long_zero_runs():
    # Nonzero at zig-zag positions 0 and 62 only -> needs ZRL x3 + run + END.
    # (Position 63 would trigger the reference's trailing-byte quirk — covered
    # separately by test_final_partial_byte_zeroed_quirk.)
    from mjpeg423_tpu.core.tables import ZIGZAG
    c = np.zeros((1, 64), dtype=np.int16)
    c[0, 0] = 2
    c[0, ZIGZAG[62]] = -9
    amps, expect = _roundtrip(c, is_p=False)
    np.testing.assert_array_equal(amps, expect)


def test_end_omitted_when_last_index_63():
    """Block ending exactly at zig-zag 63 omits END (lossless_encode.c:54)."""
    from mjpeg423_tpu.core.tables import ZIGZAG
    c = np.zeros((2, 64), dtype=np.int16)
    c[0, ZIGZAG[63]] = 1
    c[1, 0] = 1
    bits = ent.encode_plane(c)
    amps = ent.decode_plane(bits, 2, True)
    np.testing.assert_array_equal(amps, c)


def test_dc_cumsum_wraps_int16():
    c = np.zeros((3, 64), dtype=np.int16)
    c[:, 0] = [2000, 2000, 2000]  # encoder diffs: cumulative 2000,4000,6000
    # Build via diff convention: diffs are 2000 each
    amps, expect = _roundtrip(c, is_p=False)
    np.testing.assert_array_equal(amps, expect)


def test_known_bit_pattern_dc():
    """DC=5 -> SIZE=3 (0b0011), AMP=101; then END (00000000).

    Stream: 0011 101 | 0000 0000 -> bytes 0011_1010 0000_000(pad)
    The final partial byte is written as 0x00 per the reference's output_rest
    quirk — the 0 bits of END happen to be zero anyway.
    """
    c = np.zeros((1, 64), dtype=np.int16)
    c[0, 0] = 5
    bits = ent.encode_plane(c)
    assert bits[0] == 0b00111010
    assert bits[1] == 0x00
    assert len(bits) == 2


def test_final_partial_byte_zeroed_quirk():
    """The reference zeroes the final partial byte (output_rest writes the LE
    low byte of the bit buffer).  A block whose last coefficient amplitude
    lands in that byte therefore decodes as a *different* value — we replicate
    this byte-exactly rather than 'fixing' it."""
    from mjpeg423_tpu.core.tables import ZIGZAG
    c = np.zeros((1, 64), dtype=np.int16)
    c[0, 0] = 0
    c[0, ZIGZAG[63]] = 3  # last zigzag position -> no END emitted
    bits = ent.encode_plane(c)
    # total bits: DC(4) + 3x ZRL(8) + run14: RUN=14,SIZE=2,AMP=2 -> 4+24+10 = 38
    assert len(bits) == 5
    assert bits[-1] == 0x00  # partial byte zeroed, amplitude bits lost


def _clear_tail_quirk(c):
    """Zero zig-zag position 63 of the LAST block: if nonzero there, the
    reference's trailing-byte zeroing corrupts it (no END emitted and the
    amplitude may land in the final partial byte) — lossless round-trip is
    only guaranteed otherwise."""
    from mjpeg423_tpu.core.tables import ZIGZAG
    c[-1, ZIGZAG[63]] = 0
    return c


def test_random_roundtrip_p_frames(rng):
    for _ in range(5):
        c = rng.integers(-40, 40, size=(24, 64)).astype(np.int16)
        mask = rng.random((24, 64)) < 0.8
        c[mask] = 0
        amps, expect = _roundtrip(_clear_tail_quirk(c), is_p=True)
        np.testing.assert_array_equal(amps, expect)


def test_random_roundtrip_i_frames(rng):
    for _ in range(5):
        c = rng.integers(-100, 100, size=(16, 64)).astype(np.int16)
        mask = rng.random((16, 64)) < 0.7
        c[mask] = 0
        amps, expect = _roundtrip(_clear_tail_quirk(c), is_p=False)
        np.testing.assert_array_equal(amps, expect)
