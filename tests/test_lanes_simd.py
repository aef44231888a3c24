"""SIMD 8-lane batch decoder vs the scalar plane decoder.

mj423_decode_batch routes full groups of 8 plane items through the
AVX-512 lanes kernel (centropy.c mj_decode_lanes8) when the host ISA
allows; these tests pin the fast path to the scalar decoder bit-for-bit
across the conditions that distinguish the two implementations:

- mixed I/P lanes inside one group (per-lane DC-chain masks);
- blocks completing in adjacent steps (double-buffered staging parity —
  a toggle-addressing bug here once wrote a lane's odd blocks into its
  neighbor, caught only when OpenMP stack bases shifted: the kernel's
  staging alignment comment is load-bearing);
- ZRL runs, early index-63 termination, and EOB-only blocks;
- truncated streams (the per-lane gather clamp must reproduce the
  scalar reader's zero-pad-past-end semantics);
- corrupt streams (the group falls back to scalar re-decode so the
  error index and partial output match the scalar path exactly);
- streams shorter than 8 bytes (group-level scalar fallback guard).

Reference semantics: lossless_decode.c:101-133 (the loop the FPGA
design gave two whole CPUs).
"""
from __future__ import annotations

import numpy as np
import pytest

from mjpeg423_tpu.native import centropy
from mjpeg423_tpu.ops import entropy_ref

pytestmark = pytest.mark.skipif(
    not centropy.native_available(), reason="native codec unavailable"
)


def _batch_inputs(blobs):
    data = b"".join(blobs)
    lengths = np.array([len(b) for b in blobs], dtype=np.uint64)
    offsets = np.zeros(len(blobs), dtype=np.uint64)
    offsets[1:] = np.cumsum(lengths)[:-1]
    return data, offsets, lengths


def _content(rng, num_blocks, style):
    c = np.zeros((num_blocks, 64), dtype=np.int16)
    if style == "dense":
        c[:, :8] = rng.integers(-64, 64, size=(num_blocks, 8))
        hi = rng.integers(-8, 8, size=(num_blocks, 56))
        mask = rng.random((num_blocks, 56)) < 0.15
        c[:, 8:] = np.where(mask, hi, 0)
    elif style == "zrl":
        # long zero runs force ZRL symbols and index arithmetic edges
        pos = rng.integers(0, 64, size=num_blocks)
        for b, p in enumerate(pos):
            c[b, p] = rng.integers(1, 200)
        c[:, 63] = np.where(rng.random(num_blocks) < 0.5, 7, c[:, 63])
    elif style == "eob":
        pass  # all-zero blocks: DC 0 + immediate EOB, 2-symbol blocks
    elif style == "full":
        # every block terminates via index==63, never via EOB
        c[:] = rng.integers(-100, 100, size=(num_blocks, 64))
        c[c == 0] = 1
    elif style == "bigamp":
        c[:, :4] = rng.integers(-2000, 2000, size=(num_blocks, 4))
        c[:, 63] = rng.integers(-1800, 1800, size=num_blocks)
    return c


@pytest.mark.parametrize("style", ["dense", "zrl", "eob", "full", "bigamp"])
def test_lanes_groups_match_scalar(style):
    rng = np.random.default_rng(hash(style) % 2**31)
    nb = 40
    n_items = 19  # 2 SIMD groups + 3 scalar remainder items
    planes = [_content(rng, nb, style) for _ in range(n_items)]
    blobs = [centropy.encode_plane(c) for c in planes]
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = (np.arange(n_items) % 3 != 0).astype(np.uint8)  # I/P mix
    out = centropy.decode_batch(data, offsets, lengths, is_p, nb)
    for i in range(n_items):
        exp = entropy_ref.decode_plane(blobs[i], nb, bool(is_p[i]))
        np.testing.assert_array_equal(out[i], exp, err_msg=f"item {i}")


def test_lanes_truncated_streams_zero_extend():
    """Cutting a stream mid-block must decode like the scalar reader
    (zero bits past the end), not like reading the next lane's bytes."""
    rng = np.random.default_rng(11)
    nb = 24
    planes = [_content(rng, nb, "dense") for _ in range(8)]
    blobs = [bytearray(centropy.encode_plane(c)) for c in planes]
    # truncate lanes 2 and 5 (keep >= 8 bytes so the SIMD path engages)
    blobs[2] = blobs[2][: max(8, len(blobs[2]) // 2)]
    blobs[5] = blobs[5][: max(8, len(blobs[5]) // 3)]
    blobs = [bytes(b) for b in blobs]
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = np.ones(8, np.uint8)
    out = centropy.decode_batch(data, offsets, lengths, is_p, nb)
    for i in range(8):
        exp = centropy.decode_plane(blobs[i], nb, True)
        np.testing.assert_array_equal(out[i], exp, err_msg=f"item {i}")


def test_lanes_short_streams_fall_back():
    """Streams under 8 bytes can't be gather-clamped; the group must
    fall back to scalar and still decode exactly."""
    nb = 3
    blobs = [centropy.encode_plane(np.zeros((nb, 64), np.int16))
             for _ in range(8)]
    assert any(len(b) < 8 for b in blobs)
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = np.zeros(8, np.uint8)
    out = centropy.decode_batch(data, offsets, lengths, is_p, nb)
    for i in range(8):
        np.testing.assert_array_equal(
            out[i], np.zeros((nb, 64), np.int16), err_msg=f"item {i}"
        )


def test_lanes_corrupt_group_error_matches_scalar():
    """A corrupt stream in a SIMD group must surface the same smallest
    failing index the scalar path reports."""
    rng = np.random.default_rng(7)
    nb = 16
    planes = [_content(rng, nb, "dense") for _ in range(8)]
    blobs = [centropy.encode_plane(c) for c in planes]
    blobs[3] = b"\xff" * len(blobs[3])  # run=15,size=15 overruns zig-zag
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = np.ones(8, np.uint8)
    with pytest.raises(ValueError, match="item 3"):
        centropy.decode_batch(data, offsets, lengths, is_p, nb)


def test_lanes_consecutive_block_completions():
    """2-symbol blocks complete on consecutive steps — the hardest case
    for the deferred double-buffered flush (parity churn every step)."""
    rng = np.random.default_rng(23)
    nb = 257  # odd count exercises both staging parities at the drain
    planes = []
    for _ in range(9):
        c = np.zeros((nb, 64), np.int16)
        c[:, 0] = rng.integers(-100, 100, size=nb)  # DC-only blocks
        planes.append(c)
    blobs = [centropy.encode_plane(c) for c in planes]
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = np.zeros(9, np.uint8)  # all-I: DC chains through every lane
    out = centropy.decode_batch(data, offsets, lengths, is_p, nb)
    for i in range(9):
        exp = entropy_ref.decode_plane(blobs[i], nb, False)
        np.testing.assert_array_equal(out[i], exp, err_msg=f"item {i}")


def test_lanes_randomized_parity_with_scalar():
    """Seeded randomized sweep: shapes, densities, I/P mixes."""
    rng = np.random.default_rng(0xC0FFEE)
    for trial in range(6):
        nb = int(rng.integers(1, 120))
        n_items = int(rng.integers(8, 20))
        density = float(rng.uniform(0.0, 0.9))
        planes = []
        for _ in range(n_items):
            c = np.where(
                rng.random((nb, 64)) < density,
                rng.integers(-300, 300, size=(nb, 64)),
                0,
            ).astype(np.int16)
            planes.append(c)
        blobs = [centropy.encode_plane(c) for c in planes]
        data, offsets, lengths = _batch_inputs(blobs)
        is_p = rng.integers(0, 2, size=n_items).astype(np.uint8)
        out = centropy.decode_batch(data, offsets, lengths, is_p, nb)
        for i in range(n_items):
            exp = entropy_ref.decode_plane(blobs[i], nb, bool(is_p[i]))
            np.testing.assert_array_equal(
                out[i], exp, err_msg=f"trial {trial} item {i} nb={nb}"
            )


def _pack_bits(symbols):
    """MSB-first bit packer for hand-built pathological streams.

    symbols: list of (value, nbits)."""
    acc = 0
    n = 0
    out = bytearray()
    for v, k in symbols:
        acc = (acc << k) | (v & ((1 << k) - 1))
        n += k
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def test_lanes_eob_at_transient_index_64():
    """A ZRL may land exactly on index 64 (the scalar decoder's bound is
    `index > 64`), and an EOB there must NOT store: the lanes kernel once
    wrapped its unconditional zero store through vpermb onto
    ZZ[(index+run) & 63] == position 0 and clobbered the block's DC
    (found by scripts/fuzz_native.py on a corrupt container)."""
    # Block: DC=5 (size 3), coef run=14 -> index 15 (amp 3, size 2),
    # then ZRL x3 (index 16 -> 32 -> 48 -> 64), then EOB (rs=0x00).
    block = [
        (0b011, 4), (0b101, 3),          # DC size=3, VLI 101 -> +5
        (0xE2, 8), (0b11, 2),            # run=14 size=2, VLI 11 -> +3
        (0xF0, 8), (0xF0, 8), (0xF0, 8),  # ZRLs: 16 -> 64
        (0x00, 8),                        # EOB with index == 64
    ]
    # A second, ordinary block so the stream has structure after the edge.
    block2 = [(0b0000, 4), (0x00, 8)]     # DC 0, EOB
    bits = _pack_bits(block + block2)
    bits += b"\x00" * 8  # slack so the 8-byte-minimum SIMD guard engages
    nb = 2
    exp = centropy.decode_plane(bits, nb, True)
    assert exp[0, 0] == 5, "scalar decode sanity (DC survives)"
    blobs = [bits] * 8
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = np.ones(8, np.uint8)
    out = centropy.decode_batch(data, offsets, lengths, is_p, nb)
    for i in range(8):
        np.testing.assert_array_equal(out[i], exp, err_msg=f"item {i}")


def test_lanes_cm_groups_match_scalar():
    """The cm lanes path (per-lane tiles + AVX2 transpose flush) must
    equal the reordered bm decode across a SIMD-group-sized batch,
    including the EOB-at-index-64 pathological stream."""
    rng = np.random.default_rng(0xCE11)
    bh, bw = 5, 16  # nb=80, row_blocks=16: transpose fast path engages
    nb = bh * bw
    planes = [_content(rng, nb, s)
              for s in ("dense", "zrl", "eob", "full", "dense", "zrl",
                        "eob", "full", "dense")]
    blobs = [centropy.encode_plane(c) for c in planes]
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = (np.arange(9) % 2).astype(np.uint8)
    cm = centropy.decode_batch_cm(data, offsets, lengths, is_p, nb, bw)
    bm = centropy.decode_batch(data, offsets, lengths, is_p, nb)
    want = bm.reshape(-1, bh, bw, 64).transpose(0, 1, 3, 2)
    np.testing.assert_array_equal(cm, want)


# ----- packed i8-output lanes path (int16 DC + int8 AC) ---------------

def _i8_expect(blobs, nb, is_p):
    """Packed-format expectation derived from the int16 scalar oracle."""
    dc = np.empty((len(blobs), nb), dtype=np.int16)
    ac = np.empty((len(blobs), nb, 64), dtype=np.int8)
    for i, blob in enumerate(blobs):
        full = entropy_ref.decode_plane(blob, nb, bool(is_p[i]))
        dc[i] = full[:, 0]
        a = full.astype(np.int8)
        a[:, 0] = 0
        ac[i] = a
    return dc, ac


@pytest.mark.parametrize("style", ["dense", "zrl", "eob", "full"])
def test_lanes_i8_groups_match_scalar(style):
    """The i8-output lanes flush (int16 DC row + narrowed int8 AC row)
    must be bit-exact with the packed format derived from the scalar
    decoder, across I/P mixes and SIMD/scalar group boundaries.  The
    `bigamp` style is excluded here: it exceeds int8 by construction
    (covered by test_lanes_i8_overflow_falls_back)."""
    rng = np.random.default_rng(hash("i8" + style) % 2**31)
    nb = 40
    n_items = 19  # 2 SIMD groups + 3 scalar remainder items
    planes = [np.clip(_content(rng, nb, style), -128, 127).astype(np.int16)
              for _ in range(n_items)]
    for c in planes:  # DC may use the full int16 range in the packed format
        c[:, 0] = rng.integers(-2000, 2000, size=nb)
    blobs = [centropy.encode_plane(c) for c in planes]
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = (np.arange(n_items) % 3 != 0).astype(np.uint8)
    got = centropy.decode_batch_i8(data, offsets, lengths, is_p, nb)
    assert got is not None, "unexpected overflow fallback"
    dc_exp, ac_exp = _i8_expect(blobs, nb, is_p)
    np.testing.assert_array_equal(got[0], dc_exp, err_msg=style + " dc")
    np.testing.assert_array_equal(got[1], ac_exp, err_msg=style + " ac")


def test_lanes_i8_overflow_falls_back():
    """Any AC amplitude past int8 anywhere in the batch -> None (the
    caller re-decodes through the int16 path), whether the overflowing
    item sits in a SIMD group or the scalar remainder."""
    rng = np.random.default_rng(7)
    nb = 16
    for bad_at in (3, 17):  # inside group 0 / in the scalar remainder
        planes = [np.zeros((nb, 64), dtype=np.int16) for _ in range(19)]
        for c in planes:
            c[:, 1] = rng.integers(-100, 100, size=nb)
        planes[bad_at][5, 9] = 300  # exceeds int8
        blobs = [centropy.encode_plane(c) for c in planes]
        data, offsets, lengths = _batch_inputs(blobs)
        is_p = np.ones(19, np.uint8)
        assert centropy.decode_batch_i8(
            data, offsets, lengths, is_p, nb) is None


def test_lanes_i8_corrupt_group_error_matches_scalar():
    """A structurally corrupt stream inside a SIMD group must surface the
    same per-item error the scalar path reports (the group re-decodes
    scalar on any flagged lane)."""
    rng = np.random.default_rng(11)
    nb = 24
    planes = [np.zeros((nb, 64), dtype=np.int16) for _ in range(8)]
    for c in planes:
        c[:, 2] = rng.integers(-50, 50, size=nb)
    blobs = [centropy.encode_plane(c) for c in planes]
    # item 5: DC size=0 then 5x ZRL -> zig-zag overrun with NO amplitude
    # overflow (the all-ones classic hits the amp check first and reports
    # +1 instead — overflow-precedence is part of the scalar contract).
    blobs[5] = bytes([0x0F] * 5 + [0x00] * 3)
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = np.ones(8, np.uint8)
    with pytest.raises(ValueError, match="item 5"):
        centropy.decode_batch_i8(data, offsets, lengths, is_p, nb)


def test_lanes_i8_eob_at_transient_index_64():
    """The EOB-at-64 phantom-store pathology through the i8 flush."""
    block = [
        (0b011, 4), (0b101, 3),
        (0xE2, 8), (0b11, 2),
        (0xF0, 8), (0xF0, 8), (0xF0, 8),
        (0x00, 8),
    ]
    block2 = [(0b0000, 4), (0x00, 8)]
    bits = _pack_bits(block + block2) + b"\x00" * 8
    nb = 2
    blobs = [bits] * 8
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = np.ones(8, np.uint8)
    got = centropy.decode_batch_i8(data, offsets, lengths, is_p, nb)
    assert got is not None
    dc_exp, ac_exp = _i8_expect(blobs, nb, is_p)
    assert dc_exp[0, 0] == 5, "oracle sanity (DC survives)"
    np.testing.assert_array_equal(got[0], dc_exp)
    np.testing.assert_array_equal(got[1], ac_exp)


def test_lanes_i8_forced_scalar_parity():
    """MJ_I8_NO_LANES=1 (the A/B and sweep oracle knob) must produce the
    identical packed output (C getenv reads the live environment, so the
    toggle works within one process)."""
    import os

    rng = np.random.default_rng(23)
    nb = 32
    planes = [
        np.where(rng.random((nb, 64)) < 0.4,
                 rng.integers(-90, 90, size=(nb, 64)), 0).astype(np.int16)
        for _ in range(16)
    ]
    blobs = [centropy.encode_plane(c) for c in planes]
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = rng.integers(0, 2, size=16).astype(np.uint8)
    fast = centropy.decode_batch_i8(data, offsets, lengths, is_p, nb)
    os.environ["MJ_I8_NO_LANES"] = "1"
    try:
        slow = centropy.decode_batch_i8(data, offsets, lengths, is_p, nb)
    finally:
        del os.environ["MJ_I8_NO_LANES"]
    np.testing.assert_array_equal(fast[0], slow[0])
    np.testing.assert_array_equal(fast[1], slow[1])


def test_lanes_i8_out_buffer_reuse():
    """decode_batch_i8(out=(dc, ac)) writes into the caller's buffers
    (the bench/pipeline buffer-ring pattern) and returns views of them."""
    rng = np.random.default_rng(31)
    nb = 24
    planes = [
        np.where(rng.random((nb, 64)) < 0.4,
                 rng.integers(-90, 90, size=(nb, 64)), 0).astype(np.int16)
        for _ in range(10)
    ]
    blobs = [centropy.encode_plane(c) for c in planes]
    data, offsets, lengths = _batch_inputs(blobs)
    is_p = np.ones(10, np.uint8)
    ref = centropy.decode_batch_i8(data, offsets, lengths, is_p, nb)
    dc = np.full((10, nb), -7, dtype=np.int16)
    ac = np.full((10, nb, 64), -7, dtype=np.int8)
    got = centropy.decode_batch_i8(data, offsets, lengths, is_p, nb,
                                   out=(dc, ac))
    assert got[0] is dc and got[1] is ac
    np.testing.assert_array_equal(dc, ref[0])
    np.testing.assert_array_equal(ac, ref[1])
