"""Native C entropy codec vs the Python oracle (and via it, the reference)."""
import numpy as np
import pytest

from mjpeg423_tpu.core.tables import ZIGZAG
from mjpeg423_tpu.native import centropy
from mjpeg423_tpu.ops import entropy_ref

pytestmark = pytest.mark.skipif(
    not centropy.native_available(), reason="no C compiler available"
)


def _rand_coeffs(rng, nb, lo=-200, hi=200, density=0.3):
    c = rng.integers(lo, hi, size=(nb, 64)).astype(np.int16)
    c[rng.random((nb, 64)) > density] = 0
    return c


def test_encode_matches_python(rng):
    for density in (0.05, 0.3, 0.9):
        c = _rand_coeffs(rng, 50, density=density)
        assert centropy.encode_plane(c) == entropy_ref.encode_plane(c)


def test_decode_matches_python(rng):
    for is_p in (False, True):
        c = _rand_coeffs(rng, 50)
        bits = entropy_ref.encode_plane(c)
        np.testing.assert_array_equal(
            centropy.decode_plane(bits, 50, is_p),
            entropy_ref.decode_plane(bits, 50, is_p),
        )


def test_decode_edge_patterns():
    cases = [
        np.zeros((2, 64), dtype=np.int16),                      # all zero
        np.full((1, 64), 1, dtype=np.int16),                    # fully dense
    ]
    zrl = np.zeros((1, 64), dtype=np.int16)
    zrl[0, ZIGZAG[62]] = -5                                     # 3x ZRL
    cases.append(zrl)
    big = np.zeros((1, 64), dtype=np.int16)
    big[0, 0] = 2047
    big[0, 1] = -2047                                           # max VLI size
    cases.append(big)
    for c in cases:
        bits = entropy_ref.encode_plane(c)
        assert centropy.encode_plane(c) == bits
        for is_p in (False, True):
            np.testing.assert_array_equal(
                centropy.decode_plane(bits, c.shape[0], is_p),
                entropy_ref.decode_plane(bits, c.shape[0], is_p),
            )


def test_trailing_byte_quirk_matches():
    c = np.zeros((1, 64), dtype=np.int16)
    c[0, ZIGZAG[63]] = 3  # amplitude lands in the zeroed final byte
    bits = centropy.encode_plane(c)
    assert bits == entropy_ref.encode_plane(c)
    np.testing.assert_array_equal(
        centropy.decode_plane(bits, 1, True),
        entropy_ref.decode_plane(bits, 1, True),
    )


def test_decode_batch():
    rng = np.random.default_rng(3)
    planes = [_rand_coeffs(rng, 12) for _ in range(9)]
    blobs = [entropy_ref.encode_plane(c) for c in planes]
    data = b"".join(blobs)
    offsets, lengths, pos = [], [], 0
    for b in blobs:
        offsets.append(pos)
        lengths.append(len(b))
        pos += len(b)
    is_p = np.array([i % 2 for i in range(9)], dtype=np.uint8)
    out = centropy.decode_batch(
        data, np.array(offsets, np.uint64), np.array(lengths, np.uint64),
        is_p, 12,
    )
    for i in range(9):
        np.testing.assert_array_equal(
            out[i], entropy_ref.decode_plane(blobs[i], 12, bool(is_p[i]))
        )


def test_corrupt_stream_raises():
    # A stream of 0xFF bytes: run=15,size=15 repeatedly -> index overruns.
    with pytest.raises(ValueError):
        centropy.decode_plane(b"\xff" * 64, 2, False)


def test_truncated_stream_zero_extends():
    """Bits past the end read as zeros (matching the Python oracle)."""
    c = _rand_coeffs(np.random.default_rng(5), 8)
    bits = entropy_ref.encode_plane(c)
    cut = bits[: len(bits) // 2]
    np.testing.assert_array_equal(
        centropy.decode_plane(cut, 8, True),
        entropy_ref.decode_plane(cut, 8, True),
    )


def test_blocked_to_raster_native_matches_numpy():
    """Native OpenMP blocked->raster conversion is an exact permutation
    (both k=1 and folded k>1 geometries)."""
    rng = np.random.default_rng(40)
    for bh, bw, k in ((16, 24, 1), (12, 10, 4), (6, 8, 6)):
        g, bwe = bh // k, k * bw
        blocked = rng.integers(
            0, 2**32, (3, 8, g, 8, bwe), dtype=np.uint32
        )
        ref = blocked.reshape(3, 8, g, 8, k, bw).transpose(
            0, 2, 4, 3, 5, 1
        ).reshape(3, bh * 8, bw * 8)
        got = centropy.blocked_to_raster(blocked, bh, bw)
        if got is None:
            pytest.skip("native codec unavailable")
        np.testing.assert_array_equal(got, ref)


def test_rgb_to_ycbcr_native_matches_numpy():
    """Native one-pass color conversion is bit-exact with the NumPy
    reference-doubles path (encode_ref), including blocking layout.
    Sweeps cover every (r, g) pair at several b values (and vice versa) so
    any FMA-contraction or rounding divergence in the C build would trip."""
    from mjpeg423_tpu.ops import encode_ref
    from mjpeg423_tpu.ops.transform_ref import raster_to_blocks

    if centropy.rgb_to_ycbcr_blocked(np.zeros((8, 8, 3), np.uint8)) is None:
        pytest.skip("native codec unavailable")

    def ref_path(rgb):
        y, cb, cr = encode_ref.rgb_to_ycbcr_frame(rgb)
        return raster_to_blocks(y), raster_to_blocks(cb), raster_to_blocks(cr)

    rng = np.random.default_rng(41)
    frames = [rng.integers(0, 256, (64, 128, 3)).astype(np.uint8)]
    r, g = np.meshgrid(
        np.arange(256, dtype=np.uint8), np.arange(256, dtype=np.uint8),
        indexing="ij",
    )
    for v in (0, 127, 128, 255):
        frames.append(np.stack([r, g, np.full_like(r, v)], axis=-1))
        frames.append(np.stack([np.full_like(r, v), r, g], axis=-1))
    for rgb in frames:
        for got, want in zip(centropy.rgb_to_ycbcr_blocked(rgb), ref_path(rgb)):
            np.testing.assert_array_equal(got, want)


def test_fdct_quant_native_matches_numpy():
    """Native FDCT+quantize == encode_ref butterflies + exact quantize,
    including int16 DCTELEM truncation and extreme sample patterns."""
    from mjpeg423_tpu.core import tables as T
    from mjpeg423_tpu.ops import encode_ref

    rng = np.random.default_rng(42)
    cases = [
        rng.integers(0, 256, (500, 8, 8)).astype(np.uint8),
        np.zeros((4, 8, 8), np.uint8),
        np.full((4, 8, 8), 255, np.uint8),
        np.tile(
            np.array([[0, 255] * 4] * 8, np.uint8).reshape(8, 8), (16, 1, 1)
        ),
    ]
    for quant in (T.YQUANT64, T.CQUANT64):
        for blocks in cases:
            got = centropy.fdct_quant_blocks(blocks, quant)
            if got is None:
                pytest.skip("native codec unavailable")
            coefs = encode_ref.fdct_blocks(blocks).reshape(-1, 64)
            want = encode_ref.quantize_blocks(coefs, quant)
            np.testing.assert_array_equal(got, want)


def test_encode_planes_batch_matches_serial():
    """Batched OpenMP entropy encode is byte-identical per item to the
    serial native packer (and transitively to the Python oracle)."""
    rng = np.random.default_rng(43)
    coeffs = rng.integers(-300, 300, (9, 32, 64)).astype(np.int16)
    coeffs[3] = 0  # all-zero plane (pure EOB stream)
    got = centropy.encode_planes(coeffs)
    want = [centropy.encode_plane(coeffs[i]) for i in range(coeffs.shape[0])]
    assert got == want


def test_encode_candidates_matches_prediffed():
    """Inline-diff candidate packer == NumPy diffs + serial native pack
    (I DC block chain, P per-coefficient delta, frame-0 I-only batch)."""
    from mjpeg423_tpu.ops import encode_ref

    rng = np.random.default_rng(44)
    q3 = rng.integers(-900, 900, (3, 40, 64)).astype(np.int16)
    qprev3 = rng.integers(-900, 900, (3, 40, 64)).astype(np.int16)
    got = centropy.encode_candidates(q3, qprev3)
    if got is None:
        pytest.skip("native codec unavailable")
    want = [centropy.encode_plane(encode_ref.diff_dc_i(q3[p])) for p in range(3)]
    want += [
        centropy.encode_plane(encode_ref.diff_p(q3[p], qprev3[p]))
        for p in range(3)
    ]
    assert got == want
    got0 = centropy.encode_candidates(q3, None)
    assert got0 == want[:3]


def test_decode_batch_out_destination(rng):
    """Caller-provided out= destination: bit-identical, returns the same
    buffer, and rejects mis-shaped/discontiguous destinations."""
    c = _rand_coeffs(rng, 96)
    blobs = [centropy.encode_plane(c) for _ in range(5)]
    data = b"".join(blobs)
    lens = np.array([len(b) for b in blobs], dtype=np.uint64)
    offs = np.zeros(5, np.uint64)
    offs[1:] = np.cumsum(lens)[:-1]
    is_p = np.ones(5, np.uint8)
    base = centropy.decode_batch(data, offs, lens, is_p, 96)
    dest = centropy.alloc_hugepage_buf((5, 96, 64), np.int16)
    got = centropy.decode_batch(data, offs, lens, is_p, 96, out=dest)
    assert got is dest
    np.testing.assert_array_equal(got, base)
    with pytest.raises(ValueError):
        centropy.decode_batch(
            data, offs, lens, is_p, 96, out=np.empty((4, 96, 64), np.int16)
        )
    # coefficient-major variant takes out= too
    cm = centropy.decode_batch_cm(data, offs, lens, is_p, 96, 8)
    dest_cm = np.empty_like(cm)
    got_cm = centropy.decode_batch_cm(data, offs, lens, is_p, 96, 8, out=dest_cm)
    assert got_cm is dest_cm
    np.testing.assert_array_equal(got_cm, cm)


def test_encode_candidates_segmented_byte_identical(rng):
    """The segmented parallel candidate pack (mj423_encode_candidates_seg:
    per-plane block ranges packed concurrently, bit-stitched, I-DC chain
    resumed from the previous block's absolute DC) is byte-identical to the
    whole-plane pack for every segment count and both tail modes."""
    import ctypes

    lib = centropy._load()
    if lib is None:
        pytest.skip("native codec unavailable")
    i16p = ctypes.POINTER(ctypes.c_int16)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lp = ctypes.POINTER(ctypes.c_long)
    for nb in (1, 7, 257):
        q3 = np.stack([_rand_coeffs(rng, nb) for _ in range(3)])
        qp = np.stack([_rand_coeffs(rng, nb) for _ in range(3)])
        cap = nb * 64 * 3 + 64
        for prev in (None, qp):
            n = 3 if prev is None else 6
            pp = (ctypes.cast(None, i16p) if prev is None
                  else prev.ctypes.data_as(i16p))
            for et in (0, 1):
                out0 = np.zeros((6, cap), np.uint8)
                l0 = np.zeros(6, np.dtype(ctypes.c_long))
                assert lib.mj423_encode_candidates(
                    q3.ctypes.data_as(i16p), pp, nb,
                    out0.ctypes.data_as(u8p), cap,
                    l0.ctypes.data_as(lp), et) == 0
                for n_seg in (2, 5):
                    sb = (nb + n_seg - 1) // n_seg
                    seg_cap = sb * 64 * 3 + 72
                    segb = np.zeros((6 * n_seg, seg_cap), np.uint8)
                    out1 = np.zeros((6, cap), np.uint8)
                    l1 = np.zeros(6, np.dtype(ctypes.c_long))
                    assert lib.mj423_encode_candidates_seg(
                        q3.ctypes.data_as(i16p), pp, nb, n_seg,
                        segb.ctypes.data_as(u8p), seg_cap,
                        out1.ctypes.data_as(u8p), cap,
                        l1.ctypes.data_as(lp), et, 3) == 0
                    for i in range(n):
                        assert l0[i] == l1[i]
                        assert bytes(out1[i, :l1[i]]) == bytes(out0[i, :l0[i]])


def test_candidate_sizes_and_which_selection(rng):
    """candidate_sizes returns the exact packed byte length of every
    candidate plane, and which-filtered packs (the select-then-pack
    encoder flow) are byte-identical to the corresponding items of the
    full pack."""
    if not centropy.native_available():
        pytest.skip("native codec unavailable")
    for nb in (3, 130, 5000):
        q3 = np.stack([_rand_coeffs(rng, nb) for _ in range(3)])
        qp = np.stack([_rand_coeffs(rng, nb) for _ in range(3)])
        full = centropy.encode_candidates(q3, qp, None, False)
        sizes = centropy.candidate_sizes(q3, qp)
        assert sizes == [len(b) for b in full]
        assert centropy.candidate_sizes(q3, None) == sizes[:3]
        only_i = centropy.encode_candidates(q3, None, None, False, which=1)
        only_p = centropy.encode_candidates(q3, qp, None, False, which=2)
        assert only_i == full[:3]
        assert only_p == full[3:]
        with pytest.raises(ValueError):
            centropy.encode_candidates(q3, None, None, False, which=2)


def test_encode_candidates_into_inplace(rng):
    """In-place container packing: planes land byte-identical at arbitrary
    offsets in a shared buffer, and NO byte outside each plane's exact span
    is ever touched (the tail-exact appender contract that makes zero-copy
    frame assembly safe), including when a plane's bit length is exactly
    byte-aligned."""
    if not centropy.native_available():
        pytest.skip("native codec unavailable")
    for nb in (2, 130, 5000):
        q3 = np.stack([_rand_coeffs(rng, nb) for _ in range(3)])
        qp = np.stack([_rand_coeffs(rng, nb) for _ in range(3)])
        for which, prev in ((1, None), (1, qp), (2, qp)):
            blobs = centropy.encode_candidates(
                q3, None if which == 1 else qp, None, False, which=which
            )
            sizes = [len(b) for b in blobs]
            # pack tight: plane p at offset 7 + sum of previous sizes
            offs = [7 + sum(sizes[:p]) for p in range(3)]
            total = offs[-1] + sizes[-1] + 5
            dst = np.full(total, 0xAB, np.uint8)
            centropy.encode_candidates_into(
                q3, prev if which == 2 else None, dst, offs, sizes,
                None, False, which=which,
            )
            for p in range(3):
                got = bytes(dst[offs[p]:offs[p] + sizes[p]])
                assert got == blobs[p], (nb, which, p)
            # guard bytes before/after/between untouched
            assert bytes(dst[:7]) == b"\xab" * 7
            assert bytes(dst[-5:]) == b"\xab" * 5
            # wrong predicted sizes must raise, not corrupt silently
            with pytest.raises((RuntimeError, ValueError)):
                centropy.encode_candidates_into(
                    q3, prev if which == 2 else None, dst, offs,
                    [max(0, s - 1) for s in sizes], None, False, which=which,
                )


def test_candidate_sizes_extreme_amplitudes(rng):
    """The size scan's float-exponent bitlen path must agree with the
    packer at the VLI cap (size clamped to 11) and at int16 extremes
    including -32768 (whose int16 abs wraps)."""
    if not centropy.native_available():
        pytest.skip("native codec unavailable")
    nb = 70
    q3 = np.zeros((3, nb, 64), np.int16)
    q3[0, 0, :] = 32767
    q3[0, 1, 0] = -32768
    q3[0, 1, 63] = -32768
    q3[1, 2, :] = -2048          # exactly 12 bits -> capped at 11
    q3[1, 3, 1] = 2047           # exactly 11 bits
    q3[2, 4, ::16] = -1          # sparse with ZRL gaps at extremes
    q3[0, 5:, ::7] = rng.integers(-32768, 32767, q3[0, 5:, ::7].shape)
    qp = np.roll(q3, 3, axis=1).copy()
    full = centropy.encode_candidates(q3, qp, None, False)
    assert centropy.candidate_sizes(q3, qp) == [len(b) for b in full]
