"""Lossless re-GOP transcoding (codec/transcode.py).

The invariant under test: regop() may place I-frames anywhere, but decoding
the output must be BIT-IDENTICAL to decoding the input — including through
the compiled reference C decoder and the sharded mesh path.
"""
import numpy as np
import pytest

from mjpeg423_tpu.codec.decoder import decode_stream_array
from mjpeg423_tpu.codec.encoder import encode_frames
from mjpeg423_tpu.codec.transcode import regop
from mjpeg423_tpu.core import format as fmt

from oracle.harness import Oracle, oracle_available

needs_oracle = pytest.mark.skipif(
    not oracle_available(), reason="reference oracle unavailable"
)


def _clip(rng, nf=13, h=64, w=80):
    """Drifting-gradient clip: P frames win most of the time."""
    base = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    return [
        np.clip(base.astype(np.int16) + 7 * i, 0, 255).astype(np.uint8)
        for i in range(nf)
    ]


@pytest.mark.parametrize("gop,window", [(4, 5), (2, 3), (6, 16), (1, 4)])
def test_regop_lossless(rng, gop, window):
    orig = encode_frames(_clip(rng), max_i_interval=1000)
    new = regop(orig, max_i_interval=gop, window=window)
    np.testing.assert_array_equal(
        decode_stream_array(orig), decode_stream_array(new)
    )
    # forced I's actually appear at the requested cadence
    types = fmt.index_frames(new).frame_type
    assert types[0] == 0
    gap = 0
    for t in types:
        gap = 0 if t == 0 else gap + 1
        assert gap < gop + 1


def test_regop_round_trip_sparse(rng):
    """dense-I -> sparse-I -> decode still bit-identical (both directions)."""
    orig = encode_frames(_clip(rng), max_i_interval=1000)
    dense = regop(orig, max_i_interval=1, window=4)
    assert (fmt.index_frames(dense).frame_type == 0).all()
    back = regop(dense, max_i_interval=1000, window=7)
    np.testing.assert_array_equal(
        decode_stream_array(back), decode_stream_array(orig)
    )


@needs_oracle
def test_regop_vs_reference_decoder(rng):
    frames = _clip(rng, nf=11)
    orig = encode_frames(frames, max_i_interval=1000)
    new = regop(orig, max_i_interval=3, window=4)
    got = decode_stream_array(new)
    ref = Oracle().decode(new, 11, 80, 64).astype(np.uint32)
    np.testing.assert_array_equal(got, ref)


def test_regop_enables_sharding(rng):
    """The motivating use: a single-GOP stream re-GOP'd so the mesh
    pipeline can GOP-partition it across 8 virtual devices."""
    import jax

    from mjpeg423_tpu.parallel import make_mesh
    from mjpeg423_tpu.runtime import DecodePipeline

    orig = encode_frames(_clip(rng, nf=16, h=48, w=64), max_i_interval=1000)
    assert len(fmt.index_frames(orig).gop_starts()) == 1
    new = regop(orig, max_i_interval=2, window=5)
    assert len(fmt.index_frames(new).gop_starts()) >= 8
    mesh = make_mesh(n_data=len(jax.devices()), n_block=1)
    got = DecodePipeline(mesh=mesh).decode_array(new)
    np.testing.assert_array_equal(
        np.asarray(got), decode_stream_array(orig)
    )


def test_regop_noise_content(rng):
    """Wraparound-heavy content (pure noise maximizes amplitudes)."""
    frames = [
        rng.integers(0, 256, (32, 40, 3)).astype(np.uint8) for _ in range(7)
    ]
    orig = encode_frames(frames, max_i_interval=3)
    new = regop(orig, max_i_interval=2, window=3)
    np.testing.assert_array_equal(
        decode_stream_array(orig), decode_stream_array(new)
    )


def test_exact_tail_preserves_dense_block_tail(rng):
    """Crafted quirk trigger: a fully-dense last block whose tail symbols
    land in the final partial byte.  Quirk mode (the reference encoder's
    output_rest) drops those bits; exact_tail keeps them — and both decode
    fine (tail padding is never inspected mid-stream)."""
    from mjpeg423_tpu.native import centropy
    from mjpeg423_tpu.ops import entropy_ref

    c = np.ones((3, 64), dtype=np.int16)  # dense: no EOB emitted
    quirk = entropy_ref.encode_plane(c, exact_tail=False)
    exact = entropy_ref.encode_plane(c, exact_tail=True)
    assert len(quirk) == len(exact) and quirk[:-1] == exact[:-1]
    assert quirk != exact  # the crafted stream does end mid-byte
    got_exact = entropy_ref.decode_plane(exact, 3, True)
    np.testing.assert_array_equal(got_exact, c)  # lossless
    got_quirk = entropy_ref.decode_plane(quirk, 3, True)
    assert not np.array_equal(got_quirk, c)  # the quirk is in fact lossy
    if centropy.native_available():
        q3 = np.broadcast_to(c, (3, 3, 64)).copy()
        blobs = centropy.encode_candidates(q3, None, None, True)
        want = [
            entropy_ref.encode_plane(
                __import__(
                    "mjpeg423_tpu.ops.encode_ref", fromlist=["diff_dc_i"]
                ).diff_dc_i(q3[p]),
                exact_tail=True,
            )
            for p in range(3)
        ]
        assert blobs == want  # native exact-tail == oracle exact-tail


def test_strict_range_raises_on_unencodable_amplitudes():
    """Values outside the VLI's 11-bit range (only corrupt/adversarial
    streams produce them) clamp lossily at pack time — the reference's
    encode_VLI does the same (lossless_encode.c:121-138).  regop runs
    encode_quantized_frames(strict_range=True), which must REFUSE such
    frames instead of silently emitting different pixels."""
    import pytest

    from mjpeg423_tpu.codec.encoder import encode_quantized_frames

    q3 = np.zeros((3, 6, 64), np.int16)
    q3[0, 2, 5] = 3000  # AC beyond +-2047
    with pytest.raises(ValueError, match="VLI"):
        encode_quantized_frames([q3], 16, 24, strict_range=True)
    # non-strict still encodes (reference clamp semantics), native == oracle
    from mjpeg423_tpu.ops import entropy_ref

    a = encode_quantized_frames([q3], 16, 24)
    b = encode_quantized_frames(
        [q3], 16, 24, entropy_encode=entropy_ref.encode_plane
    )
    assert a == b

    # DC chain diffs beyond the range must trip it too
    q3b = np.zeros((3, 6, 64), np.int16)
    q3b[1, 0, 0] = -1500
    q3b[1, 1, 0] = 1500  # chain diff 3000
    with pytest.raises(ValueError, match="VLI"):
        encode_quantized_frames([q3b], 16, 24, strict_range=True)

    # the pure-Python packer path enforces it too
    for bad in (q3, q3b):
        with pytest.raises(ValueError, match="VLI"):
            encode_quantized_frames(
                [bad], 16, 24, entropy_encode=entropy_ref.encode_plane,
                strict_range=True,
            )


def test_corrupt_frame_type_rejected():
    """frame_type other than I(0)/P(1) must raise ValueError at parse and
    index time, not overflow or silently decode as P (fuzzer regression)."""
    import pytest

    from mjpeg423_tpu.codec.encoder import encode_frames
    from mjpeg423_tpu.core import format as fmt

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)] * 3
    data = bytearray(encode_frames(frames, max_i_interval=2))
    # frame 0's frame_type field is at offset 20 + 4
    data[24] = 0xAA
    with pytest.raises(ValueError):
        fmt.parse_file(bytes(data))
    with pytest.raises(ValueError):
        fmt.index_frames(bytes(data))


def test_regop_p_first_frame():
    """A stream whose FIRST frame is a P-frame is accepted by the decoder
    (delta accumulated into the zeroed initial carry); regop must mirror
    that semantic — zero initial amplitude state — not crash (review
    regression: prev=None reached np.add)."""
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)] * 4
    data = bytearray(encode_frames(frames, max_i_interval=2))
    data[24] = 1  # frame 0's frame_type word: I -> P
    data = bytes(data)
    want = decode_stream_array(data)  # the decoder accepts P-first
    new = regop(data, max_i_interval=2)
    np.testing.assert_array_equal(want, decode_stream_array(new))
