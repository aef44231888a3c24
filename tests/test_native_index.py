"""Native frame-index chain walk vs the Python walk."""
import numpy as np
import pytest

from mjpeg423_tpu.codec import encoder
from mjpeg423_tpu.core import format as fmt
from mjpeg423_tpu.native import centropy

from conftest import make_test_frames


@pytest.mark.skipif(not centropy.native_available(), reason="no native codec")
def test_native_index_matches_python():
    rng = np.random.default_rng(41)
    frames = make_test_frames(rng, num_frames=9, h=24, w=40)
    data = encoder.encode_frames(frames, max_i_interval=4)
    hdr = fmt.FileHeader.unpack(data)

    ftype, off, length = centropy.index_frames(
        data, fmt.FILE_HEADER_BYTES, hdr.num_frames
    )
    # Python reference walk (bypass the native fast path)
    idx = fmt.index_frames.__wrapped__(data) if hasattr(
        fmt.index_frames, "__wrapped__") else None
    # Walk manually via parse_file for ground truth.
    mpg = fmt.parse_file(data)
    want_types = np.array([f.frame_type for f in mpg.frames], dtype=np.uint32)
    np.testing.assert_array_equal(ftype, want_types)
    for fi, frame in enumerate(mpg.frames):
        for p, bits in ((0, frame.y_bits), (1, frame.cb_bits)):
            o, l = int(off[p, fi]), int(length[p, fi])
            assert data[o:o + l] == bits
        # Cr includes <=3 pad bytes; compare the prefix.
        o, l = int(off[2, fi]), int(length[2, fi])
        assert data[o:o + len(frame.cr_bits)] == frame.cr_bits
        assert l >= len(frame.cr_bits)


@pytest.mark.skipif(not centropy.native_available(), reason="no native codec")
def test_native_index_rejects_corrupt_chain():
    rng = np.random.default_rng(2)
    frames = make_test_frames(rng, num_frames=3, h=16, w=16)
    data = bytearray(encoder.encode_frames(frames, max_i_interval=2))
    # Corrupt frame 1's frame_size to point past the buffer.
    idx = fmt.frame_offsets(bytes(data))
    import struct

    struct.pack_into("<I", data, idx[1], 0xFFFFFF)
    with pytest.raises(ValueError):
        centropy.index_frames(bytes(data), fmt.FILE_HEADER_BYTES, 3)


def test_index_frames_api_unchanged():
    rng = np.random.default_rng(4)
    frames = make_test_frames(rng, num_frames=5, h=16, w=24)
    data = encoder.encode_frames(frames, max_i_interval=3)
    idx = fmt.index_frames(data)
    assert idx.num_frames == 5
    assert idx.is_iframe[0]
    assert idx.plane_off.shape == (3, 5)
