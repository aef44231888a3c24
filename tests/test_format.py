"""Container format: byte layout, round-trip, frame index, GOP iteration."""
import struct

import numpy as np
import pytest

from mjpeg423_tpu.core import format as fmt


def _mk_frame(ftype, ysz, cbsz, crsz):
    return fmt.Frame(
        ftype,
        bytes(range(ysz % 256)) if ysz < 256 else b"\x01" * ysz,
        b"\x02" * cbsz,
        b"\x03" * crsz,
    )


def test_header_pack_layout():
    h = fmt.FileHeader(10, 640, 480, 3, 12345)
    b = h.pack()
    assert len(b) == 20
    assert struct.unpack("<5I", b) == (10, 640, 480, 3, 12345)
    assert fmt.FileHeader.unpack(b) == h


def test_frame_pack_alignment():
    # 16 + 3 + 2 + 2 = 23 -> padded to 24
    f = _mk_frame(0, 3, 2, 2)
    packed = f.pack()
    assert len(packed) == 24
    frame_size, ftype, ysz, cbsz = struct.unpack_from("<4I", packed)
    assert (frame_size, ftype, ysz, cbsz) == (24, 0, 3, 2)
    assert packed[-1:] == b"\x00"  # pad byte


def test_file_roundtrip():
    frames = [
        _mk_frame(0, 10, 5, 7),
        _mk_frame(1, 3, 3, 3),
        _mk_frame(1, 8, 1, 2),
        _mk_frame(0, 6, 6, 6),
        _mk_frame(1, 4, 4, 4),
    ]
    data = fmt.serialize_file(64, 48, frames)
    mpg = fmt.parse_file(data)
    assert mpg.header.num_frames == 5
    assert (mpg.header.width, mpg.header.height) == (64, 48)
    assert mpg.header.num_iframes == 2
    assert [e.frame_index for e in mpg.trailer] == [0, 3]
    for orig, parsed in zip(frames, mpg.frames):
        assert parsed.frame_type == orig.frame_type
        assert parsed.y_bits == orig.y_bits
        assert parsed.cb_bits == orig.cb_bits
        # cr_bits keeps the alignment pad attached; prefix must match
        assert parsed.cr_bits[: len(orig.cr_bits)] == orig.cr_bits
    # trailer positions point at real frame headers
    for e in mpg.trailer:
        fr, _ = fmt.parse_frame_at(data, e.frame_position)
        assert fr.frame_type == 0
    # 512-byte pad present
    expected_end = (
        fmt.FILE_HEADER_BYTES
        + mpg.header.payload_size
        + mpg.header.num_iframes * fmt.TRAILER_ENTRY_BYTES
        + fmt.PAD512
    )
    assert len(data) == expected_end


def test_frame_offsets_chain():
    frames = [_mk_frame(0, 5, 5, 5), _mk_frame(1, 9, 2, 1), _mk_frame(0, 1, 1, 1)]
    data = fmt.serialize_file(16, 16, frames)
    offs = fmt.frame_offsets(data)
    assert offs[0] == 20
    mpg = fmt.parse_file(data)
    assert offs[2] == mpg.trailer[1].frame_position


def test_iter_gops():
    frames = [
        _mk_frame(0, 1, 1, 1), _mk_frame(1, 1, 1, 1), _mk_frame(1, 1, 1, 1),
        _mk_frame(0, 1, 1, 1), _mk_frame(1, 1, 1, 1),
    ]
    mpg = fmt.parse_file(fmt.serialize_file(8, 8, frames))
    gops = list(fmt.iter_gops(mpg))
    assert [g[0] for g in gops] == [0, 3]
    assert [len(g[1]) for g in gops] == [3, 2]
    assert all(g[1][0].is_iframe for g in gops)


def test_container_parser_fuzz_valueerror_only():
    """Random/truncated container bytes raise ValueError (never struct
    errors or index crashes) from both parse_file and index_frames."""
    import numpy as np

    rng = np.random.default_rng(5)
    for _ in range(300):
        blob = bytes(rng.integers(0, 256, int(rng.integers(0, 300)),
                                  dtype=np.uint8))
        for fn in (fmt.parse_file, fmt.index_frames):
            try:
                fn(blob)
            except ValueError:
                pass
