"""Fully-fused decode window kernel vs the oracle, including carry chaining."""
import numpy as np
import pytest

from mjpeg423_tpu.codec import decoder, encoder
from mjpeg423_tpu.core.format import parse_file
from mjpeg423_tpu.ops import transform_fused

from conftest import make_test_frames


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(55)
    frames = make_test_frames(rng, num_frames=11, h=32, w=48)
    data = encoder.encode_frames(frames, max_i_interval=4)
    coefs = decoder.parse_coefficient_deltas(parse_file(data))
    want = decoder.decode_stream_array(data)
    return coefs, want


def _amps3(coefs):
    return np.stack([coefs.y, coefs.cb, coefs.cr])


def test_fused_single_window(stream):
    coefs, want = stream
    amps = _amps3(coefs)
    seg = coefs.frame_types == 0
    carry = np.zeros((3, amps.shape[2], 64), dtype=np.int16)
    frames, _ = transform_fused.decode_window_fused(
        amps, seg, carry,
        blocks_h=coefs.height // 8, blocks_w=coefs.width // 8,
    )
    np.testing.assert_array_equal(np.asarray(frames), want)


def test_fused_rows_per_step(stream):
    coefs, want = stream
    amps = _amps3(coefs)
    seg = coefs.frame_types == 0
    carry = np.zeros((3, amps.shape[2], 64), dtype=np.int16)
    frames, _ = transform_fused.decode_window_fused(
        amps, seg, carry,
        blocks_h=coefs.height // 8, blocks_w=coefs.width // 8,
        rows_per_step=2,  # 32px high -> 4 block rows -> 2 groups
    )
    np.testing.assert_array_equal(np.asarray(frames), want)


def test_fused_windowed_carry_chain(stream):
    coefs, want = stream
    amps = _amps3(coefs)
    seg = coefs.frame_types == 0
    b = amps.shape[2]
    carry = np.zeros((3, b, 64), dtype=np.int16)
    outs = []
    w = 3  # 11 frames -> windows of 3/3/3/2, unaligned to the GOP size 4
    for s in range(0, amps.shape[1], w):
        a = amps[:, s:s + w]
        sg = seg[s:s + w]
        frames, carry = transform_fused.decode_window_fused(
            a, sg, carry,
            blocks_h=coefs.height // 8, blocks_w=coefs.width // 8,
        )
        carry = np.asarray(carry)
        outs.append(np.asarray(frames))
    got = np.concatenate(outs, axis=0)
    np.testing.assert_array_equal(got, want)


def test_i8_packed_kernel_matches_int16(stream):
    coefs, want = stream
    amps = _amps3(coefs)
    seg = coefs.frame_types == 0
    packed = transform_fused.pack_amps_i8(amps)
    assert packed is not None, "test stream should fit int8 AC"
    dc, ac8 = packed
    carry = np.zeros((3, amps.shape[2], 64), dtype=np.int16)
    frames, nc = transform_fused.decode_window_fused_i8(
        dc, ac8, seg, carry,
        blocks_h=coefs.height // 8, blocks_w=coefs.width // 8,
    )
    np.testing.assert_array_equal(np.asarray(frames), want)
    # Carry matches the int16 kernel's carry too.
    _, nc16 = transform_fused.decode_window_fused(
        amps, seg, carry, blocks_h=coefs.height // 8,
        blocks_w=coefs.width // 8,
    )
    np.testing.assert_array_equal(np.asarray(nc), np.asarray(nc16))


def test_pack_amps_i8_rejects_wide_ac():
    amps = np.zeros((3, 1, 4, 64), np.int16)
    amps[0, 0, 0, 5] = 200  # AC beyond int8
    assert transform_fused.pack_amps_i8(amps) is None
    amps[0, 0, 0, 5] = 0
    amps[0, 0, 0, 0] = 30000  # DC may use the full int16 range
    assert transform_fused.pack_amps_i8(amps) is not None
