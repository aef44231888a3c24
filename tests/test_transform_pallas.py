"""Pallas fused transform kernel vs the XLA path and the NumPy oracle.

Runs in interpret mode on the CPU test mesh; the same kernel compiles for TPU
(bench.py exercises the compiled path on real hardware).
"""
import numpy as np
import pytest

from mjpeg423_tpu.codec import decoder, encoder
from mjpeg423_tpu.ops import transform_jax, transform_pallas

from conftest import make_test_frames


def _random_states(rng, f=3, b=257):
    # int16 coefficient states, including extremes that stress clamping.
    s = rng.integers(-2048, 2048, size=(3, f, b, 64)).astype(np.int16)
    s[:, :, 0, 0] = np.int16(32767)
    s[:, :, 0, 1] = np.int16(-32768)
    return s


def test_states_transform_matches_xla(rng):
    y, cb, cr = _random_states(rng)
    bh, bw = 1, 257  # degenerate raster: 1 block row, exercises padding
    want = transform_jax.decode_transform_states(y, cb, cr, blocks_h=bh, blocks_w=bw)
    got = transform_pallas.decode_transform_states_pallas(
        y, cb, cr, blocks_h=bh, blocks_w=bw, tile=128
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_full_decode_matches_oracle_stream(rng):
    frames = make_test_frames(rng, num_frames=5, h=32, w=48)
    data = encoder.encode_frames(frames, max_i_interval=3)
    want = decoder.decode_stream_array(data)

    from mjpeg423_tpu.core.format import parse_file

    mpg_coefs = decoder.parse_coefficient_deltas(parse_file(data))
    got = transform_pallas.decode_transform_pallas(
        mpg_coefs.y, mpg_coefs.cb, mpg_coefs.cr,
        mpg_coefs.frame_types == 0,
        blocks_h=mpg_coefs.height // 8, blocks_w=mpg_coefs.width // 8,
        tile=128,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_coefmajor_kernel_zero_input(rng):
    # All-zero coefficients: Y=Cb=Cr=0 samples.  Cb=Cr=0 is extreme negative
    # chroma (offset -128), so R and B clamp to 0 and G = (5638+11700)*128>>14
    # = 135 (reference constants, ycbcr_to_rgb.c:34-37) -> packed 135<<8.
    z = np.zeros((64, 128), dtype=np.int16)
    out = np.asarray(transform_pallas.transform_coefmajor(z, z, z, tile=128))
    assert out.shape == (64, 128)
    assert np.all(out == np.uint32(135 << 8))
