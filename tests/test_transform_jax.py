"""JAX device transform vs the NumPy oracle (which is itself validated
bit-exactly against the compiled reference C codec in test_oracle.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from mjpeg423_tpu.codec import decoder as dec
from mjpeg423_tpu.codec import encoder as enc
from mjpeg423_tpu.core import tables as T
from mjpeg423_tpu.core.format import parse_file
from mjpeg423_tpu.ops import transform_jax as tj
from mjpeg423_tpu.ops import transform_ref as tr

from tests.conftest import make_test_frames


def _rand_coeffs(rng, shape, lo=-2000, hi=2000, density=0.4):
    c = rng.integers(lo, hi, size=shape).astype(np.int16)
    c[rng.random(shape) > density] = 0
    return c


def test_idct_matches_numpy_oracle(rng):
    c = _rand_coeffs(rng, (128, 8, 8))
    ours = np.asarray(tj.idct_blocks(jnp.asarray(c))).astype(np.uint8)
    np.testing.assert_array_equal(ours, tr.idct_blocks(c))


def test_idct_extreme_coefficients():
    cases = np.zeros((4, 8, 8), dtype=np.int16)
    cases[0, 0, 0] = 32767
    cases[1, 0, 0] = -32768
    cases[2] = 32767
    cases[3] = -32768
    ours = np.asarray(tj.idct_blocks(jnp.asarray(cases))).astype(np.uint8)
    np.testing.assert_array_equal(ours, tr.idct_blocks(cases))


def test_color_matches_numpy_oracle(rng):
    y = rng.integers(0, 256, (64, 8, 8)).astype(np.uint8)
    cb = rng.integers(0, 256, (64, 8, 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (64, 8, 8)).astype(np.uint8)
    ours = np.asarray(
        tj.ycbcr_to_rgba(
            jnp.asarray(y, jnp.int32), jnp.asarray(cb, jnp.int32), jnp.asarray(cr, jnp.int32)
        )
    )
    np.testing.assert_array_equal(ours, tr.ycbcr_to_rgb_blocks(y, cb, cr))


def test_segmented_scan_exact_int16(rng):
    # Mixed I/P sequence with values that overflow int16 on accumulation.
    f, b = 12, 6
    deltas = rng.integers(-30000, 30000, (f, b, 64)).astype(np.int16)
    is_i = np.zeros(f, dtype=bool)
    is_i[[0, 5, 9]] = True
    got = np.asarray(tj.segmented_scan(jnp.asarray(deltas), jnp.asarray(is_i)))
    # sequential reference
    expect = np.empty_like(deltas)
    state = np.zeros((b, 64), np.int16)
    for t in range(f):
        with np.errstate(over="ignore"):
            state = deltas[t] if is_i[t] else (state + deltas[t]).astype(np.int16)
        expect[t] = state
    np.testing.assert_array_equal(got, expect)


def test_dequantize_wraps_int16():
    amps = np.array([[32767, -32768, 1000, 0] + [0] * 60], dtype=np.int16)
    q = T.YQUANT64
    got = np.asarray(tj.dequantize(jnp.asarray(amps), jnp.asarray(q)))
    np.testing.assert_array_equal(got, tr.dequant_i(amps, q))


def test_full_decode_transform_matches_numpy_decoder(rng):
    frames = make_test_frames(rng, num_frames=10, h=40, w=56)
    mpg = enc.encode_frames(frames, max_i_interval=4)
    parsed = parse_file(mpg)
    coefs = dec.parse_coefficient_deltas(parsed)
    bh, bw = parsed.header.blocks_h, parsed.header.blocks_w

    expect = dec.decode_stream_array(mpg)
    got = np.asarray(
        tj.decode_transform(
            jnp.asarray(coefs.y), jnp.asarray(coefs.cb), jnp.asarray(coefs.cr),
            jnp.asarray(coefs.frame_types == T.FRAME_TYPE_I),
            blocks_h=bh, blocks_w=bw,
        )
    )
    np.testing.assert_array_equal(got, expect)


def test_decode_transform_states_path(rng):
    frames = make_test_frames(rng, num_frames=4, h=24, w=32)
    mpg = enc.encode_frames(frames, max_i_interval=24)
    parsed = parse_file(mpg)
    coefs = dec.parse_coefficient_deltas(parsed)
    states = dec.dequantize_stream(coefs)
    bh, bw = parsed.header.blocks_h, parsed.header.blocks_w
    got = np.asarray(
        tj.decode_transform_states(
            jnp.asarray(states["y"]), jnp.asarray(states["cb"]), jnp.asarray(states["cr"]),
            blocks_h=bh, blocks_w=bw,
        )
    )
    np.testing.assert_array_equal(got, dec.decode_stream_array(mpg))
