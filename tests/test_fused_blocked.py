"""raster=False blocked output + host-side raster conversion."""
import numpy as np

from mjpeg423_tpu.ops import transform_fused, transform_jax


def test_blocked_output_matches_raster():
    rng = np.random.default_rng(3)
    f, bh, bw = 4, 3, 5
    b = bh * bw
    amps = rng.integers(-300, 300, size=(3, f, b, 64)).astype(np.int16)
    seg = np.zeros(f, dtype=bool)
    seg[0] = True
    carry = np.zeros((3, b, 64), dtype=np.int16)
    want, _ = transform_fused.decode_window_fused(
        amps, seg, carry, blocks_h=bh, blocks_w=bw
    )
    blocked, _ = transform_fused.decode_window_fused(
        amps, seg, carry, blocks_h=bh, blocks_w=bw, raster=False
    )
    got = transform_fused.blocked_to_raster_host(np.asarray(blocked))
    np.testing.assert_array_equal(got, np.asarray(want))
