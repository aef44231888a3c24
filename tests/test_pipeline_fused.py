"""Streaming pipeline with the fused Pallas step (interpret mode) vs oracle."""
import numpy as np
import pytest

from mjpeg423_tpu.codec import decoder, encoder
from mjpeg423_tpu.runtime import DecodePipeline
from mjpeg423_tpu.utils.config import DecodeConfig

from conftest import make_test_frames


@pytest.mark.parametrize("coef_major", [None, True])
def test_pipeline_fused_step_matches_oracle(coef_major):
    """Both device-input layouts: None = auto (block-major, the parse-bound
    default) and True = coefficient-major (chip-bound serving opt-in)."""
    rng = np.random.default_rng(13)
    frames = make_test_frames(rng, num_frames=7, h=24, w=32)
    data = encoder.encode_frames(frames, max_i_interval=3)
    want = decoder.decode_stream_array(data)
    # Window size 2: exercises the fused kernel's carry chaining.
    pipe = DecodePipeline(DecodeConfig(frames_per_batch=2, use_pallas=True,
                                       coef_major=coef_major))
    got = pipe.decode_array(data)
    np.testing.assert_array_equal(got, want)


def test_auto_rows_per_step_measured_choices():
    """The fold heuristic reproduces the v5e-measured optima and the
    VMEM compile boundary."""
    from mjpeg423_tpu.runtime.pipeline import auto_rows_per_step

    assert auto_rows_per_step(136, 240, 16) == 2   # 1080p W=16: 480 lanes
    assert auto_rows_per_step(136, 240, 20) == 2   # W=20 compiles (9600)
    assert auto_rows_per_step(136, 240, 24) == 1   # W=24 k=2 OOMs (11520)
    assert auto_rows_per_step(60, 80, 16) == 4     # VGA: 320 lanes best
    assert auto_rows_per_step(60, 80, 24) == 4
    assert auto_rows_per_step(6, 8, 24) == 6       # narrow: largest fold
    # Budget is never floored up past the compile boundary at big windows
    # (W=48 VGA: 203-lane budget -> k=2, not the OOM-range k=3).
    assert auto_rows_per_step(60, 80, 48) == 2
    # Block-major budget is tighter (in-VMEM transpose scratch): 1080p
    # W=14 k=2 compiles (measured 9,663 f/s), W=15 OOMs.
    assert auto_rows_per_step(136, 240, 14, layout="bm") == 2
    assert auto_rows_per_step(136, 240, 15, layout="bm") == 1
    assert auto_rows_per_step(136, 240, 8, layout="bm") == 2
    assert auto_rows_per_step(136, 240, 20, layout="bm") == 1
