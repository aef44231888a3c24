"""Pipeline with the compressed int8-AC device input (+ automatic fallback)."""
import numpy as np

from mjpeg423_tpu.codec import decoder, encoder
from mjpeg423_tpu.native import centropy
from mjpeg423_tpu.runtime import DecodePipeline
from mjpeg423_tpu.utils.config import DecodeConfig
from mjpeg423_tpu.utils.profile import Profiler

from conftest import make_test_frames


def test_pipeline_i8_path_matches_oracle():
    rng = np.random.default_rng(71)
    frames = make_test_frames(rng, num_frames=6, h=24, w=32)
    data = encoder.encode_frames(frames, max_i_interval=3)
    want = decoder.decode_stream_array(data)
    prof = Profiler()
    pipe = DecodePipeline(
        DecodeConfig(use_pallas=True, pack_i8=True, frames_per_batch=2), prof
    )
    got = pipe.decode_array(data)
    np.testing.assert_array_equal(got, want)
    if centropy.native_available():
        # The compressed parse path actually ran.
        assert prof.report().get("parse/i8_windows", {}).get("count", 0) > 0


def test_pipeline_i8_fallback_on_wide_amps():
    # Craft a stream with AC amplitudes beyond int8: the packed parse must
    # fall back to int16 and stay bit-exact (reuses the adversarial
    # generator from test_overflow_adversarial).
    from tests_helpers_overflow import craft_wide_stream

    data, nf = craft_wide_stream(np.random.default_rng(5))
    want = decoder.decode_stream_array(data)
    pipe = DecodePipeline(
        DecodeConfig(use_pallas=True, pack_i8=True, frames_per_batch=3)
    )
    got = pipe.decode_array(data)
    np.testing.assert_array_equal(got, want)
