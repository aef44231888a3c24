"""Multi-stream serving pool vs per-stream oracle decode."""
import numpy as np
import pytest

from mjpeg423_tpu.codec import decoder, encoder
from mjpeg423_tpu.runtime.serve import StreamPool
from mjpeg423_tpu.utils.config import DecodeConfig

from conftest import make_test_frames


def test_pool_decodes_concurrent_streams_bit_exact():
    rng = np.random.default_rng(21)
    streams, oracles = [], []
    for k in range(3):
        frames = make_test_frames(rng, num_frames=6 + k, h=32, w=48)
        data = encoder.encode_frames(frames, max_i_interval=4)
        streams.append(data)
        oracles.append(decoder.decode_stream_array(data))

    got = {i: {} for i in range(len(streams))}

    def sink(si, win):
        for j in range(win.count):
            got[si][win.start_frame + j] = win.frames[j]

    pool = StreamPool(DecodeConfig(frames_per_batch=4, use_pallas=False))
    stats = pool.decode_all(streams, sink=sink, max_concurrent=2)

    assert stats.streams == 3
    assert stats.frames == sum(o.shape[0] for o in oracles)
    assert stats.pixels == sum(o.shape[0] * o.shape[1] * o.shape[2] for o in oracles)
    for si, want in enumerate(oracles):
        assert len(got[si]) == want.shape[0]
        for fi, fr in got[si].items():
            np.testing.assert_array_equal(fr, want[fi])
