"""Shared generator for wide-amplitude (beyond int8) adversarial streams."""
import numpy as np

from mjpeg423_tpu.core.format import Frame, serialize_file
from mjpeg423_tpu.ops import entropy_ref

H = W = 16
NB = (H // 8) * (W // 8)


def craft_wide_stream(rng, num_frames=5):
    frames = []
    for fi in range(num_frames):
        is_p = fi != 0
        planes = []
        for _ in range(3):
            amps = rng.integers(-2047, 2048, size=(NB, 64)).astype(np.int16)
            if not is_p:
                d = amps.copy()
                d[1:, 0] = (amps[1:, 0] - amps[:-1, 0]).astype(np.int16)
                enc = entropy_ref.encode_plane(d)
            else:
                enc = entropy_ref.encode_plane(amps)
            planes.append(enc)
        frames.append(Frame(1 if is_p else 0, *planes))
    return serialize_file(W, H, frames), num_frames
