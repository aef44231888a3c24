"""Multi-chip decode example: every sharding mode on a virtual 8-chip mesh.

Run: python examples/sharded_decode.py   (CPU: forces an 8-device virtual
mesh; on a real TPU slice, drop the two config lines and the same code
shards over the physical chips.)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from mjpeg423_tpu.codec.decoder import decode_stream_array
from mjpeg423_tpu.codec.encoder import encode_frames
from mjpeg423_tpu.parallel import decode_stream_sharded, make_mesh
from mjpeg423_tpu.runtime import DecodePipeline
from mjpeg423_tpu.runtime.serve import StreamPool
from mjpeg423_tpu.utils.config import DecodeConfig


def synthesize(num_frames, h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(num_frames):
        f = np.stack(
            [(xx * 2 + t * 9) % 256, (yy * 3) % 256, ((xx + yy) + t * 4) % 256],
            axis=-1,
        ).astype(np.uint8)
        f = np.clip(
            f.astype(int) + rng.integers(0, 8, f.shape), 0, 255
        ).astype(np.uint8)
        out.append(f)
    return out


def main():
    data = encode_frames(synthesize(48), max_i_interval=6)
    want = decode_stream_array(data)
    print(f"stream: {len(data)} bytes, {want.shape[0]} frames "
          f"{want.shape[2]}x{want.shape[1]}, {len(jax.devices())} devices")

    # Mode 1: streams over chips (serving) — 8 copies of the stream,
    # one pinned pipeline per device.
    pool = StreamPool(DecodeConfig(use_pallas=False), devices=jax.devices())
    stats = pool.decode_all([data] * 8, max_concurrent=8)
    print(f"mode 1 streams-over-chips: {stats.frames} frames, "
          f"{stats.frames_per_s:.0f} frames/s aggregate")

    # Mode 2: one stream's GOPs over chips, streaming.
    mesh = make_mesh(n_data=8, n_block=1)
    pipe = DecodePipeline(
        DecodeConfig(frames_per_batch=3, use_pallas=False), mesh=mesh
    )
    got = pipe.decode_array(data)
    assert (got == want).all()
    print("mode 2 gop-sharded streaming: bit-exact on the 8-device mesh")

    # Mode 3: batch decode, auto GOP-aligned partitioning.
    got = np.asarray(decode_stream_sharded(data, mesh))
    assert (got == want).all()
    print("mode 3 gop-aligned batch: bit-exact")


if __name__ == "__main__":
    main()
