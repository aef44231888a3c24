"""On-hardware validation: the production decode paths, bit-exact on TPU.

The pytest suite forces the CPU backend (virtual 8-device mesh); this
script is the real-chip counterpart — run it on a TPU host after changes
to the kernels or sharding code:

    python scripts/tpu_check.py

Covers: single-device pipeline (fused cm auto), mesh streaming pipeline
(fused kernel under shard_map), GOP-aligned sharded batch driver — each
byte-compared against the NumPy oracle decoder — plus the fused device
ENCODER (FDCT+quantize kernel) byte-compared against the host encoder's
container.  First compiles take minutes on a cold cache.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax


def main() -> int:
    print("backend:", jax.default_backend(), flush=True)
    from mjpeg423_tpu.codec import decoder, encoder
    from mjpeg423_tpu.parallel import decode_stream_sharded, make_mesh
    from mjpeg423_tpu.runtime import DecodePipeline
    from mjpeg423_tpu.utils.config import DecodeConfig

    rng = np.random.default_rng(55)
    frames = [
        rng.integers(0, 256, (64, 96, 3)).astype(np.uint8) for _ in range(12)
    ]
    data = encoder.encode_frames(frames, max_i_interval=4)
    want = decoder.decode_stream_array(data)

    pipe = DecodePipeline(DecodeConfig(frames_per_batch=4))
    assert (pipe.decode_array(data) == want).all(), "single-device mismatch"
    print("single-device pipeline (fused cm auto): bit-exact", flush=True)

    mesh = make_mesh(n_data=len(jax.devices()), n_block=1)
    mpipe = DecodePipeline(
        DecodeConfig(frames_per_batch=4, use_pallas=True), mesh=mesh
    )
    assert (mpipe.decode_array(data) == want).all(), "mesh pipeline mismatch"
    print(f"mesh pipeline (fused, shard_map, {len(jax.devices())} dev): "
          "bit-exact", flush=True)

    got = np.asarray(
        decode_stream_sharded(data, mesh, gop_aligned=True, use_pallas=True)
    )
    assert (got == want).all(), "sharded batch mismatch"
    print("decode_stream_sharded (fused, gop-aligned): bit-exact", flush=True)

    dev = encoder.encode_frames_device(frames, max_i_interval=4,
                                       use_pallas=True)
    assert dev == data, "fused device encoder container mismatch"
    print("encode_frames_device (fused FDCT+quantize): byte-identical",
          flush=True)
    print("ALL TPU CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
