"""Memory-safety fuzz: random garbage into the native decoders must never
crash the process (return codes or junk data are both acceptable — the C
code bounds-checks the zig-zag index where the reference would write OOB)."""
import numpy as np
import pytest

from mjpeg423_tpu.native import centropy

pytestmark = pytest.mark.skipif(
    not centropy.native_available(), reason="no native codec"
)


def test_decode_plane_random_garbage():
    rng = np.random.default_rng(123)
    for n in range(300):
        blob = rng.integers(0, 256, size=rng.integers(0, 200)).astype(np.uint8)
        try:
            out = centropy.decode_plane(blob.tobytes(), 16, bool(n % 2))
            assert out.shape == (16, 64)
        except ValueError:
            pass  # corrupt-stream rejection is fine


def test_decode_batch_cm_random_garbage():
    rng = np.random.default_rng(321)
    blobs = [rng.integers(0, 256, size=64).astype(np.uint8).tobytes()
             for _ in range(6)]
    data = b"".join(blobs)
    lengths = np.array([len(b) for b in blobs], dtype=np.uint64)
    offsets = np.zeros(6, dtype=np.uint64)
    offsets[1:] = np.cumsum(lengths)[:-1]
    is_p = np.zeros(6, dtype=np.uint8)
    try:
        out = centropy.decode_batch_cm(data, offsets, lengths, is_p, 8, 4)
        assert out is None or out.shape == (6, 2, 64, 4)
    except ValueError:
        pass


def test_index_frames_truncated_inputs():
    for size in (0, 3, 15, 16, 17):
        blob = b"\x10" * size
        with pytest.raises(ValueError):
            centropy.index_frames(blob, 0, 2)
