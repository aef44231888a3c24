"""Fused Pallas encode transform (ops/encode_fused.py) bit-exactness.

Runs in interpret mode on the CPU test backend (tests/conftest.py forces
JAX_PLATFORMS=cpu); scripts/tpu_check.py re-validates on hardware.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mjpeg423_tpu.codec import encoder as enc
from mjpeg423_tpu.core import tables as T
from mjpeg423_tpu.ops import encode_ref
from mjpeg423_tpu.ops.encode_fused import encode_window_fused


def _ref_quantize(samples, quant64):
    coefs = encode_ref.fdct_blocks(samples).reshape(-1, 64)
    return encode_ref.quantize_blocks(coefs, quant64)


@pytest.mark.parametrize("bh,bw,W,k", [(4, 6, 2, 1), (6, 8, 3, 3), (1, 2, 1, 1)])
def test_kernel_matches_reference_fdct_quant(rng, bh, bw, W, k):
    B = bh * bw
    s = rng.integers(0, 256, (3, W, B, 64)).astype(np.uint8)
    out = np.asarray(encode_window_fused(
        jnp.asarray(s), blocks_h=bh, blocks_w=bw, rows_per_step=k
    ))
    for p in range(3):
        qt = T.YQUANT64 if p == 0 else T.CQUANT64
        for f in range(W):
            expect = _ref_quantize(s[p, f].reshape(B, 8, 8), qt)
            np.testing.assert_array_equal(out[p, f], expect)


def test_kernel_extreme_samples():
    """All-0 / all-255 / checkerboard blocks hit the butterflies' extreme
    intermediate ranges and the quantizer's fixup paths."""
    B = 4
    s = np.zeros((3, 1, B, 64), np.uint8)
    s[0, 0, 0] = 255
    s[1, 0, 1] = np.tile([0, 255] * 4, 8)
    s[2, 0, 2] = np.repeat([255, 0] * 4, 8)
    out = np.asarray(encode_window_fused(jnp.asarray(s), blocks_h=2, blocks_w=2))
    for p in range(3):
        qt = T.YQUANT64 if p == 0 else T.CQUANT64
        np.testing.assert_array_equal(
            out[p, 0], _ref_quantize(s[p, 0].reshape(B, 8, 8), qt)
        )


def test_encode_frames_device_pallas_container_identical(rng):
    """The full device encoder with the fused kernel produces a container
    byte-identical to the host encoder (shared select-then-pack back half),
    across a window boundary and with both I and P frames."""
    h, w = 24, 32
    base = rng.integers(80, 170, (h, w, 3)).astype(np.uint8)
    frames = [base]
    for i in range(6):
        f = frames[-1].copy()
        f[(i * 8) % h:(i * 8) % h + 8] += rng.integers(
            0, 5 + 30 * (i % 3 == 0), (8, w, 3)
        ).astype(np.uint8)
        frames.append(f)
    from mjpeg423_tpu.utils.config import EncodeConfig

    cfg = EncodeConfig(frames_per_batch=3)  # forces multiple windows
    a = enc.encode_frames(frames, max_i_interval=4)
    b = enc.encode_frames_device(
        frames, max_i_interval=4, config=cfg, use_pallas=True
    )
    assert a == b


def test_encode_window_fused_sharded_and_mesh_device_encoder(rng):
    """The sharded fused encode (frames over "data", ZERO collectives)
    matches the single-device kernel elementwise, and the mesh device
    encoder built on it produces a byte-identical container."""
    from mjpeg423_tpu.parallel.encode import encode_window_fused_sharded
    from mjpeg423_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8, n_block=1)
    bh, bw, F = 3, 4, 8
    B = bh * bw
    s = rng.integers(0, 256, (3, F, B, 64)).astype(np.uint8)
    single = np.asarray(encode_window_fused(
        jnp.asarray(s), blocks_h=bh, blocks_w=bw
    ))
    sharded = np.asarray(encode_window_fused_sharded(
        jnp.asarray(s), mesh=mesh, blocks_h=bh, blocks_w=bw, interpret=True
    ))
    np.testing.assert_array_equal(sharded, single)

    h, w = bh * 8, bw * 8
    base = rng.integers(80, 170, (h, w, 3)).astype(np.uint8)
    frames = [base]
    for i in range(9):
        f = frames[-1].copy()
        f[(i * 8) % h:(i * 8) % h + 8] += rng.integers(
            0, 5 + 30 * (i % 3 == 0), (8, w, 3)
        ).astype(np.uint8)
        frames.append(f)
    a = enc.encode_frames(frames, max_i_interval=4)
    b = enc.encode_frames_device(
        frames, max_i_interval=4, mesh=mesh, use_pallas=True
    )
    assert a == b


def test_pallas_encoded_container_decodes_on_reference(rng):
    """Cross-check: a container produced by the fused device encoder decodes
    byte-identically on the COMPILED REFERENCE C decoder (closing the loop
    device-encode -> reference-decode, not just container equality)."""
    from tests.oracle import harness

    if not harness.oracle_available():
        pytest.skip("reference tree or gcc unavailable")
    h, w, F = 48, 64, 6
    frames = [
        rng.integers(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(F)
    ]
    mpg = enc.encode_frames_device(frames, max_i_interval=3, use_pallas=True)
    from mjpeg423_tpu.codec.decoder import decode_stream_array

    ours = np.asarray(decode_stream_array(mpg))
    ref = np.asarray(harness.Oracle().decode(mpg, F, w, h))
    np.testing.assert_array_equal(ours, ref)


def test_encode_frames_device_overlap_identical_and_propagates(rng):
    """The overlapped device-encode pipeline (producer thread converts +
    dispatches + posts async D2H while the packer consumes in order) is
    byte-identical to the strict sequential path, and a producer fault
    (bad frame shape mid-clip) surfaces in the caller, not a hang."""
    h, w = 24, 32
    frames = [rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
              for _ in range(7)]
    from mjpeg423_tpu.utils.config import EncodeConfig

    seq = enc.encode_frames_device(
        frames, max_i_interval=4, use_pallas=True,
        config=EncodeConfig(frames_per_batch=3, overlap_device=False),
    )
    for inflight in (1, 3):
        ov = enc.encode_frames_device(
            frames, max_i_interval=4, use_pallas=True,
            config=EncodeConfig(frames_per_batch=3, overlap_device=True,
                                inflight_windows=inflight),
        )
        assert ov == seq, f"inflight={inflight} diverges"

    bad = frames[:4] + [rng.integers(0, 256, (h, w + 8, 3)).astype(np.uint8)]
    with pytest.raises(Exception):
        enc.encode_frames_device(
            bad, max_i_interval=4, use_pallas=True,
            config=EncodeConfig(frames_per_batch=2, overlap_device=True),
        )


def test_encode_frames_device_overlap_consumer_abort(rng):
    """A fault on the CONSUMER side (entropy packer raising mid-clip)
    must tear the producer thread down promptly — the finally sets the
    stop flag and joins; a blocking slot-pool/queue put would hang."""
    import threading

    h, w = 24, 32
    frames = [rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
              for _ in range(9)]
    calls = {"n": 0}

    def bad_pack(coeffs):
        calls["n"] += 1
        if calls["n"] > 7:  # mid-stream, after a couple of windows
            raise RuntimeError("packer fault")
        from mjpeg423_tpu.native import centropy
        return centropy.encode_plane(coeffs)

    from mjpeg423_tpu.utils.config import EncodeConfig

    with pytest.raises(RuntimeError, match="packer fault"):
        enc.encode_frames_device(
            frames, max_i_interval=4, use_pallas=True,
            entropy_encode=bad_pack,
            config=EncodeConfig(frames_per_batch=2, overlap_device=True),
        )

    def producer_alive():
        # Assert on the NAMED thread: raw active_count() is flaky against
        # unrelated thread churn (JAX/XLA spawn persistent workers).
        return any(t.name == "mj-encode-producer" and t.is_alive()
                   for t in threading.enumerate())

    import time as _time
    deadline = _time.time() + 30
    while producer_alive() and _time.time() < deadline:
        _time.sleep(0.05)
    assert not producer_alive(), "producer thread leaked"


def test_encode_frames_device_fetch_i8_identical(rng):
    """fetch_i8 (device-side narrowing of quantized planes before D2H)
    is byte-identical to the full int16 fetch — including when a window
    OVERFLOWS int8 and the per-window flag falls back to the full fetch."""
    from mjpeg423_tpu.utils.config import EncodeConfig

    h, w = 24, 32
    frames = [rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
              for _ in range(5)]
    # Worst-case-ish content: hard edges + a pure (0,1)-basis cosine.
    edge = np.zeros((h, w, 3), np.uint8)
    edge[:, ::2] = 255
    frames[3] = edge

    base = enc.encode_frames_device(
        frames, max_i_interval=4, use_pallas=True,
        config=EncodeConfig(frames_per_batch=2, overlap_device=True))
    for overlap in (False, True):
        got = enc.encode_frames_device(
            frames, max_i_interval=4, use_pallas=True,
            config=EncodeConfig(frames_per_batch=2, overlap_device=overlap,
                                fetch_i8=True))
        assert got == base, f"fetch_i8 diverges (overlap={overlap})"

    # The per-window overflow fallback exists as an invariant guard, but
    # quantized AC from uint8 RGB cannot exceed int8: the FDCT's x8
    # output scale and the minimum AC quant (10) bound |AC| <= ~84 even
    # for a pure cosine at the lowest-quant frequency (measured; a hard
    # edge reaches 84, iid noise 16).  Verify the bound holds on the
    # nastiest frames so the packed path is the always-path.
    from mjpeg423_tpu.codec.encoder import _Quantizer
    q3 = _Quantizer().quantize(edge)
    assert (np.abs(q3[..., 1:]) <= 127).all()
