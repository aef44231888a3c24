"""Mesh-sharded streaming pipeline + GOP-aligned sharded batch decode.

All on the 8-device virtual CPU mesh (conftest).  Bit-exactness target is
the NumPy oracle decoder; the fused Pallas kernel runs in interpret mode.
"""
import numpy as np
import pytest

from mjpeg423_tpu.codec import decoder, encoder
from mjpeg423_tpu.parallel import decode_stream_sharded, make_mesh
from mjpeg423_tpu.runtime import DecodePipeline
from mjpeg423_tpu.utils.config import DecodeConfig

from conftest import make_test_frames


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(77)
    # 37 frames, GOP<=5: >= 8 GOPs so every device partition gets one.
    frames = make_test_frames(rng, num_frames=37, h=32, w=48)
    data = encoder.encode_frames(frames, max_i_interval=5)
    want = decoder.decode_stream_array(data)
    return data, want


def test_mesh_pipeline_xla_bit_exact(stream):
    data, want = stream
    mesh = make_mesh(n_data=8, n_block=1)
    pipe = DecodePipeline(
        DecodeConfig(frames_per_batch=3, use_pallas=False), mesh=mesh
    )
    got = pipe.decode_array(data)
    np.testing.assert_array_equal(got, want)


def test_mesh_pipeline_fused_interpret_bit_exact(stream, coef_major=None):
    data, want = stream
    mesh = make_mesh(n_data=4, n_block=1)
    # use_pallas=True on CPU -> interpret mode: the FUSED kernel itself runs
    # under shard_map on every device of the mesh.
    pipe = DecodePipeline(
        DecodeConfig(frames_per_batch=4, use_pallas=True,
                     coef_major=coef_major), mesh=mesh
    )
    got = pipe.decode_array(data)
    np.testing.assert_array_equal(got, want)


def test_mesh_pipeline_fused_interpret_bit_exact_cm(stream):
    """Coefficient-major serving layout through the mesh path (the auto
    default is block-major; cm stays covered explicitly)."""
    test_mesh_pipeline_fused_interpret_bit_exact(stream, coef_major=True)


def test_mesh_pipeline_seek(stream):
    data, want = stream
    import mjpeg423_tpu.core.format as fmt

    mesh = make_mesh(n_data=4, n_block=1)
    starts = fmt.index_frames(data).gop_starts()
    s = starts[2]
    pipe = DecodePipeline(
        DecodeConfig(frames_per_batch=3, use_pallas=False), mesh=mesh
    )
    got = pipe.decode_array(data, start_frame=s)
    np.testing.assert_array_equal(got, want[s:])


def test_mesh_pipeline_more_devices_than_gops():
    rng = np.random.default_rng(8)
    frames = make_test_frames(rng, num_frames=9, h=16, w=16)
    data = encoder.encode_frames(frames, max_i_interval=4)  # 3 GOPs < 8 dev
    want = decoder.decode_stream_array(data)
    mesh = make_mesh(n_data=8, n_block=1)
    pipe = DecodePipeline(
        DecodeConfig(frames_per_batch=2, use_pallas=False), mesh=mesh
    )
    got = pipe.decode_array(data)
    np.testing.assert_array_equal(got, want)


def test_mesh_pipeline_rejects_block_axis(stream):
    data, _ = stream
    mesh = make_mesh(n_data=4, n_block=2)
    pipe = DecodePipeline(DecodeConfig(use_pallas=False), mesh=mesh)
    with pytest.raises(ValueError):
        list(pipe.decode(data))


def test_sharded_batch_gop_aligned_auto(stream):
    """decode_stream_sharded auto-selects the GOP-aligned partitioning and
    stays bit-exact (XLA path)."""
    data, want = stream
    mesh = make_mesh(n_data=8, n_block=1)
    got = np.asarray(decode_stream_sharded(data, mesh))
    np.testing.assert_array_equal(got, want)


def test_sharded_batch_gop_aligned_fused(stream):
    """The fused kernel under shard_map via the GOP-aligned batch driver."""
    data, want = stream
    mesh = make_mesh(n_data=4, n_block=1)
    got = np.asarray(
        decode_stream_sharded(data, mesh, use_pallas=True, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_sharded_batch_delegates_to_streaming_pipeline(stream, monkeypatch):
    """The GOP-aligned data-axis case streams through the mesh pipeline:
    every parse is a bounded window, never the whole stream (VERDICT r2
    weak #3 — peak host RSS must be O(windows))."""
    from mjpeg423_tpu.runtime.pipeline import DecodePipeline

    # 2 devices over 96 frames: partitions are ~48 frames, WIDER than the
    # pipeline's window — so a per-partition whole-range parse (the old
    # staging) is distinguishable from true windowing.
    rng = np.random.default_rng(31)
    frames = make_test_frames(rng, num_frames=96, h=24, w=32)
    data = encoder.encode_frames(frames, max_i_interval=6)
    want = decoder.decode_stream_array(data)
    mesh = make_mesh(n_data=2, n_block=1)
    counts = []
    orig = DecodePipeline.parse_window

    def spy(self, d, index, start, count, *a, **kw):
        counts.append(count)
        return orig(self, d, index, start, count, *a, **kw)

    monkeypatch.setattr(DecodePipeline, "parse_window", spy)
    got = np.asarray(decode_stream_sharded(data, mesh))
    np.testing.assert_array_equal(got, want)
    assert counts, "delegation did not reach the pipeline parse"
    from mjpeg423_tpu.utils.config import DecodeConfig

    w = DecodeConfig().frames_per_batch
    assert max(counts) <= w < want.shape[0] // 2, (
        f"parse staged {max(counts)} frames at once — the batch wrapper "
        f"must stage per-window (<= {w})"
    )


def test_sharded_batch_carry_path_still_works(stream):
    """Forcing gop_aligned=False exercises the cross-device carry."""
    data, want = stream
    mesh = make_mesh(n_data=4, n_block=2)
    got = np.asarray(
        decode_stream_sharded(data, mesh, gop_aligned=False)
    )
    np.testing.assert_array_equal(got, want)


def test_sharded_encode_byte_identical(stream):
    """The mesh-sharded encoder (frames over "data", one ppermute halo for
    the P candidates) produces byte-identical containers."""
    rng = np.random.default_rng(90)
    frames = make_test_frames(rng, num_frames=13, h=24, w=32)
    want = encoder.encode_frames_device(frames, max_i_interval=4)
    mesh = make_mesh(n_data=8, n_block=1)  # 13 frames pad to 16
    got = encoder.encode_frames_device(frames, max_i_interval=4, mesh=mesh)
    assert got == want
    # and it still decodes bit-exact
    np.testing.assert_array_equal(
        decoder.decode_stream_array(got), decoder.decode_stream_array(want)
    )


def test_sharded_carry_path_with_pallas_transform(stream):
    """Non-GOP-aligned sharding + the v1 Pallas transform (interpret):
    the cross-device carry all-gather composed with the pallas kernel."""
    data, want = stream
    mesh = make_mesh(n_data=2, n_block=1)
    got = np.asarray(decode_stream_sharded(
        data, mesh, gop_aligned=False, use_pallas=True, interpret=True
    ))
    np.testing.assert_array_equal(got, want)


def test_mesh_pipeline_early_stop_reaps_producer(stream):
    import threading
    import time as _time

    data, _ = stream
    base = threading.active_count()
    mesh = make_mesh(n_data=4, n_block=1)
    pipe = DecodePipeline(
        DecodeConfig(use_pallas=False, frames_per_batch=2,
                     prefetch_batches=1),
        mesh=mesh,
    )
    gen = pipe.decode(data)
    next(gen)
    gen.close()
    _time.sleep(0.2)
    assert threading.active_count() <= base + 1


def test_mesh_step_fold_matches_pipeline_window():
    """Regression (round-2 review): the mesh step's lane fold must come
    from the configured window, not the default — at (bh=20, bw=48) the
    fold differs between W=16 and W=24, which crashed the TPU mesh path
    at trace time."""
    import jax
    import jax.numpy as jnp

    from mjpeg423_tpu.runtime.pipeline import auto_rows_per_step

    bh, bw = 20, 48
    kk = auto_rows_per_step(bh, bw, 16)
    assert kk != auto_rows_per_step(bh, bw, 24)

    mesh = make_mesh(n_data=1, n_block=1)
    pipe = DecodePipeline(
        DecodeConfig(frames_per_batch=16, use_pallas=True), mesh=mesh
    )
    step = pipe._get_mesh_step(bh, bw, "cm")
    amps = jnp.zeros((1, 3, 16, bh // kk, 64, kk * bw), jnp.int16)
    seg = jnp.zeros((1, 16), bool)
    carry = jnp.zeros((1, 3, bh // kk, 64, kk * bw), jnp.int16)
    jax.eval_shape(step, amps, seg, carry)  # raises if the folds disagree


def test_mesh_pipeline_long_stream_soak():
    """600-frame stream through the mesh pipeline: bit-exact, windows per
    partition bounded (no whole-stream materialization path regression)."""
    rng = np.random.default_rng(99)
    yy, xx = np.mgrid[0:16, 0:16]
    frames = []
    for t in range(600):
        f = np.stack(
            [(xx * 4 + t) % 256, (yy * 4 + 2 * t) % 256, (xx + yy + 3 * t) % 256],
            axis=-1,
        ).astype(np.uint8)
        frames.append(f)
    data = encoder.encode_frames_device(frames, max_i_interval=12)
    want = decoder.decode_stream_array(data)
    mesh = make_mesh(n_data=8, n_block=1)
    pipe = DecodePipeline(
        DecodeConfig(frames_per_batch=8, prefetch_batches=1,
                     use_pallas=False),
        mesh=mesh,
    )
    got = pipe.decode_array(data)
    np.testing.assert_array_equal(got, want)


def test_sharded3_stacked_input_bit_exact(stream):
    """The stacked-input fused sharded entry (no per-shard plane re-stack)
    matches the oracle."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mjpeg423_tpu.parallel import decode_transform_sharded3
    from mjpeg423_tpu.parallel.mesh import DATA_AXIS, BLOCK_AXIS
    from mjpeg423_tpu.parallel.multihost import partition_gops
    import mjpeg423_tpu.core.format as fmt
    from mjpeg423_tpu.runtime import DecodePipeline
    from mjpeg423_tpu.utils.config import DecodeConfig

    data, want = stream
    index = fmt.index_frames(data)
    nf = index.num_frames
    mesh = make_mesh(n_data=4, n_block=1)
    parts = partition_gops(index.gop_starts(), nf, 4)
    fmax = max(p.num_frames for p in parts)
    nb = index.header.blocks_per_plane
    pipe = DecodePipeline(DecodeConfig(coef_major=False))
    amps = np.zeros((3, 4 * fmax, nb, 64), np.int16)
    seg = np.zeros(4 * fmax, bool)
    for p in parts:
        local = pipe.parse_window(data, index, p.frame_lo, p.num_frames)
        amps[:, p.host * fmax:p.host * fmax + p.num_frames] = local
        seg[p.host * fmax:p.host * fmax + p.num_frames] = (
            index.is_iframe[p.frame_lo:p.frame_hi]
        )
    a3 = jax.device_put(amps, NamedSharding(
        mesh, P(None, DATA_AXIS, BLOCK_AXIS, None)))
    seg_d = jax.device_put(seg, NamedSharding(mesh, P(DATA_AXIS)))
    blocked = np.asarray(decode_transform_sharded3(
        a3, seg_d, mesh=mesh, blocks_h=index.header.blocks_h,
        blocks_w=index.header.blocks_w, interpret=True, raster=False,
    ))
    from mjpeg423_tpu.ops.transform_fused import blocked_to_raster_host

    raster = blocked_to_raster_host(
        blocked, index.header.blocks_h, index.header.blocks_w
    )
    for p in parts:
        np.testing.assert_array_equal(
            raster[p.host * fmax:p.host * fmax + p.num_frames],
            want[p.frame_lo:p.frame_hi],
        )
