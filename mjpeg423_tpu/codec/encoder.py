"""MJPEG423 stream encoder — generates byte-exact .MPG containers.

End-to-end port of the reference encoder's pipeline and frame-type selection
logic (reference: encoder/mjpeg423_encoder.c:18-231):

  per frame: RGB -> YCbCr -> FDCT -> quantize as I *and* (if not first) as P
  -> entropy-encode both candidates -> pick the smaller, forcing I at frame 0
  and at least every `max_i_interval` frames -> write frame + trailer entry.

The quantized-state bookkeeping collapses to: prev_state = round(coef/quant)
for every frame regardless of which candidate wins (the reference's
prev/next buffer swap dance, mjpeg423_encoder.c:154-185, is pointer management
around exactly this invariant — quantize_P updates the reference in place with
the same rounded values quantize_I snapshots into DCACq_next).

Primarily a test-corpus generator (the reference encoder never ran on the
FPGA either: sample_main.c is compiled out), but fully functional.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from ..core import tables as T
from ..core.format import (
    FILE_HEADER_BYTES,
    FRAME_HEADER_BYTES,
    PAD512,
    FileHeader,
    Frame,
    _U32x2,
    _U32x4,
    serialize_file,
)
from ..native import centropy
from ..ops import encode_ref, entropy_ref
from ..ops.transform_ref import raster_to_blocks
from ..utils.config import EncodeConfig
from ..utils.profile import default_profiler


def _resolve_entropy_encode(
    entropy_encode: Callable[[np.ndarray], bytes] | None,
    config: EncodeConfig | None,
) -> Callable[[np.ndarray], bytes]:
    """Default bit-packer: the native C encoder (which itself falls back to
    the Python oracle when the shared library is unavailable) — the
    reference compiles its encoder into every app (core0 Makefile:145-164),
    so the fast path is the default here too."""
    if entropy_encode is not None:
        return entropy_encode
    if (config or EncodeConfig()).use_native_entropy:
        from ..native import centropy

        return centropy.encode_plane
    return entropy_ref.encode_plane


def _rgb_to_blocked_planes(
    rgb: np.ndarray, scratch: dict | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(H, W, 3) uint8 -> (y, cb, cr) blocked (B, 8, 8) uint8 planes.

    Native one-pass OpenMP conversion when available (bit-exact with the
    NumPy reference doubles — see centropy.c mj423_rgb_to_ycbcr_blocked);
    NumPy chain + blocking otherwise.  With scratch, the returned planes
    are reused (overwritten) by the next same-scratch call.
    """
    rgb = np.asarray(rgb, dtype=np.uint8)
    native = centropy.rgb_to_ycbcr_blocked(rgb, scratch)
    if native is not None:
        return native
    y, cb, cr = encode_ref.rgb_to_ycbcr_frame(rgb)
    return raster_to_blocks(y), raster_to_blocks(cb), raster_to_blocks(cr)


class FramePacker:
    """One-frame-at-a-time candidate coding + smaller-wins packing.

    The stateful back half of the encoder — quantize both candidates'
    entropy codings, pick the smaller (forcing I at frame 0 and at least
    every max_i_interval frames), emit the frame's final container bytes
    (reference: mjpeg423_encoder.c:154-201) — factored to a push-style
    object so the stored encoder (encode_quantized_frames) and the live
    encoder (LiveEncoder) share one implementation.

    State across calls: the previous frame's absolute quantized planes
    (ping-pong contract: the caller may reuse the array it passed, but only
    two calls later — pack() reads one frame back), the last I-frame
    index, and the native packer's scratch workspace.
    """

    def __init__(
        self,
        max_i_interval: int | None = None,
        entropy_encode: Callable[[np.ndarray], bytes] | None = None,
        config: EncodeConfig | None = None,
        exact_tail: bool = False,
        profiler=None,
        strict_range: bool = False,
    ):
        config = config or EncodeConfig()
        self._prof = profiler or default_profiler
        self.max_i_interval = (
            config.max_i_interval if max_i_interval is None else max_i_interval
        )
        entropy_encode = _resolve_entropy_encode(entropy_encode, config)
        self._use_native = (
            entropy_encode is centropy.encode_plane
            and centropy.native_available()
        )
        if exact_tail and not self._use_native:
            if entropy_encode not in (
                centropy.encode_plane, entropy_ref.encode_plane
            ):
                raise ValueError(
                    "exact_tail requires the default entropy packers"
                )
            # Python oracle with the exact-tail writer (bit-identical to
            # the native path; only the final partial byte differs from
            # quirk mode).
            def entropy_encode(c, _f=entropy_ref.encode_plane):
                return _f(c, exact_tail=True)
        self._entropy_encode = entropy_encode
        self._exact_tail = exact_tail
        self._strict_range = strict_range
        self._scratch: dict = {}
        self._prev_q3: np.ndarray | None = None
        self._last_iframe = 0
        self._fi = 0

    def _raise_clamped(self):
        raise ValueError(
            f"frame {self._fi}: values exceed the VLI 11-bit range "
            "(|v| > 2047) — the format clamps these (lossy); "
            "refusing strict_range encode"
        )

    def pack(self, q3: np.ndarray):
        """Pack one frame's absolute quantized planes (3, B, 64) int16.

        Returns (is_iframe, packed) where packed is the frame's complete
        container bytes — 16-byte header, winning candidate's three plane
        bitstreams, 4-byte alignment pad (a uint8 ndarray on the native
        path, bytes on the fallback; both buffer-protocol writable).
        """
        if self._use_native:
            out = self._pack_native(q3)
        else:
            out = self._pack_fallback(q3)
        self._prev_q3 = q3
        self._fi += 1
        return out

    def _pack_native(self, q3):
        # Select-then-pack with zero-copy frame assembly: exact candidate
        # byte sizes come from a size-only symbol scan (no bit writer), the
        # smaller-wins rule (mjpeg423_encoder.c:154-185) picks the frame
        # type from sizes alone, and only the winning candidate is packed —
        # directly into the frame's final container bytes (the tail-exact
        # bit appender never stores outside a plane's span, so the 16-byte
        # header and alignment pad written here are never clobbered).  The
        # losing pack, the per-plane blobs, and the serialize-time join all
        # disappear; sizes == pack lengths is enforced both by the packer
        # (RuntimeError) and tests/test_native.py.
        fi, prev_q3 = self._fi, self._prev_q3
        with self._prof.time("encode/sizes"):
            if self._strict_range:
                sizes, clamped = centropy.candidate_sizes(
                    q3, prev_q3, want_clamped=True
                )
            else:
                sizes = centropy.candidate_sizes(q3, prev_q3)
        size_i = sum(sizes[:3])
        size_p = sum(sizes[3:]) if prev_q3 is not None else None
        pick_i = (
            fi == 0
            or size_p is None
            or size_i <= size_p
            or fi - self._last_iframe >= self.max_i_interval
        )
        if self._strict_range and any(
            clamped[:3] if pick_i else clamped[3:]
        ):
            self._raise_clamped()
        psz = sizes[:3] if pick_i else sizes[3:]
        raw = FRAME_HEADER_BYTES + psz[0] + psz[1] + psz[2]
        frame_size = raw + (-raw) % 4
        buf = np.empty(frame_size, np.uint8)
        _U32x4.pack_into(
            buf, 0, frame_size,
            T.FRAME_TYPE_I if pick_i else T.FRAME_TYPE_P,
            psz[0], psz[1],
        )
        buf[raw:] = 0  # 4-byte alignment pad (encoder.c:187-201)
        offs = (
            FRAME_HEADER_BYTES,
            FRAME_HEADER_BYTES + psz[0],
            FRAME_HEADER_BYTES + psz[0] + psz[1],
        )
        with self._prof.time("encode/pack"):
            centropy.encode_candidates_into(
                q3, None if pick_i else prev_q3, buf, offs, psz,
                self._scratch, self._exact_tail, which=1 if pick_i else 2,
            )
        if pick_i:
            self._last_iframe = fi
        return pick_i, buf

    def _pack_fallback(self, q3):
        fi, prev_q3 = self._fi, self._prev_q3
        entropy_encode = self._entropy_encode
        bits_i: dict[str, bytes] = {}
        bits_p: dict[str, bytes | None] = {}
        clamp_i = clamp_p = False
        for i, name in enumerate(("y", "cb", "cr")):
            # Difference once; the clamp test and the entropy pack share
            # the same tensors (recomputing them doubled the dominant
            # numpy work of this fallback path).
            di = encode_ref.diff_dc_i(q3[i])
            dp = (
                encode_ref.diff_p(q3[i], prev_q3[i])
                if prev_q3 is not None else None
            )
            if self._strict_range:
                clamp_i = clamp_i or int(np.abs(di).max(initial=0)) > 2047
                if dp is not None:
                    clamp_p = clamp_p or int(np.abs(dp).max(initial=0)) > 2047
            bits_i[name] = entropy_encode(di)
            bits_p[name] = entropy_encode(dp) if dp is not None else None

        size_i = sum(len(b) for b in bits_i.values())
        size_p = (
            sum(len(b) for b in bits_p.values() if b is not None)
            if prev_q3 is not None
            else None
        )
        # Frame-type selection (reference: mjpeg423_encoder.c:155-157)
        pick_i = (
            fi == 0
            or size_p is None
            or size_i <= size_p
            or fi - self._last_iframe >= self.max_i_interval
        )
        if self._strict_range and (clamp_i if pick_i else clamp_p):
            self._raise_clamped()
        if pick_i:
            self._last_iframe = fi
            fr = Frame(
                T.FRAME_TYPE_I, bits_i["y"], bits_i["cb"], bits_i["cr"]
            )
        else:
            fr = Frame(
                T.FRAME_TYPE_P, bits_p["y"], bits_p["cb"], bits_p["cr"]  # type: ignore[arg-type]
            )
        return pick_i, fr.pack()


def encode_quantized_frames(
    q3_frames,
    width: int,
    height: int,
    max_i_interval: int | None = None,
    entropy_encode: Callable[[np.ndarray], bytes] | None = None,
    config: EncodeConfig | None = None,
    exact_tail: bool = False,
    profiler=None,
    strict_range: bool = False,
) -> bytes:
    """Pack absolute quantized planes into an .MPG container.

    q3_frames: iterable of (3, B, 64) int16 arrays — per frame the ABSOLUTE
    quantized Y/Cb/Cr planes (natural order, absolute per-block DC), i.e.
    exactly the encoder's round(coef/quant) state.  This is the shared back
    half of the encoder (candidate coding + smaller-wins frame-type
    selection, reference mjpeg423_encoder.c:154-185); encode_frames feeds
    it from RGB via FDCT, codec/transcode.py feeds it from an existing
    stream's entropy-parsed amplitude state (lossless re-GOP).

    A yielded array may be reused (ping-ponged) by the producer: only the
    immediately previous frame is read back, never older ones.

    exact_tail: write each plane's true final partial byte instead of the
    reference encoder's 0x00 output_rest quirk (which silently drops up to
    7 tail bits when the last block is dense).  Only valid with the default
    packers; the transcoder passes True so re-GOP stays lossless on ALL
    content.

    strict_range: raise ValueError if any value of the CHOSEN candidate
    exceeds the VLI's 11-bit range (|v| > 2047) — the format clamps such
    values (reference encode_VLI, lossless_encode.c:121-138), which is
    lossy.  Unreachable from the RGB encoder on valid input; the
    transcoder passes True so a corrupt/extreme source stream fails
    loudly instead of silently re-GOPping to different pixels.
    """
    packer = FramePacker(
        max_i_interval, entropy_encode, config, exact_tail, profiler,
        strict_range,
    )
    chunks: list = []
    trailer: list[tuple[int, int]] = []
    pos = FILE_HEADER_BYTES
    nf = 0
    for fi, q3 in enumerate(q3_frames):
        nf = fi + 1
        is_i, packed = packer.pack(q3)
        if is_i:
            trailer.append((fi, pos))
        chunks.append(packed)
        pos += len(packed)
    header = FileHeader(
        nf, width, height, len(trailer), pos - FILE_HEADER_BYTES
    ).pack()
    tr = b"".join(_U32x2.pack(i, p) for i, p in trailer)
    return b"".join([header, *chunks, tr, b"\x00" * PAD512])


def encode_frames(
    frames_rgb: Sequence[np.ndarray],
    max_i_interval: int | None = None,
    entropy_encode: Callable[[np.ndarray], bytes] | None = None,
    config: EncodeConfig | None = None,
    profiler=None,
) -> bytes:
    """Encode RGB frames into an .MPG container byte string.

    frames_rgb: sequence of (H, W, 3) uint8 arrays (R, G, B channel order).
    max_i_interval: force an I-frame at least this often
    (reference: mjpeg423_encoder.c:154-157 selection rule); defaults from
    config (24, the reference's MAX_IFRAME_OFFSET).
    entropy_encode: plane bit-packer override; the default is the native C
    encoder (byte-identical to the Python oracle).
    """
    first = np.asarray(frames_rgb[0])
    h, w = first.shape[:2]
    if h % 8 or w % 8:
        raise ValueError(f"dimensions must be multiples of 8, got {w}x{h}")

    def quantized():
        qz = _Quantizer(profiler)
        for rgb in frames_rgb:
            yield qz.quantize(rgb)

    return encode_quantized_frames(
        quantized(), w, h, max_i_interval, entropy_encode, config,
        profiler=profiler,
    )


class _Quantizer:
    """RGB -> absolute quantized planes, one frame at a time.

    One workspace for the whole encode: fresh multi-MB buffers per frame
    were measured 25-100x slower than reuse on this host (first-touch page
    faults + THP compaction stalls).  q3 ping-pongs over two buffers
    because the P-candidate reads the previous frame's planes (the
    FramePacker / encode_quantized_frames contract — the reference's
    prev/next DCACq buffer swap, mjpeg423_encoder.c:154-185).
    """

    def __init__(self, profiler=None):
        self._prof = profiler or default_profiler
        self._scratch: dict = {}
        self._pair: list[np.ndarray | None] = [None, None]
        self._fi = 0

    def quantize(self, rgb: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 RGB -> (3, B, 64) int16 absolute quantized
        planes.  The returned array is overwritten two calls later."""
        with self._prof.time("encode/convert"):
            yb, cbb, crb = _rgb_to_blocked_planes(rgb, self._scratch)
        nb = yb.shape[0]
        q3 = self._pair[self._fi % 2]
        if q3 is None or q3.shape != (3, nb, 64):
            q3 = np.empty((3, nb, 64), dtype=np.int16)
            self._pair[self._fi % 2] = q3
        with self._prof.time("encode/fdct"):
            for i, (blocks, quant) in enumerate((
                (yb, T.YQUANT64), (cbb, T.CQUANT64), (crb, T.CQUANT64)
            )):
                q = centropy.fdct_quant_blocks(blocks, quant, out=q3[i])
                if q is None:  # NumPy oracle fallback
                    coefs = encode_ref.fdct_blocks(blocks).reshape(-1, 64)
                    q3[i] = encode_ref.quantize_blocks(coefs, quant)
        self._fi += 1
        return q3


class LiveEncoder:
    """Encode RGB frames into a byte sink as they arrive (live producer).

    Writes the open-ended live header (num_frames = 0 sentinel, no trailer
    — the runtime/live.py stream contract), then one complete container
    frame per write_frame call, straight to the sink: a camera / screen
    producer feeds any number of live consumers with O(1 frame) memory.

    If the sink is seekable, finalize() appends the I-frame trailer + the
    512-byte pad and back-patches the header — exactly the reference
    encoder's end-of-encode fixup (reference: mjpeg423_encoder.c:204-225)
    — turning the feed into a stored container byte-identical to
    encode_frames() of the same input.  For pure streams (pipes/sockets)
    finalize() is a no-op returning False; EOF at the frame boundary is
    the end-of-stream marker.
    """

    def __init__(
        self,
        out,
        width: int,
        height: int,
        max_i_interval: int | None = None,
        entropy_encode: Callable[[np.ndarray], bytes] | None = None,
        config: EncodeConfig | None = None,
        profiler=None,
    ):
        if not width or not height or width % 8 or height % 8:
            raise ValueError(
                f"dimensions must be multiples of 8, got {width}x{height}"
            )
        self._out = out
        self.width = width
        self.height = height
        self._quant = _Quantizer(profiler)
        self._packer = FramePacker(
            max_i_interval, entropy_encode, config, profiler=profiler
        )
        self._pos = FILE_HEADER_BYTES
        self._trailer: list[tuple[int, int]] = []
        self.frames_written = 0
        self._finalized = False
        self._did_patch = False
        # The header's sink offset — finalize() must patch where the
        # header actually landed, not offset 0 (the sink may hold prior
        # content).  Trailer frame_positions stay container-relative
        # (frame_position is an offset within the container per the
        # format, mjpeg423_encoder.c:204-207).
        try:
            self._base = out.tell() if out.seekable() else 0
        except (AttributeError, OSError):
            self._base = 0
        out.write(FileHeader(0, width, height, 0, 0).pack())

    def write_frame(self, rgb: np.ndarray) -> None:
        """Encode and emit one (H, W, 3) uint8 RGB frame."""
        if self._finalized:
            raise ValueError("LiveEncoder already finalized")
        rgb = np.asarray(rgb, dtype=np.uint8)
        if rgb.shape[:2] != (self.height, self.width):
            raise ValueError(
                f"frame is {rgb.shape[1]}x{rgb.shape[0]}, feed is "
                f"{self.width}x{self.height}"
            )
        is_i, packed = self._packer.pack(self._quant.quantize(rgb))
        if is_i:
            self._trailer.append((self.frames_written, self._pos))
        self._out.write(packed)
        self._pos += len(packed)
        self.frames_written += 1

    def finalize(self) -> bool:
        """Seekable sinks: write trailer + pad, back-patch the header
        (the stored-container fixup).  Returns True if patched.
        Idempotent — repeat calls return the first result unchanged."""
        if self._finalized:
            return self._did_patch
        self._finalized = True
        if not getattr(self._out, "seekable", lambda: False)():
            return False
        out = self._out
        out.write(b"".join(_U32x2.pack(i, p) for i, p in self._trailer))
        out.write(b"\x00" * PAD512)
        out.seek(self._base)
        out.write(FileHeader(
            self.frames_written, self.width, self.height,
            len(self._trailer), self._pos - FILE_HEADER_BYTES,
        ).pack())
        out.seek(0, 2)
        self._did_patch = True
        return True


_PACK_Q3 = None


def _pack_q3(q3):
    """jit'd device-side narrowing for fetch_i8: int16 planes ->
    (dc int16, ac int8 with position 0 zeroed, overflow flag).  Module-
    level singleton so the jit cache survives across encode calls (a
    per-call closure recompiled through the remote compile service every
    invocation — measured +0.14 s/call)."""
    global _PACK_Q3
    if _PACK_Q3 is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def fn(q3):
            dc = q3[..., 0]
            ac8 = q3.astype(jnp.int8).at[..., 0].set(0)
            ac = q3[..., 1:]
            over = jnp.any((ac > 127) | (ac < -128))
            return dc, ac8, over

        _PACK_Q3 = fn
    return _PACK_Q3(q3)


def _encode_frames_device_fused(
    frames_rgb, w, h, nf, max_i_interval, entropy_encode, config, mesh=None,
    profiler=None,
) -> bytes:
    """encode_frames_device's Pallas path: fused FDCT+quantize windows.

    The kernel (ops/encode_fused.py) returns ABSOLUTE quantized planes, so
    the whole select-then-pack back half (candidate sizes, smaller-wins,
    in-place container assembly) is shared with the host encoder via
    encode_quantized_frames — byte-identical output by construction.
    With mesh=, each window's frames shard over the "data" axis via
    parallel/encode.encode_window_fused_sharded (zero collectives).

    config.overlap_device (default True): host convert of window N+1 and
    the serial pack of window N run CONCURRENTLY with the device transform
    and D2H of the windows between them — a producer thread converts,
    dispatches, and posts the async D2H; the packer thread consumes in
    order (P-candidate state is sequential).  Bounded by
    config.inflight_windows staging slots so host memory stays O(window).
    Mirrors the decode pipeline's stage discipline (runtime/pipeline.py)
    and the reference's post-early/join-late structure
    (playback.c:80-134: core1 reads N+1 while core0 transforms N).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.encode_fused import (
        auto_rows_per_step_encode,
        encode_window_fused,
    )

    bh, bw = h // 8, w // 8
    nb = bh * bw
    W = max(1, min(int(config.frames_per_batch), nf))
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS

        n_data = mesh.shape[DATA_AXIS]
        W = max(W, n_data) // n_data * n_data  # window divisible by shards
    k = auto_rows_per_step_encode(bh, bw)
    prof = profiler or default_profiler

    def transform(stage):
        """Dispatch one staged uint8 window; returns the device array."""
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.encode import encode_window_fused_sharded
            from ..parallel.mesh import DATA_AXIS

            d_stage = jax.device_put(
                jnp.asarray(stage),
                NamedSharding(mesh, P(None, DATA_AXIS)),
            )
            return encode_window_fused_sharded(
                d_stage, mesh=mesh, blocks_h=bh, blocks_w=bw,
                rows_per_step=k,
            )
        return encode_window_fused(
            jnp.asarray(stage), blocks_h=bh, blocks_w=bw, rows_per_step=k,
        )

    # fetch_i8 (decode-side pack_i8's mirror, DESIGN §5 roadmap item):
    # narrow the quantized planes ON DEVICE to int16 DC + int8 AC before
    # D2H, halving the dominant transfer of the device-assisted encode
    # (quantized AC of real content rarely leaves int8; a per-window
    # overflow flag falls back to the full int16 fetch, byte-identical
    # either way).  Single-device path only (the sharded transform
    # returns per-shard layouts the packer consumes whole).
    use_fetch_i8 = bool(config.fetch_i8) and mesh is None

    def transform_packed(stage):
        q3 = transform(stage)
        dc, ac8, over = _pack_q3(q3)
        return q3, dc, ac8, over

    def _fetch(payload):
        """Resolve a device payload to host arrays: ('full', q3w) or
        ('i8', dc, ac8) — the rare overflow window falls back to the
        full int16 fetch (byte-identical either way)."""
        if isinstance(payload, tuple):
            q3_dev, dc_dev, ac_dev, over_dev = payload
            if bool(jax.device_get(over_dev)):
                return ("full", np.asarray(jax.device_get(q3_dev)))
            return ("i8", np.asarray(jax.device_get(dc_dev)),
                    np.asarray(jax.device_get(ac_dev)))
        return ("full", np.asarray(jax.device_get(payload)))

    def _frame_into(q3_out, fetched, j):
        """Copy frame j of a fetched window into the ping-pong buffer
        (widening the packed format exactly when it was used)."""
        if fetched[0] == "i8":
            _, dc, ac8 = fetched
            np.copyto(q3_out, ac8[:, j], casting="unsafe")
            q3_out[..., 0] = dc[:, j]
        else:
            np.copyto(q3_out, fetched[1][:, j])

    def quantized_sequential():
        scratch: dict = {}
        stage = np.zeros((3, W, nb, 64), np.uint8)
        # q3w[:, j] is non-contiguous (W > 1 strides the frame axis), and
        # the pack path would ascontiguousarray-copy it into FRESH multi-MB
        # buffers every frame — the THP first-touch pathology the scratch
        # pattern exists to avoid.  Copy once into a ping-ponged pair (the
        # P candidate reads one frame back, same contract as
        # encode_frames' producer).
        q3_pair = [
            np.empty((3, nb, 64), np.int16), np.empty((3, nb, 64), np.int16)
        ]
        fi = 0
        for ws in range(0, nf, W):
            count = min(W, nf - ws)
            with prof.time("encode/convert"):
                for j in range(count):
                    yb, cbb, crb = _rgb_to_blocked_planes(
                        frames_rgb[ws + j], scratch
                    )
                    stage[0, j] = yb.reshape(nb, 64)
                    stage[1, j] = cbb.reshape(nb, 64)
                    stage[2, j] = crb.reshape(nb, 64)
            # Always ship the full W-frame window (stale tail rows are
            # ignored) so every batch compiles to ONE shape.
            with prof.time("encode/device_transform"):
                payload = (transform_packed(stage) if use_fetch_i8
                           else transform(stage))
                fetched = _fetch(payload)
            for j in range(count):
                q3 = q3_pair[fi % 2]
                _frame_into(q3, fetched, j)
                fi += 1
                yield q3

    def quantized_overlapped():
        import queue
        import threading

        class _StageError:
            def __init__(self, exc):
                self.exc = exc

        inflight = max(1, int(config.inflight_windows))
        # Staging slot pool: the device_put of slot S is only provably
        # complete once S's OUTPUT has been fetched (the jit consumed its
        # input), so a slot returns to the pool after the consumer's
        # device_get — inflight+1 slots keep the producer converting
        # while `inflight` windows are in flight.
        slot_pool: queue.Queue = queue.Queue()
        for _ in range(inflight + 1):
            slot_pool.put(np.zeros((3, W, nb, 64), np.uint8))
        out_q: queue.Queue = queue.Queue(maxsize=inflight)
        stop = threading.Event()

        def _put_or_drop(item) -> bool:
            while True:
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    if stop.is_set():
                        return False

        def producer():
            err: BaseException | None = None
            try:
                scratch: dict = {}
                for ws in range(0, nf, W):
                    count = min(W, nf - ws)
                    while True:
                        try:
                            stage = slot_pool.get(timeout=0.1)
                            break
                        except queue.Empty:
                            if stop.is_set():
                                return
                    with prof.time("encode/convert"):
                        for j in range(count):
                            yb, cbb, crb = _rgb_to_blocked_planes(
                                frames_rgb[ws + j], scratch
                            )
                            stage[0, j] = yb.reshape(nb, 64)
                            stage[1, j] = cbb.reshape(nb, 64)
                            stage[2, j] = crb.reshape(nb, 64)
                    with prof.time("encode/device_dispatch"):
                        if use_fetch_i8:
                            payload = transform_packed(stage)
                            async_arrs = payload[1:]  # dc, ac8, over
                        else:
                            payload = transform(stage)
                            async_arrs = (payload,)
                        for arr in async_arrs:
                            try:
                                arr.copy_to_host_async()
                            except AttributeError:
                                pass  # non-Array (interpret fallback)
                    if not _put_or_drop((count, stage, payload)):
                        return
            except BaseException as e:  # noqa: BLE001 — propagate to packer
                err = e
            finally:
                _put_or_drop(_StageError(err) if err is not None else None)

        t = threading.Thread(
            target=producer, daemon=True, name="mj-encode-producer"
        )
        t.start()
        q3_pair = [
            np.empty((3, nb, 64), np.int16), np.empty((3, nb, 64), np.int16)
        ]
        fi = 0
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, _StageError):
                    raise item.exc
                count, stage, payload = item
                with prof.time("encode/device_fetch"):
                    fetched = _fetch(payload)
                slot_pool.put(stage)  # input consumed: slot is reusable
                for j in range(count):
                    q3 = q3_pair[fi % 2]
                    _frame_into(q3, fetched, j)
                    fi += 1
                    yield q3
        finally:
            stop.set()
            t.join(timeout=30.0)

    gen = quantized_overlapped if config.overlap_device else (
        quantized_sequential)
    return encode_quantized_frames(
        gen(), w, h, max_i_interval, entropy_encode, config,
        profiler=profiler,
    )


def encode_frames_device(
    frames_rgb: Sequence[np.ndarray],
    max_i_interval: int | None = None,
    entropy_encode: Callable[[np.ndarray], bytes] | None = None,
    parallel_entropy: bool = True,
    config: EncodeConfig | None = None,
    mesh=None,
    use_pallas: bool | None = None,
    profiler=None,
) -> bytes:
    """Byte-identical to encode_frames, with the transform on the device.

    Pipeline split: host does color conversion (float64, must match C
    doubles — rgb_to_ycbcr.c:64-66) and the serial entropy pack; the device
    does FDCT + quantize + I/P differencing in jit batches of
    config.frames_per_batch frames (ops/encode_jax.py — the encoder has no
    temporal recurrence, so windows batch-parallelize; slot 0 of each
    window carries the previous window's last frame as the P-candidate
    halo, so every batch compiles to ONE shape and host memory stays
    O(window), not O(clip)).  Frame-type selection stays on the host (it
    needs candidate byte sizes; mjpeg423_encoder.c:154-185).

    mesh=...: shard the transform's frame axis over the mesh's "data" axis
    (parallel/encode.py — one neighbor ppermute carries the P-candidate
    halo).  This batch path stages the WHOLE clip (sharding wants all
    frames at once); output is byte-identical to the windowed path.

    use_pallas: run the fused FDCT+quantize kernel (ops/encode_fused.py)
    instead of the XLA transform; None (default) auto-enables it on TPU
    when the native C packer is available (the fused path packs through
    encode_quantized_frames, whose fast path is the C codec).  Works with
    mesh= too: frames shard over "data" with zero collectives.
    """
    import jax.numpy as jnp

    from ..ops import encode_jax

    config = config or EncodeConfig()
    prof = profiler or default_profiler
    if max_i_interval is None:
        max_i_interval = config.max_i_interval
    entropy_encode = _resolve_entropy_encode(entropy_encode, config)
    first = np.asarray(frames_rgb[0])
    h, w = first.shape[:2]
    if h % 8 or w % 8:
        raise ValueError(f"dimensions must be multiples of 8, got {w}x{h}")

    nf = len(frames_rgb)
    if use_pallas is None:
        import jax

        # Auto on TPU, mesh or not: the fused kernel beats the XLA
        # transform either way, and its sharded wrapper needs no halo.
        # Requires the native packer — the fused path's select-then-pack
        # back half is serial in pure Python, which would silently drop
        # the XLA path's thread-pooled entropy packing.
        use_pallas = (
            jax.default_backend() == "tpu" and centropy.native_available()
        )
    if use_pallas:
        # Fused Pallas FDCT+quantize (ops/encode_fused.py) feeding the
        # shared select-then-pack back half — byte-identical, one HBM pass.
        # With mesh=: frames shard over "data" with ZERO collectives (the
        # kernel emits absolute planes; all differencing is in the packer).
        return _encode_frames_device_fused(
            frames_rgb, w, h, nf, max_i_interval, entropy_encode, config,
            mesh=mesh, profiler=profiler,
        )
    names = ("y", "cb", "cr")
    ex = None
    if parallel_entropy:
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor()
    try:
        if mesh is None:
            # Windowed transform: stage W+1 blocked-plane slots (halo + W
            # frames), transform on device, pack that window, advance.
            nb = (h // 8) * (w // 8)
            W = max(1, min(int(config.frames_per_batch), nf))
            stage = {n: np.zeros((W + 1, nb, 8, 8), np.uint8) for n in names}
            scratch: dict = {}
            bits_i: dict = {}
            bits_p: dict = {}
            for ws in range(0, nf, W):
                count = min(W, nf - ws)
                with prof.time("encode/convert"):
                    for k in range(count):
                        yb, cbb, crb = _rgb_to_blocked_planes(
                            frames_rgb[ws + k], scratch
                        )
                        np.copyto(stage["y"][k + 1], yb)
                        np.copyto(stage["cb"][k + 1], cbb)
                        np.copyto(stage["cr"][k + 1], crb)
                with prof.time("encode/device_transform"):
                    ci_d, cp_d = encode_jax.encode_transform(
                        jnp.asarray(stage["y"]), jnp.asarray(stage["cb"]),
                        jnp.asarray(stage["cr"]),
                    )
                # ci rows 1..count = frames ws..ws+count-1; cp row k is
                # batch frame k+1 vs k = global frame ws+k vs predecessor
                # (the halo makes row 0 valid for every window but the
                # first, where frame 0 has no predecessor).
                ci = {n: np.asarray(v) for n, v in ci_d.items()}
                cp = {n: np.asarray(v) for n, v in cp_d.items()}
                jobs_i = [(ws + k, n) for k in range(count) for n in names]
                jobs_p = [
                    (ws + k, n)
                    for k in range(count) if ws + k > 0
                    for n in names
                ]

                def _enc_i(job, _ci=ci, _ws=ws):
                    fi, n = job
                    return entropy_encode(_ci[n][fi - _ws + 1])

                def _enc_p(job, _cp=cp, _ws=ws):
                    fi, n = job
                    return entropy_encode(_cp[n][fi - _ws])

                with prof.time("encode/pack"):
                    if ex is not None:
                        bits_i.update(zip(jobs_i, ex.map(_enc_i, jobs_i)))
                        bits_p.update(zip(jobs_p, ex.map(_enc_p, jobs_p)))
                    else:
                        bits_i.update((j, _enc_i(j)) for j in jobs_i)
                        bits_p.update((j, _enc_p(j)) for j in jobs_p)
                for n in names:  # halo for the next window
                    np.copyto(stage[n][0], stage[n][count])
        else:
            from ..parallel.encode import encode_transform_sharded, shard_samples
            from ..parallel.mesh import DATA_AXIS

            planes = {n: [] for n in names}
            for rgb in frames_rgb:
                yb, cbb, crb = _rgb_to_blocked_planes(rgb)
                for name, blk in (("y", yb), ("cb", cbb), ("cr", crb)):
                    planes[name].append(blk)
            n_data = mesh.shape[DATA_AXIS]
            pad = (-nf) % n_data
            host = {}
            for n, v in planes.items():
                arr = np.stack(v)
                if pad:
                    arr = np.concatenate(
                        [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)]
                    )
                host[n] = arr
            args = shard_samples(mesh, host["y"], host["cb"], host["cr"])
            cand_i, cand_p = encode_transform_sharded(*args, mesh=mesh)
            cand_i = {n: np.asarray(v)[:nf] for n, v in cand_i.items()}
            # cand_p is frame-indexed (row 0 unused)
            cand_p = {n: np.asarray(v)[:nf] for n, v in cand_p.items()}

            jobs_i = [(fi, n) for fi in range(nf) for n in names]
            jobs_p = [(fi, n) for fi in range(1, nf) for n in names]

            def _enc_i(job):
                fi, n = job
                return entropy_encode(cand_i[n][fi])

            def _enc_p(job):
                fi, n = job
                return entropy_encode(cand_p[n][fi])

            with prof.time("encode/pack"):
                if ex is not None:
                    bits_i = dict(zip(jobs_i, ex.map(_enc_i, jobs_i)))
                    bits_p = dict(zip(jobs_p, ex.map(_enc_p, jobs_p)))
                else:
                    bits_i = {j: _enc_i(j) for j in jobs_i}
                    bits_p = {j: _enc_p(j) for j in jobs_p}
    finally:
        if ex is not None:
            ex.shutdown()

    out_frames: list[Frame] = []
    last_iframe = 0
    for fi in range(nf):
        size_i = sum(len(bits_i[(fi, n)]) for n in names)
        size_p = (
            sum(len(bits_p[(fi, n)]) for n in names) if fi > 0 else None
        )
        pick_i = (
            fi == 0
            or size_p is None
            or size_i <= size_p
            or fi - last_iframe >= max_i_interval
        )
        src = bits_i if pick_i else bits_p
        if pick_i:
            last_iframe = fi
        out_frames.append(
            Frame(
                T.FRAME_TYPE_I if pick_i else T.FRAME_TYPE_P,
                src[(fi, "y")], src[(fi, "cb")], src[(fi, "cr")],
            )
        )
    return serialize_file(w, h, out_frames)
