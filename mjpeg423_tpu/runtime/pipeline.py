"""Streaming decode pipeline: parse stage ∥ device transform ∥ output.

The TPU-native re-architecture of the reference's 3-stage dual-core + HW
pipeline (reference: playback.c:80-134 `process`, core1/software/main.c:227-335
message loop):

  Stage A (host threads)  — entropy parse: native C batch decoder over
      (frames x planes) byte ranges indexed straight into the container
      buffer (zero copy; the core1 + Cb/Cr-on-core0 analog).
  Stage B (device)        — one jit-compiled windowed decode step: dequant +
      segmented temporal scan + fused IDCT/color (Pallas) + raster.  Windows
      of W frames carry the int16 coefficient state of their last frame
      forward, so window boundaries need no GOP alignment — the carry is the
      device-resident analog of the reference's persistent DCAC buffers
      (MPEG_WORKING_BUFFER, mpeg423_decoder_ext.h:35-41).
  Stage C (host)          — device->host transfer + delivery.

Backpressure: bounded queues between stages (the 1-deep OK/DONE mailbox
handshake generalized to N-deep; reference: mailbox.h:8-16).  Async dispatch:
stage B enqueues the next window before the previous transfer completes
(XLA async dispatch = the reference's post-early/join-late mSGDMA pattern,
playback.c:102-121).
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Sequence

import numpy as np

from ..core import format as fmt
from ..native import centropy
from ..ops import entropy_ref
from ..utils.config import DecodeConfig
from ..utils.profile import Profiler, default_profiler

PLANE_COUNT = 3


def auto_rows_per_step(
    blocks_h: int, blocks_w: int, window: int = 24, layout: str = "cm"
) -> int:
    """Pick the fused kernel's block-row fold (lane-tile width = k*bw).

    Measured on v5e (chained 1080p/VGA runs): the smallest fold reaching
    >= 320 lanes wins — VGA bw=80 -> k=4 (48.7k f/s at W=16; k=5/k=6 both
    slower), 1080p bw=240 -> k=2 (10,366 f/s at W=20, 9,926 at W=16, vs
    8,963 for k=1) — but the fold multiplies the kernel's VMEM footprint
    (~1280*W*lanes bytes across double-buffered in/out), so the lane cap
    shrinks with the window size: 1080p W=20 k=2 (W*lanes = 9600)
    compiles, W=24 k=2 (11520) does not — the budget constant encodes
    that measured boundary.  The BLOCK-MAJOR kernel's in-VMEM transposes
    need extra scoped scratch, so its boundary is tighter: 1080p W=14 k=2
    (6720) compiles at 9,663 f/s (+6.8% over W=20 k=1), W=15 (7200) OOMs
    — layout="bm" uses that smaller budget.  Falls back to the largest
    fold under the cap when no fold reaches 320 lanes (narrow
    geometries); the cap is never floored above the budget (a floor once
    selected folds past the compile boundary for windows > ~38)."""
    from ..ops.transform_fused import pick_fold

    total = 10_000_000 if layout == "cm" else 7_000_000
    budget = int(total // (1024 * max(window, 1)))
    lmax = min(512, budget)
    return pick_fold(blocks_h, blocks_w, target=320, lane_cap=lmax)


class _StageError:
    """Producer-thread exception carried across the stage queue.

    The reference at least spins loudly on a failed read
    (assert_persistent, core1/main.c:154); a silent truncated decode would
    be worse, so parse failures re-raise in the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


@dataclasses.dataclass
class DecodedWindow:
    """A batch of decoded frames: [start, start + count) of the stream."""

    start_frame: int
    count: int
    frames: np.ndarray  # (W, H, W) uint32 packed BGRA; rows beyond count are pad


@dataclasses.dataclass
class RecoveryLog:
    """decode_resilient's account of what was skipped and where it resynced.

    skipped: [lo, hi) frame ranges dropped (corrupt frame up to the next
    I-frame — P-frames after a corrupt frame depend on its state, so the
    recovery unit is the GOP tail, SURVEY §5.3).  Sorted and merged once
    the generator completes.
    """

    skipped: list[tuple[int, int]] = dataclasses.field(default_factory=list)
    resyncs: int = 0
    # Live resyncs (runtime.live decode_live(resync=True)): one entry per
    # recovery, (delivery index where the feed resumed at an I-frame,
    # bytes discarded while scanning).  Frames lost inside the gap are
    # unknowable without a trailer, so live recovery accounts BYTES, not
    # frame ranges.
    gaps: list[tuple[int, int]] = dataclasses.field(default_factory=list)

    @property
    def frames_skipped(self) -> int:
        return sum(hi - lo for lo, hi in self.skipped)


def _device_step_factory(blocks_h: int, blocks_w: int, use_pallas: bool,
                         tile: int, interpret: bool | None,
                         raster_on_device: bool = False,
                         window: int = 24):
    """Build the jit'd windowed decode step with coefficient-state carry.

    use_pallas=True -> the fully-fused kernel (ops/transform_fused.py):
    dequant + temporal recurrence + IDCT + color in one HBM pass.  Frames
    come back in the kernel's blocked layout unless raster_on_device (the
    device-side XLA raster transpose measures ~45x the kernel itself; the
    host converts after transfer — blocked_to_raster_host).
    Fallback: XLA segmented scan + jnp transform (always raster).
    """
    import jax
    import jax.numpy as jnp

    from ..ops import transform_fused, transform_jax

    if use_pallas:
        rows_k = auto_rows_per_step(blocks_h, blocks_w, window)
        rows_k_bm = auto_rows_per_step(blocks_h, blocks_w, window,
                                       layout="bm")

        def fused_step(amps, seg, carry):
            """Dispatch on the parse output format:
            ("cm", a)   — coefficient-major (3, W, bh/k, 64, k*bw) int16
            ("i8", dc, ac8) — compressed int16 DC + int8 AC
            plain array — block-major (3, W, B, 64) int16
            """
            if isinstance(amps, tuple) and amps[0] == "cm":
                return transform_fused.decode_window_fused_cm(
                    amps[1], seg, carry, blocks_h=blocks_h,
                    blocks_w=blocks_w, interpret=interpret,
                    rows_per_step=rows_k, raster=raster_on_device,
                )
            if isinstance(amps, tuple):
                _, dc, ac8 = amps
                return transform_fused.decode_window_fused_i8(
                    dc, ac8, seg, carry, blocks_h=blocks_h,
                    blocks_w=blocks_w, interpret=interpret,
                    raster=raster_on_device,
                )
            return transform_fused.decode_window_fused(
                amps, seg, carry, blocks_h=blocks_h, blocks_w=blocks_w,
                interpret=interpret, raster=raster_on_device,
                rows_per_step=rows_k_bm,
            )
        return fused_step

    yq, cq = transform_jax.quant_tensors()

    @jax.jit
    def step(amps, seg, carry):
        # amps: (3, W, B, 64) int16; seg: (W,) bool; carry: (3, B, 64) int16.
        states = []
        new_carry = []
        for p, q in ((0, yq), (1, cq), (2, cq)):
            deltas = transform_jax.dequantize(amps[p], q)
            vals, seen = _scan_with_flags(deltas, seg)
            # Frames before the window's first I-frame continue from carry.
            vals = jnp.where(
                seen, vals, (carry[p][None] + vals).astype(jnp.int16)
            )
            states.append(vals)
            new_carry.append(vals[-1])
        frames = transform_jax.decode_transform_states(
            *states, blocks_h=blocks_h, blocks_w=blocks_w
        )
        return frames, jnp.stack(new_carry)

    def _scan_with_flags(deltas, seg):
        f = deltas.shape[0]
        segb = jnp.broadcast_to(
            seg.reshape((f,) + (1,) * (deltas.ndim - 1)), deltas.shape
        )

        def combine(a, b):
            av, aseg = a
            bv, bseg = b
            return jnp.where(bseg, bv, (av + bv).astype(jnp.int16)), aseg | bseg

        return jax.lax.associative_scan(combine, (deltas, segb), axis=0)

    return step


class DecodePipeline:
    """End-to-end streaming decoder for one MJPEG423 container.

    With mesh=None (default) the pipeline runs single-device.  Passing a
    jax.sharding.Mesh shards the stream's GOPs across the mesh's "data"
    axis: each device streams its own GOP-aligned frame partition through
    the SAME jit step (shard_map over per-device windows with per-device
    coefficient carry), so the flagship fused kernel runs on every chip
    with zero collectives — the reference's whole architecture (core1
    streaming + core0 consuming, core1/main.c:227-335) at pod scale.
    Windows parse per partition on demand; nothing whole-stream is ever
    materialized.
    """

    def __init__(
        self,
        config: DecodeConfig | None = None,
        profiler: Profiler | None = None,
        mesh=None,
        device=None,
    ):
        self.config = config or DecodeConfig()
        self.profiler = profiler or default_profiler
        self.mesh = mesh
        # Pin this pipeline's device work to one chip (stream-level data
        # parallelism: runtime.serve.StreamPool runs one pinned pipeline
        # per device).  None = the process default device.
        self.device = device
        self._executor: ThreadPoolExecutor | None = None
        self._step_cache: dict = {}

    def _put(self, x):
        """Host array -> device (the mSGDMA feed analog), honoring the pin."""
        import jax
        import jax.numpy as jnp

        if self.device is not None:
            return jax.device_put(x, self.device)
        return jnp.asarray(x)

    # ----- Stage A: host entropy parse ---------------------------------

    def _decode_plane_fn(self):
        if self.config.use_native_entropy and centropy.native_available():
            return None  # use batch API
        return entropy_ref.decode_plane

    def parse_window(
        self, data: bytes, index: fmt.FrameIndex, start: int, count: int,
        want_packed: bool = False,
        want_cm: bool = False,
        frames: np.ndarray | None = None,
    ):
        """Entropy-decode frames [start, start+count).

        frames: an explicit array of frame indices overrides start/count —
        the windows need not be contiguous (decode_iframes batches GOP
        heads this way).

        Returns (3, count, B, 64) int16 amplitudes, or — when want_packed
        and every AC amplitude fits int8 — the compressed
        (dc (3, count, B) int16, ac (3, count, B, 64) int8) pair consumed by
        the i8 fused kernel (half the host->device bytes and HBM input
        traffic; the native decoder emits it directly at no extra parse
        cost and signals fallback when a stream needs the full range).
        """
        if frames is None:
            fsel = np.arange(start, start + count)
        else:
            fsel = np.asarray(frames)
            count = len(fsel)
        nb = index.header.blocks_per_plane
        spec = self.config.spec_segments
        with self.profiler.time("parse/window"):
            if spec > 1 and centropy.native_available():
                # Latency mode: speculative intra-plane parallelism (each
                # plane split across `spec` workers; see centropy.c).
                out = np.empty((3, count, nb, 64), dtype=np.int16)
                for p in range(3):
                    for i in range(count):
                        fi = int(fsel[i])
                        o = int(index.plane_off[p, fi])
                        l = int(index.plane_len[p, fi])
                        out[p, i] = centropy.decode_plane_spec(
                            data[o:o + l], nb,
                            bool(index.frame_type[fi]), spec,
                        )
                self.profiler.probe("parse/spec_windows").add(1)
                return out
            if self._decode_plane_fn() is None:
                # One native call over all count*3 plane bitstreams.
                offs = index.plane_off[:, fsel].reshape(-1)
                lens = index.plane_len[:, fsel].reshape(-1)
                is_p = np.broadcast_to(
                    index.frame_type[fsel] != 0, (3, count)
                ).reshape(-1)
                if want_cm:
                    bh = index.header.blocks_h
                    bw = index.header.blocks_w
                    k = auto_rows_per_step(
                        bh, bw, self.config.frames_per_batch
                    )
                    cm = centropy.decode_batch_cm(
                        data, offs, lens, is_p, nb, k * bw
                    )
                    if cm is not None:
                        self.profiler.probe("parse/cm_windows").add(1)
                        return (
                            "cm",
                            cm.reshape(3, count, bh // k, 64, k * bw),
                        )
                if want_packed:
                    packed = centropy.decode_batch_i8(
                        data, offs, lens, is_p, nb
                    )
                    if packed is not None:
                        dc, ac = packed
                        self.profiler.probe("parse/i8_windows").add(1)
                        return (
                            "i8",
                            dc.reshape(3, count, nb),
                            ac.reshape(3, count, nb, 64),
                        )
                out = centropy.decode_batch(data, offs, lens, is_p, nb)
                return out.reshape(3, count, nb, 64)
            out = np.empty((3, count, nb, 64), dtype=np.int16)
            fn = self._decode_plane_fn()
            for p in range(3):
                for i in range(count):
                    fi = int(fsel[i])
                    o = int(index.plane_off[p, fi])
                    l = int(index.plane_len[p, fi])
                    out[p, i] = fn(
                        data[o:o + l], nb, bool(index.frame_type[fi])
                    )
            return out

    # ----- Stage B: device step ----------------------------------------

    def _carry_cast(self, carry, to_tag: str, blocks_h: int, blocks_w: int,
                    kk: int):
        """Convert a device-resident coefficient carry between the two
        parse layouts.  block-major (3, B, 64) <-> coefficient-major
        (3, bh/k, 64, k*bw): fold k block-rows, transpose in-tile.  Needed
        when parse_window falls back to a different layout mid-stream
        (e.g. decode_batch_cm signalling unsupported geometry) so resumed
        state stays exact."""
        import jax.numpy as jnp

        if to_tag == "cm":
            return jnp.swapaxes(
                carry.reshape(3, blocks_h // kk, kk * blocks_w, 64), -1, -2
            )
        return jnp.swapaxes(carry, -1, -2).reshape(
            3, blocks_h * blocks_w, 64
        )

    def _use_pallas(self) -> bool:
        """Resolve the use_pallas=None auto default: fused kernel on TPU,
        XLA elsewhere.  Forcing True off-TPU runs the Pallas interpreter —
        orders of magnitude slower than XLA-on-CPU; tests only."""
        if self.config.use_pallas is None:
            import jax

            return jax.default_backend() == "tpu"
        return self.config.use_pallas

    def _get_step(self, blocks_h: int, blocks_w: int):
        use_pallas = self._use_pallas()
        key = (blocks_h, blocks_w, use_pallas)
        if key not in self._step_cache:
            import jax

            on_tpu = jax.default_backend() == "tpu"
            self._step_cache[key] = _device_step_factory(
                blocks_h, blocks_w, use_pallas,
                self.config.pallas_tile, None if on_tpu else True,
                self.config.raster_on_device,
                self.config.frames_per_batch,
            )
        return self._step_cache[key]

    def _to_raster(self, host: np.ndarray, blocks_h: int,
                   blocks_w: int) -> np.ndarray:
        """Drain-side raster conversion when frames arrive blocked."""
        if host.ndim == 3:  # already raster (XLA path or raster_on_device)
            return host
        from ..ops.transform_fused import blocked_to_raster_host

        return blocked_to_raster_host(host, blocks_h, blocks_w)

    def _get_downscale(self, blocks_h: int, blocks_w: int, f: int):
        """jit'd device-side box downscale (ops/scale.py): applied to the
        step output BEFORE transfer, so preview/thumbnail egress drops
        f^2 x.  Emits raster (the device transpose runs on f^2 fewer
        pixels, sidestepping the full-res rasterization cost)."""
        from ..ops import scale as _scale

        _scale.check_factor(f)  # fail at the API boundary, not inside jit
        key = ("ds", blocks_h, blocks_w, f)
        if key not in self._step_cache:
            import jax

            def fn(frames):
                if frames.ndim == 5:  # fused blocked layout
                    return _scale.downscale_blocked(
                        frames, blocks_h, blocks_w, f
                    )
                return _scale.downscale_raster(frames, f)

            self._step_cache[key] = jax.jit(fn)
        return self._step_cache[key]

    # ----- Full pipeline ------------------------------------------------

    def warmup(self, width: int, height: int) -> None:
        """Pre-compile the device step for a geometry before streams arrive
        (serving cold-start: first-compile on a TPU takes tens of seconds
        to minutes; the reference's equivalent is all-at-load init,
        main.c:141-171).  Runs one zero-delta window through the step in
        the stream format decode() will use, then discards it.
        """
        import jax
        import numpy as np

        bh, bw = height // 8, width // 8
        nb = bh * bw
        w = self.config.frames_per_batch
        seg = np.zeros(w, dtype=bool)
        seg[0] = True
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS

            n_dev = self.mesh.shape[DATA_AXIS]
            fmt_tag = self._mesh_fmt()
            kk = (auto_rows_per_step(bh, bw, w)
                  if fmt_tag == "cm" else 1)
            if fmt_tag == "cm":
                amps = np.zeros(
                    (n_dev, 3, w, bh // kk, 64, kk * bw), np.int16
                )
                carry = np.zeros((n_dev, 3, bh // kk, 64, kk * bw), np.int16)
            else:
                amps = np.zeros((n_dev, 3, w, nb, 64), np.int16)
                carry = np.zeros((n_dev, 3, nb, 64), np.int16)
            sh = NamedSharding(self.mesh, P(DATA_AXIS))
            step = self._get_mesh_step(bh, bw, fmt_tag)
            segs = np.broadcast_to(seg, (n_dev, w)).copy()
            frames, _ = step(
                jax.device_put(amps, sh), jax.device_put(segs, sh),
                jax.device_put(carry, sh),
            )
            frames.block_until_ready()
            return
        step = self._get_step(bh, bw)
        use_pallas = self._use_pallas()
        if use_pallas and self.config.pack_i8:
            # decode() feeds ("i8", dc, ac8) windows in this config: warm
            # the i8 kernel trace.
            dc = self._put(np.zeros((3, w, nb), np.int16))
            ac = self._put(np.zeros((3, w, nb, 64), np.int8))
            carry = self._put(np.zeros((3, nb, 64), np.int16))
            frames, _ = step(("i8", dc, ac), self._put(seg), carry)
            frames.block_until_ready()
        elif self._want_cm():
            kk = auto_rows_per_step(bh, bw, w)
            amps = ("cm", self._put(
                np.zeros((3, w, bh // kk, 64, kk * bw), np.int16)
            ))
            carry = self._put(np.zeros((3, bh // kk, 64, kk * bw), np.int16))
            frames, _ = step(amps, self._put(seg), carry)
            frames.block_until_ready()
        # ALWAYS warm the block-major trace too: it is both the default
        # window format and the runtime fallback the i8 config takes when
        # a window's amplitudes exceed int8 (parse_window's decode_batch_i8
        # -> None) and the cm config takes when the native cm batch is
        # unavailable.  Warming only the fast path would stall the first
        # fallback window on a fresh multi-second compile — exactly the
        # cold start warmup() exists to prevent.
        amps = self._put(np.zeros((3, w, nb, 64), np.int16))
        carry = self._put(np.zeros((3, nb, 64), np.int16))
        frames, _ = step(amps, self._put(seg), carry)
        frames.block_until_ready()

    def decode(
        self,
        data: bytes,
        start_frame: int = 0,
        stop: Callable[[], bool] | None = None,
        end_frame: int | None = None,
        device_resident: bool = False,
        scale: int = 1,
        latency: bool | None = None,
        _index: fmt.FrameIndex | None = None,
    ) -> Iterator[DecodedWindow]:
        """Decode frames [start_frame, end_frame) , yielding frame windows.

        _index: a prebuilt FrameIndex overriding the container chain walk
        (decode_resilient passes the trailer-resynced index whose bad
        ranges a strict index_frames would refuse; callers must only
        request frames the index actually addresses).

        scale (1, 2, 4 or 8): device-side box downscale before transfer —
        windows carry (H/scale, W/scale) raster frames and egress drops
        scale^2 x (preview scrubbing / proxy playback).  Single-device
        only; with device_resident the on-device windows are raster at
        the reduced size.

        latency (None = config.latency_mode): prioritize the FIRST
        window's delivery over stream throughput — it parses alone,
        dispatches, and is drained before any later window's H2D is
        posted, so the first frame never queues behind prefetch traffic
        (the reference displays the sought frame immediately,
        playback.c:245).  Player.play/seek pass True; the stream reverts
        to fully pipelined decode after that first window.

        start_frame must be an I-frame index (seek targets come from the
        trailer, like the reference — playback.c:136-152).  end_frame
        (default: stream end) bounds the decode — the per-host GOP
        partition case (multihost.local_partition) decodes exactly its
        [frame_lo, frame_hi) range with no wasted tail work.

        device_resident=True yields windows whose .frames is the DEVICE
        array (blocked kernel layout unless config.raster_on_device; rows
        beyond .count are pad) — zero device->host transfer, for consumers
        that feed the frames straight into another on-device computation
        (examples/device_consumer.py).  Single-device mode only.

        Note: with mesh=..., windows are yielded in per-step order across
        device partitions, NOT in global frame order; consumers key on
        DecodedWindow.start_frame (decode_array reassembles by index).
        """
        if self.mesh is not None:
            if device_resident:
                raise ValueError(
                    "device_resident decode is single-device (mesh windows "
                    "are sharded; consume them inside shard_map instead)"
                )
            if scale != 1:
                raise ValueError(
                    "scale is single-device; shard downscaled previews via "
                    "StreamPool instead"
                )
            yield from self._decode_mesh(data, start_frame, stop, end_frame)
            return
        cfg = self.config
        latency_first = cfg.latency_mode if latency is None else latency
        index = _index if _index is not None else fmt.index_frames(data)
        hdr = index.header
        bh, bw = hdr.blocks_h, hdr.blocks_w
        nb = hdr.blocks_per_plane
        w = cfg.frames_per_batch
        step = self._get_step(bh, bw)
        downscale = self._get_downscale(bh, bw, scale) if scale != 1 else None

        if start_frame and not index.is_iframe[start_frame]:
            raise ValueError(f"start_frame {start_frame} is not an I-frame")

        nf = hdr.num_frames
        if end_frame is not None:
            nf = min(nf, end_frame)
        windows = [
            (s, min(w, nf - s)) for s in range(start_frame, nf, w)
        ]

        # Stage A prefetch: parse windows ahead on a thread pool.
        workers = cfg.parse_workers or None
        parse_q: queue.Queue = queue.Queue(maxsize=max(cfg.prefetch_batches, 1))
        stop_flag = threading.Event()

        use_pallas = self._use_pallas()
        want_packed = use_pallas and cfg.pack_i8
        # _want_cm mirrors parse_window's actual fast-path conditions
        # (spec_segments and the pure-Python fallback both emit block-major)
        # so the carry layout below starts out right.
        want_cm = self._want_cm()

        def _put_or_drop(item) -> bool:
            """Put unless the consumer abandoned the generator (stop set).
            A plain blocking put can deadlock the producer: a data or
            sentinel put that lands AFTER the consumer's final teardown
            drain blocks forever on a full queue nobody reads (observed
            in decode_live's deliverer; same shape here)."""
            while True:
                try:
                    parse_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    if stop_flag.is_set():
                        return False

        def producer():
            err: BaseException | None = None
            try:
                with ThreadPoolExecutor(max_workers=workers) as ex:
                    # Bounded look-ahead: at most max_inflight windows are
                    # parsed ahead of the consumer (completed futures hold
                    # int16 amplitude tensors ~1.5x raw video size, so
                    # submitting everything upfront would buffer the whole
                    # container in host RAM).
                    max_inflight = max(cfg.prefetch_batches, 1) + 2
                    win_iter = iter(windows)
                    futs: list = []

                    def submit_next() -> None:
                        try:
                            s, c = next(win_iter)
                        except StopIteration:
                            return
                        futs.append((s, c, ex.submit(
                            self.parse_window, data, index, s, c,
                            want_packed, want_cm,
                        )))

                    # Latency mode: the first window's parse runs with
                    # the whole host to itself; prefetch resumes once it
                    # resolves.
                    for _ in range(1 if latency_first else max_inflight):
                        submit_next()
                    while futs:
                        if stop_flag.is_set():
                            for _, _, f2 in futs:
                                f2.cancel()
                            break
                        s, c, fut = futs.pop(0)
                        res = fut.result()
                        while len(futs) < max_inflight:
                            prev = len(futs)
                            submit_next()
                            if len(futs) == prev:
                                break
                        if not _put_or_drop((s, c, res)):
                            for _, _, f2 in futs:
                                f2.cancel()
                            break
            except BaseException as e:
                err = e
            finally:
                _put_or_drop(_StageError(err) if err is not None else None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        kk = auto_rows_per_step(hdr.blocks_h, hdr.blocks_w, w)

        if want_cm:
            carry = self._put(np.zeros(
                (3, hdr.blocks_h // kk, 64, kk * hdr.blocks_w), np.int16
            ))
        else:
            carry = self._put(np.zeros((3, nb, 64), dtype=np.int16))
        carry_layout = "cm" if want_cm else "bm"
        pending: list[tuple[int, int, object]] = []
        try:
            while True:
                item = parse_q.get()
                if item is None:
                    break
                if isinstance(item, _StageError):
                    raise item.exc
                s, c, amps = item
                # parse_window may fall back to a different layout than
                # planned (e.g. decode_batch_cm signalling unsupported
                # geometry): convert the carry so resumed state stays exact.
                fmt_tag = (
                    "cm"
                    if isinstance(amps, tuple) and amps[0] == "cm"
                    else "bm"
                )
                if fmt_tag != carry_layout:
                    carry = self._carry_cast(carry, fmt_tag, bh, bw, kk)
                    carry_layout = fmt_tag
                dev_amps = self._put_window(amps, c, w, nb)
                seg = np.zeros(w, dtype=bool)
                seg[: min(c, w)] = index.is_iframe[s:s + c]
                with self.profiler.time("device/dispatch"):
                    frames, carry = step(
                        dev_amps, self._put(seg), carry
                    )
                    if downscale is not None:
                        frames = downscale(frames)
                pending.append((s, c, frames))
                if latency_first and s == start_frame:
                    # Deliver the first window NOW — before any later
                    # window's H2D is posted (on half-duplex links a
                    # queued post delays this egress ~2.5x; on duplex
                    # PCIe the two paths merely share nothing).
                    yield self._drain(pending.pop(0), bh, bw,
                                      device_resident)
                    if stop is not None and stop():
                        stop_flag.set()
                        return
                # The output ring: up to num_output_buffers decoded windows
                # stay device-resident in flight (the N-deep framebuffer
                # ring, ece423_vid_ctl.c:96-116); drain the oldest beyond it.
                ring = max(1, cfg.num_output_buffers)
                while len(pending) > ring:
                    yield self._drain(pending.pop(0), bh, bw,
                                      device_resident)
                    if stop is not None and stop():
                        stop_flag.set()
                        return
            while pending:
                yield self._drain(pending.pop(0), bh, bw, device_resident)
                if stop is not None and stop():
                    return
        finally:
            # Unblock the producer if the consumer abandoned the generator
            # mid-stream: it may be parked on a full queue.  Drain, give it a
            # moment to observe the flag, then drain again (it re-checks
            # stop_flag before every put, so at most one more item arrives).
            stop_flag.set()
            for _ in range(2):
                while True:
                    try:
                        parse_q.get_nowait()
                    except queue.Empty:
                        break
                t.join(timeout=1.0)
                if not t.is_alive():
                    break

    # ----- Mesh-sharded streaming (multi-chip pipeline) ------------------

    def _want_cm(self, ignore_i8: bool = False) -> bool:
        """THE coefficient-major fast-path predicate — the single source of
        truth for whether parse_window emits (and the device step consumes)
        the cm layout.  Duplicated copies of this condition drifting apart
        was a round-1 carry-layout bug (ADVICE.md item 4); warmup(),
        decode(), and _mesh_fmt() all call this one definition.
        ignore_i8: the mesh path never packs int8 (the sharded step
        standardizes on one array format), so it skips that exclusion.
        coef_major=None (auto) resolves to BLOCK-major: a pipeline is one
        host feeding one chip, which is parse-bound ~20x, and block-major
        parses ~1.7x faster than cm while the cm kernel is only ~1.1x
        faster — min(parse, kernel) favors bm (DESIGN.md §2).  cm is the
        explicit opt-in for chip-bound serving."""
        cfg = self.config
        return (
            self._use_pallas() and cfg.coef_major is True
            and (ignore_i8 or not cfg.pack_i8)
            and cfg.spec_segments <= 1
            and cfg.use_native_entropy and centropy.native_available()
        )

    def parse_layout(self) -> str:
        """Resolved host-parse emission layout for this config: "cm" or
        "bm" (int8 packing, when enabled AND the amplitudes fit, is a
        runtime refinement of "bm").  Public so harnesses (bench.py's
        keystone stage) can report the layout the pipeline actually runs."""
        return "cm" if self._want_cm() else "bm"

    def _mesh_fmt(self) -> str:
        """Device input layout for the mesh path: coefficient-major when the
        native parser can emit it for the fused kernel, else block-major."""
        return "cm" if self._want_cm(ignore_i8=True) else "bm"

    def _get_mesh_step(self, blocks_h: int, blocks_w: int, fmt: str):
        use_pallas = self._use_pallas()
        key = ("mesh", blocks_h, blocks_w, fmt, use_pallas)
        if key in self._step_cache:
            return self._step_cache[key]
        import jax
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        on_tpu = jax.default_backend() == "tpu"
        base = _device_step_factory(
            blocks_h, blocks_w, use_pallas,
            self.config.pallas_tile, None if on_tpu else True,
            self.config.raster_on_device,
            self.config.frames_per_batch,
        )

        def body(amps, seg, carry):
            # Leading device axis is 1 inside the shard.
            arg = ("cm", amps[0]) if fmt == "cm" else amps[0]
            frames, new_carry = base(arg, seg[0], carry[0])
            return frames[None], new_carry[None]

        spec = P(DATA_AXIS)
        sm = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(spec, spec, spec),
            out_specs=(spec, spec),
            # pallas_call out_shapes carry no varying-mesh-axis info
            # (see parallel/decode.py).
            check_vma=False,
        )
        step = jax.jit(sm)
        self._step_cache[key] = step
        return step

    def _decode_mesh(
        self,
        data: bytes,
        start_frame: int = 0,
        stop: Callable[[], bool] | None = None,
        end_frame: int | None = None,
    ) -> Iterator[DecodedWindow]:
        """Sharded streaming decode over the mesh's "data" axis.

        Each device owns a contiguous GOP-aligned frame partition
        (multihost.partition_gops balanced by frame count) and advances
        through it window by window with its own device-resident carry —
        the same step for all devices, one jit dispatch per super-window.
        """
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import BLOCK_AXIS, DATA_AXIS
        from ..parallel.multihost import partition_gops

        mesh = self.mesh
        if DATA_AXIS not in mesh.axis_names:
            raise ValueError(f'mesh must have a "{DATA_AXIS}" axis')
        if BLOCK_AXIS in mesh.axis_names and mesh.shape[BLOCK_AXIS] > 1:
            raise ValueError(
                "streaming decode shards GOPs over the data axis only; "
                "use parallel.decode_stream_sharded for block-axis sharding"
            )
        n_dev = mesh.shape[DATA_AXIS]

        cfg = self.config
        index = fmt.index_frames(data)
        hdr = index.header
        bh, bw = hdr.blocks_h, hdr.blocks_w
        nb = hdr.blocks_per_plane
        w = cfg.frames_per_batch
        if start_frame and not index.is_iframe[start_frame]:
            raise ValueError(f"start_frame {start_frame} is not an I-frame")
        nf = hdr.num_frames
        if end_frame is not None:
            nf = min(nf, end_frame)
        gop_starts = [
            g for g in index.gop_starts() if start_frame <= g < nf
        ]
        if not gop_starts or gop_starts[0] != start_frame:
            gop_starts = [start_frame] + gop_starts
        parts = partition_gops(gop_starts, nf, n_dev)
        n_steps = max(
            (p.num_frames + w - 1) // w for p in parts
        ) if any(p.num_frames for p in parts) else 0

        fmt_tag = self._mesh_fmt()
        kk = auto_rows_per_step(bh, bw, w) if fmt_tag == "cm" else 1
        groups, bw_eff = bh // kk, kk * bw
        step = self._get_mesh_step(bh, bw, fmt_tag)

        def to_fmt(amps, c):
            """Normalize one parse result to the stream format, padded to w
            frames (zero deltas repeat the last frame; dropped on yield)."""
            if fmt_tag == "cm":
                if isinstance(amps, tuple) and amps[0] == "cm":
                    a = amps[1]
                else:
                    # Native cm fallback: host-side relayout through the
                    # kernel's OWN layout helper, so this path can never
                    # drift from what decode_window_fused_cm consumes.
                    from ..ops.transform_fused import to_cm

                    a = to_cm(amps, bh, bw, kk)
                out = np.zeros((3, w, groups, 64, bw_eff), np.int16)
            else:
                a = amps
                out = np.zeros((3, w, nb, 64), np.int16)
            out[:, :c] = a
            return out

        def parse_super(t: int):
            """Parse step t's window of every partition -> stacked arrays."""
            if fmt_tag == "cm":
                amps = np.zeros((n_dev, 3, w, groups, 64, bw_eff), np.int16)
            else:
                amps = np.zeros((n_dev, 3, w, nb, 64), np.int16)
            seg = np.zeros((n_dev, w), dtype=bool)
            spans = []
            for p in parts:
                lo = p.frame_lo + t * w
                cnt = max(0, min(w, p.frame_hi - lo))
                spans.append((lo, cnt))
                if cnt == 0:
                    continue
                raw = self.parse_window(
                    data, index, lo, cnt, False, fmt_tag == "cm"
                )
                amps[p.host] = to_fmt(raw, cnt)
                seg[p.host, :cnt] = index.is_iframe[lo:lo + cnt]
            return amps, seg, spans

        # Stage A: bounded producer over super-windows.
        parse_q: queue.Queue = queue.Queue(maxsize=max(cfg.prefetch_batches, 1))
        stop_flag = threading.Event()

        def _put_or_drop(item) -> bool:
            """See decode()'s _put_or_drop: a put landing after the
            consumer's final teardown drain must not block forever."""
            while True:
                try:
                    parse_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    if stop_flag.is_set():
                        return False

        def producer():
            err: BaseException | None = None
            try:
                with ThreadPoolExecutor(max_workers=cfg.parse_workers or None) as ex:
                    max_inflight = max(cfg.prefetch_batches, 1) + 1
                    futs: list = []
                    nxt = 0

                    def submit_next():
                        nonlocal nxt
                        if nxt < n_steps:
                            futs.append((nxt, ex.submit(parse_super, nxt)))
                            nxt += 1

                    for _ in range(max_inflight):
                        submit_next()
                    while futs:
                        if stop_flag.is_set():
                            for _, f2 in futs:
                                f2.cancel()
                            break
                        t_, fut = futs.pop(0)
                        res = fut.result()
                        submit_next()
                        if not _put_or_drop(res):
                            for _, f2 in futs:
                                f2.cancel()
                            break
            except BaseException as e:
                err = e
            finally:
                _put_or_drop(_StageError(err) if err is not None else None)

        th = threading.Thread(target=producer, daemon=True)
        th.start()

        dev_sharding = NamedSharding(mesh, P(DATA_AXIS))
        if fmt_tag == "cm":
            carry = jnp.zeros((n_dev, 3, groups, 64, bw_eff), jnp.int16)
        else:
            carry = jnp.zeros((n_dev, 3, nb, 64), jnp.int16)
        carry = jax.device_put(carry, dev_sharding)

        pending: list[tuple[list, object]] = []

        def drain(item) -> list[DecodedWindow]:
            spans, frames = item
            with self.profiler.time("output/transfer"):
                host = np.asarray(frames)  # gathers all shards
            if host.ndim == 6:  # (D, W, 8, g, 8, bw_eff) blocked layout
                host = np.stack(
                    [self._to_raster(host[d], bh, bw)
                     for d in range(host.shape[0])]
                )
            return [
                DecodedWindow(lo, cnt, host[d, :cnt])
                for d, (lo, cnt) in enumerate(spans)
                if cnt > 0
            ]

        try:
            while True:
                item = parse_q.get()
                if item is None:
                    break
                if isinstance(item, _StageError):
                    raise item.exc
                amps, seg, spans = item
                dev_amps = jax.device_put(amps, dev_sharding)
                dev_seg = jax.device_put(seg, dev_sharding)
                with self.profiler.time("device/dispatch"):
                    frames, carry = step(dev_amps, dev_seg, carry)
                pending.append((spans, frames))
                ring = max(1, cfg.num_output_buffers)
                while len(pending) > ring:
                    for win in drain(pending.pop(0)):
                        yield win
                    if stop is not None and stop():
                        stop_flag.set()
                        return
            while pending:
                for win in drain(pending.pop(0)):
                    yield win
                if stop is not None and stop():
                    return
        finally:
            stop_flag.set()
            for _ in range(2):
                while True:
                    try:
                        parse_q.get_nowait()
                    except queue.Empty:
                        break
                th.join(timeout=1.0)
                if not th.is_alive():
                    break

    def _put_window(self, amps, c: int, w: int, nb: int):
        """Pad a parsed window to the jit window length (zero deltas repeat
        the last frame; padded rows are dropped at drain) and device_put it,
        preserving the parse layout tag ("cm"/"i8"/block-major)."""
        if isinstance(amps, tuple) and amps[0] == "cm":
            cm = amps[1]
            if c < w:
                pcm = np.zeros((3, w) + cm.shape[2:], dtype=np.int16)
                pcm[:, :c] = cm
                cm = pcm
            return ("cm", self._put(cm))
        if isinstance(amps, tuple):  # packed ("i8", dc, ac8)
            _, dc, ac = amps
            if c < w:
                pdc = np.zeros((3, w, nb), dtype=np.int16)
                pac = np.zeros((3, w, nb, 64), dtype=np.int8)
                pdc[:, :c] = dc
                pac[:, :c] = ac
                dc, ac = pdc, pac
            return ("i8", self._put(dc), self._put(ac))
        if c < w:
            pad = np.zeros((3, w, nb, 64), dtype=np.int16)
            pad[:, :c] = amps
            amps = pad
        return self._put(amps)

    def decode_iframes(
        self, data: bytes, stop: Callable[[], bool] | None = None,
        scale: int = 1,
    ) -> Iterator[tuple[int, np.ndarray]]:
        """Decode ONLY the stream's I-frames (thumbnail / preview strip).

        Every I-frame resets all decoder state (lossless_decode.c:76-78),
        so GOP heads decode with zero carry and batch into full windows —
        a whole archive's preview costs only its I-frame bitstreams (the
        trailer indexes them; the same property the reference exploits for
        seek, playback.c:136-152).  Yields (frame_index, (H, W) uint32
        packed BGRA) in stream order.  Thin wrapper over
        decode_streams([data], iframes_only=True); thumbnail FARMS pass
        many archives to decode_streams directly (or use
        StreamPool.decode_all_packed).
        """
        for _si, fi, frame in self.decode_streams(
            [data], stop=stop, iframes_only=True, scale=scale
        ):
            yield fi, frame

    def decode_streams(
        self,
        datas: Sequence[bytes],
        stop: Callable[[], bool] | None = None,
        iframes_only: bool = False,
        scale: int = 1,
    ) -> Iterator[tuple[int, int, np.ndarray]]:
        """Batch-decode MANY same-geometry containers through ONE window
        stream (the small-clip serving path).

        Frames from consecutive containers pack into shared device windows:
        a window may hold [tail of clip A | all of clip B | head of clip C].
        The temporal recurrence is a SEGMENTED scan, so marking every
        stream's first frame as a segment start resets the coefficient
        state exactly at the seams — a P-first stream decodes as
        0 + delta, identical to its standalone zero-carry decode.  Compared
        to per-stream decode() calls this wastes no window slots on short
        tails and pays one jit dispatch per window, not per clip (the
        reference's NextVideo loop, batched; core1/main.c:166-219).

        iframes_only=True decodes just the GOP heads of every container —
        the thumbnail-farm mode (every selected frame is an I-frame, so all
        windows are pure resets and the carry never contributes).

        Seam windows parse block-major (mixed fast-path formats cannot
        concatenate); windows fully inside one stream use the configured
        fast path.  Yields (stream_idx, frame_idx, (H, W) uint32 frame)
        in global order.

        scale (1, 2, 4, 8): device-side box downscale before transfer —
        frames come back (H/scale, W/scale) and egress drops scale^2 x
        (ops/scale.py; the thumbnail-farm bandwidth lever).
        """
        if self.mesh is not None:
            raise ValueError(
                "decode_streams is single-device; use StreamPool to spread "
                "clips over chips, or one mesh pipeline per long stream"
            )
        cfg = self.config
        indices = [fmt.index_frames(d) for d in datas]
        if not indices:
            return
        hdr = indices[0].header
        for ix in indices[1:]:
            if (ix.header.width, ix.header.height) != (
                hdr.width, hdr.height,
            ):
                raise ValueError(
                    "decode_streams requires same-geometry containers "
                    f"({ix.header.width}x{ix.header.height} != "
                    f"{hdr.width}x{hdr.height})"
                )
        bh, bw = hdr.blocks_h, hdr.blocks_w
        nb = hdr.blocks_per_plane
        w = cfg.frames_per_batch
        step = self._get_step(bh, bw)
        downscale = self._get_downscale(bh, bw, scale) if scale != 1 else None
        use_pallas = self._use_pallas()
        want_packed = use_pallas and cfg.pack_i8
        want_cm = self._want_cm()

        # Global frame list in stream order; each window is a slice of it.
        entries = [
            (si, int(fi))
            for si, ix in enumerate(indices)
            for fi in (
                np.flatnonzero(ix.is_iframe) if iframes_only
                else range(ix.num_frames)
            )
        ]
        carry = self._put(np.zeros((3, nb, 64), np.int16))
        carry_layout = "bm"

        kk = auto_rows_per_step(bh, bw, w)

        def emit(item):
            ents, c, frames = item
            with self.profiler.time("output/transfer"):
                host = np.asarray(frames)
            host = self._to_raster(host, bh, bw)
            for i in range(c):
                si, fi = ents[i]
                yield si, fi, host[i]

        def parse_ents(ents):
            # Per-stream runs inside this window (frame indices may be
            # non-contiguous in iframes_only mode — parse_window takes
            # explicit selections).
            runs: list[tuple[int, list[int]]] = []  # (si, frame indices)
            for si, fi in ents:
                if runs and runs[-1][0] == si:
                    runs[-1][1].append(fi)
                else:
                    runs.append((si, [fi]))
            if len(runs) > 1:
                # Mixed formats cannot concatenate: parse block-major.
                return np.concatenate([
                    self.parse_window(
                        datas[si], indices[si], 0, 0,
                        frames=np.asarray(fis),
                    )
                    for si, fis in runs
                ], axis=1)
            si, fis = runs[0]
            return self.parse_window(
                datas[si], indices[si], 0, 0, want_packed, want_cm,
                frames=np.asarray(fis),
            )

        windows = [entries[s:s + w] for s in range(0, len(entries), w)]
        pending: list[tuple[list, int, object]] = []
        ring = max(1, cfg.num_output_buffers)
        ahead = max(1, cfg.prefetch_batches)
        # Bounded look-ahead: window N+1's host parse overlaps window N's
        # device compute and drain (the decode() producer pattern, sized
        # down to one worker — parse_window is OpenMP-parallel inside).
        ex = ThreadPoolExecutor(max_workers=1)
        futs: list = [ex.submit(parse_ents, e) for e in windows[:ahead]]
        nxt = len(futs)
        try:
            for wi, ents in enumerate(windows):
                if stop is not None and stop():
                    break
                amps = futs[wi].result()
                futs[wi] = None  # free the parsed window once consumed
                if nxt < len(windows):
                    futs.append(ex.submit(parse_ents, windows[nxt]))
                    nxt += 1
                c = len(ents)
                fmt_tag = (
                    "cm" if isinstance(amps, tuple) and amps[0] == "cm"
                    else "bm"
                )
                if fmt_tag != carry_layout:
                    carry = self._carry_cast(carry, fmt_tag, bh, bw, kk)
                    carry_layout = fmt_tag
                dev_amps = self._put_window(amps, c, w, nb)
                seg = np.zeros(w, dtype=bool)
                for i, (si, fi) in enumerate(ents):
                    # Stream starts are segment resets regardless of their
                    # frame type (0 + delta == standalone zero-carry
                    # decode).
                    seg[i] = fi == 0 or bool(indices[si].is_iframe[fi])
                with self.profiler.time("device/dispatch"):
                    frames, carry = step(dev_amps, self._put(seg), carry)
                    if downscale is not None:
                        frames = downscale(frames)
                pending.append((ents, c, frames))
                while len(pending) > ring:
                    yield from emit(pending.pop(0))
            while pending:
                yield from emit(pending.pop(0))
        finally:
            ex.shutdown(wait=False, cancel_futures=True)

    def decode_streams_arrays(
        self, datas: Sequence[bytes], scale: int = 1,
    ) -> list[np.ndarray]:
        """decode_streams, reassembled into one (F, H, W) array per clip."""
        per: dict[int, dict[int, np.ndarray]] = {}
        for si, fi, frame in self.decode_streams(datas, scale=scale):
            per.setdefault(si, {})[fi] = frame
        out = []
        for si in range(len(datas)):
            d = per.get(si, {})
            out.append(
                np.stack([d[k] for k in sorted(d)])
                if d else np.zeros((0, 0, 0), np.uint32)
            )
        return out

    def decode_iframes_array(
        self, data: bytes, scale: int = 1,
    ) -> tuple[np.ndarray, np.ndarray]:
        """All I-frames at once: (indices (K,), frames (K, H, W) uint32)."""
        pairs = list(self.decode_iframes(data, scale=scale))
        if not pairs:
            return (np.zeros(0, np.int64),
                    np.zeros((0, 0, 0), dtype=np.uint32))
        idx = np.array([i for i, _ in pairs], dtype=np.int64)
        return idx, np.stack([f for _, f in pairs])

    def _drain(
        self, item, blocks_h: int, blocks_w: int,
        device_resident: bool = False,
    ) -> DecodedWindow:
        s, c, frames = item
        if device_resident:
            # Serving-to-model path: the window stays on device (blocked
            # kernel layout unless raster_on_device) — no transfer, no
            # host raster pass.  `frames` rows beyond `c` are pad.
            return DecodedWindow(s, c, frames)
        with self.profiler.time("output/transfer"):
            host = np.asarray(frames)
        host = self._to_raster(host, blocks_h, blocks_w)
        return DecodedWindow(s, c, host[:c])

    def decode_array(self, data: bytes, **kw) -> np.ndarray:
        """Decode fully into one (F, H, W) uint32 array.

        Windows may arrive out of global frame order (mesh mode yields one
        window per device partition per step); reassembly is by
        start_frame index.
        """
        if kw.get("device_resident"):
            raise ValueError(
                "decode_array assembles HOST raster frames; consume "
                "device-resident windows from decode(device_resident=True) "
                "directly (blocked layout, rows beyond .count are pad)"
            )
        wins = list(self.decode(data, **kw))
        if not wins:
            return np.zeros((0, 0, 0), dtype=np.uint32)
        lo = min(w.start_frame for w in wins)
        hi = max(w.start_frame + w.count for w in wins)
        out = np.empty(
            (hi - lo,) + wins[0].frames.shape[1:], wins[0].frames.dtype
        )
        for w in wins:
            out[w.start_frame - lo:w.start_frame - lo + w.count] = w.frames
        return out

    # ----- Corruption-resilient decode (GOP skip-and-resync) -------------

    def _find_corrupt_frame(
        self, data: bytes, index: fmt.FrameIndex, lo: int, hi: int
    ) -> int | None:
        """First frame in [lo, hi) whose entropy parse raises, else None."""
        for f in range(lo, hi):
            try:
                self.parse_window(data, index, f, 1, False, False)
            except ValueError:
                return f
        return None

    def decode_resilient(
        self,
        data: bytes,
        *,
        stop: Callable[[], bool] | None = None,
        device_resident: bool = False,
        scale: int = 1,
        recovery: RecoveryLog | None = None,
    ) -> Iterator[DecodedWindow]:
        """Decode, skipping corrupt GOP tails instead of raising.

        The strict paths treat any corruption as fatal (a silent truncated
        decode is worse than an error).  A serving fleet replaying a damaged
        archive wants the third option: deliver every decodable frame, drop
        [corrupt_frame, next_I) — P-frames after the damage depend on its
        state, and every I-frame rebuilds all of it (reference:
        lossless_decode.c:76-78) — and resync at the next trailer I-frame,
        exactly the reference's seek machinery (playback.c:136-152) driven
        by damage instead of the user.  Covers both corruption classes:
        broken frame_size chains (trailer-resynced index,
        format.index_frames_resilient) and corrupt plane bitstreams (parse
        failure -> per-frame probe -> GOP-tail skip).

        Pass a RecoveryLog to observe what was lost; it is finalized
        (sorted, adjacent ranges merged) when the generator completes.
        Frames inside skipped ranges are never yielded — consumers key on
        DecodedWindow.start_frame as always.  Undetectable corruption
        (bit flips that still parse) is out of scope, as it is for the
        reference: the format carries no checksums.
        """
        if self.mesh is not None:
            raise ValueError(
                "decode_resilient is single-device (mesh partitions assume "
                "an intact chain; StreamPool retries cover fleet failures)"
            )
        rec = recovery if recovery is not None else RecoveryLog()
        index, bad = fmt.index_frames_resilient(data)
        rec.skipped.extend(bad)
        rec.resyncs += len(bad)
        nf = index.num_frames
        is_i = index.is_iframe
        spans: list[tuple[int, int]] = []
        pos = 0
        for lo, hi in bad:
            if pos < lo:
                spans.append((pos, lo))
            pos = hi
        if pos < nf:
            spans.append((pos, nf))
        try:
            for lo, hi in spans:
                if not is_i[lo]:
                    # A span must start at an I-frame: prior coefficient
                    # state is gone (resynced spans start at trailer
                    # I-frames; this guards a corrupt frame 0 / lying
                    # trailer).
                    nz = np.flatnonzero(is_i[lo:hi])
                    if nz.size == 0:
                        rec.skipped.append((lo, hi))
                        continue
                    s2 = lo + int(nz[0])
                    rec.skipped.append((lo, s2))
                    lo = s2
                cur = lo
                while cur < hi:
                    delivered = cur
                    try:
                        for win in self.decode(
                            data, start_frame=cur, stop=stop, end_frame=hi,
                            device_resident=device_resident, scale=scale,
                            _index=index,
                        ):
                            yield win
                            delivered = win.start_frame + win.count
                            if stop is not None and stop():
                                return
                        cur = hi
                    except ValueError:
                        f = self._find_corrupt_frame(
                            data, index, delivered, hi
                        )
                        if f is None:
                            # Not a localizable data error (bad config,
                            # geometry, device failure): resilience does
                            # not paper over those.
                            raise
                        rec.resyncs += 1
                        if f > delivered:
                            # Deliver the good prefix [delivered, f).  The
                            # failed attempt lost its in-flight output ring,
                            # so re-decode from the I-frame at/before
                            # `delivered` and trim the head.
                            nz = np.flatnonzero(is_i[lo:delivered + 1])
                            prev_i = lo + int(nz[-1])
                            for win in self.decode(
                                data, start_frame=prev_i, end_frame=f,
                                device_resident=device_resident, scale=scale,
                                _index=index,
                            ):
                                k = max(0, delivered - win.start_frame)
                                if k >= win.count:
                                    continue
                                if k:
                                    win = DecodedWindow(
                                        win.start_frame + k, win.count - k,
                                        win.frames[k:],
                                    )
                                yield win
                                if stop is not None and stop():
                                    return
                        nz = np.flatnonzero(is_i[f + 1:hi])
                        nxt = f + 1 + int(nz[0]) if nz.size else hi
                        rec.skipped.append((f, nxt))
                        cur = nxt
        finally:
            rec.skipped.sort()
            merged: list[tuple[int, int]] = []
            for lo2, hi2 in rec.skipped:
                if merged and lo2 <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], hi2))
                else:
                    merged.append((lo2, hi2))
            rec.skipped[:] = merged

    def decode_resilient_array(
        self, data: bytes, fill: int = 0, **kw
    ) -> tuple[np.ndarray, RecoveryLog]:
        """decode_resilient into one (F, H, W) uint32 array + RecoveryLog.

        Skipped frames hold `fill` (default 0); F is the header's
        num_frames, so frame indices stay aligned with the container.
        """
        if kw.get("device_resident"):
            raise ValueError(
                "decode_resilient_array assembles HOST raster frames; "
                "consume device-resident windows from decode_resilient("
                "device_resident=True) directly"
            )
        rec = kw.pop("recovery", None) or RecoveryLog()
        hdr = fmt.FileHeader.unpack(data)
        f = kw.get("scale", 1)
        out = np.full(
            (hdr.num_frames, hdr.height // f, hdr.width // f),
            fill, dtype=np.uint32,
        )
        for win in self.decode_resilient(data, recovery=rec, **kw):
            out[win.start_frame:win.start_frame + win.count] = win.frames
        return out, rec
