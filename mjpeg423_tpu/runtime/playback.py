"""Playback orchestrator: pacing, seek, fast-forward/rewind, drop accounting.

The reference's playback layer (reference: playback.c:24-303 + timer.c +
key_controls.c + ece423_vid_ctl.c) re-architected around the streaming
pipeline:

  * `play()` paces frames to the configured fps (FORCE_PERIODIC analog,
    config.h:29-31) or free-runs for max throughput, delivering frames to a
    sink callback (the HDMI framebuffer analog).
  * Seek/FF/RW jump via the I-frame trailer exactly like the reference:
    FF = first trailer entry >= current + 5 s, RW = last entry <=
    current - 5 s or start (playback.c:157-227); seeks always land on
    I-frames so no P-state reconstruction is needed.
  * An N-deep output buffer ring with dropped/late accounting replaces the
    4-deep framebuffer ring + the timer-ISR "m" print (playback.c:40-48;
    ece423_vid_ctl.c:174-224).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np

from ..core import format as fmt
from ..utils.config import DecodeConfig
from ..utils.profile import Profiler, default_profiler
from .pipeline import DecodePipeline

FrameSink = Callable[[int, np.ndarray], None]


@dataclasses.dataclass
class PlaybackStats:
    frames_delivered: int = 0
    frames_late: int = 0       # missed their pacing deadline ("m" analog)
    wall_s: float = 0.0

    @property
    def fps(self) -> float:
        return self.frames_delivered / self.wall_s if self.wall_s else 0.0


class Player:
    """Stateful player for one loaded container (the PLAYBACK_DATA analog,
    playback.c:24-34: current frame, header/trailer, working state)."""

    SKIP_SECONDS = 5.0  # FF/RW jump distance (playback.c:176,203)

    def __init__(self, data: bytes, config: DecodeConfig | None = None,
                 profiler: Profiler | None = None):
        self.data = data
        self.config = config or DecodeConfig()
        self.profiler = profiler or default_profiler
        self.pipeline = DecodePipeline(self.config, self.profiler)
        self.index = fmt.index_frames(data)
        self.current_frame = 0
        self.playing = False

    @property
    def num_frames(self) -> int:
        return self.index.num_frames

    # ----- Seeking (trailer-driven, I-frame aligned) --------------------

    def _skip_frames(self) -> int:
        return int(self.SKIP_SECONDS * self.config.fps)

    def seek_to_iframe(self, target: int) -> int:
        """Snap to a trailer I-frame entry and set position (playback.c:136)."""
        starts = self.index.gop_starts()
        best = starts[0]
        for s in starts:
            if s <= target:
                best = s
            else:
                break
        self.current_frame = best
        return best

    def fast_forward(self) -> int:
        """First I-frame >= current + 5 s, else stay (playback.c:157-195)."""
        target = self.current_frame + self._skip_frames()
        for s in self.index.gop_starts():
            if s >= target:
                self.current_frame = s
                return s
        return self.current_frame

    def rewind(self) -> int:
        """Last I-frame <= current - 5 s, else start (playback.c:197-227)."""
        target = self.current_frame - self._skip_frames()
        best = 0
        for s in self.index.gop_starts():
            if s <= target:
                best = s
            else:
                break
        self.current_frame = best
        return best

    # ----- Checkpoint / resume (SURVEY.md §5.4) -------------------------

    def get_state(self) -> dict:
        """Playback position snapshot — resume = (stream, position) only
        (decode is stateless per GOP; the reference's whole resume state is
        3 integers, playback.c:24-34)."""
        return {"current_frame": self.current_frame}

    def set_state(self, state: dict) -> None:
        """Restore a snapshot; position snaps to its GOP's I-frame."""
        self.seek_to_iframe(int(state["current_frame"]))

    # ----- Playing ------------------------------------------------------

    def play(
        self,
        sink: FrameSink | None = None,
        stop: Callable[[], bool] | None = None,
        paced: bool | None = None,
        max_frames: int | None = None,
    ) -> PlaybackStats:
        """Decode and deliver frames from the current position.

        paced=True sleeps to the fps grid and counts late frames; paced=False
        (offline mode) free-runs at max throughput.  `stop` is polled between
        frames — the buttonHasBeenPressed predicate analog (main.c:118).
        """
        cfg = self.config
        if paced is None:
            paced = cfg.force_periodic
        stats = PlaybackStats()
        period = 1.0 / cfg.fps
        start_frame = self.seek_to_iframe(self.current_frame)
        self.playing = True
        t0 = time.perf_counter()
        next_deadline = t0 + period
        delivered = 0
        try:
            for win in self.pipeline.decode(self.data, start_frame, stop=stop):
                for i in range(win.count):
                    if stop is not None and stop():
                        return stats
                    if max_frames is not None and delivered >= max_frames:
                        return stats
                    fi = win.start_frame + i
                    frame = win.frames[i]
                    if paced:
                        now = time.perf_counter()
                        if now > next_deadline:
                            stats.frames_late += 1
                        else:
                            time.sleep(next_deadline - now)
                        next_deadline += period
                    if sink is not None:
                        sink(fi, frame)
                    self.current_frame = fi
                    delivered += 1
                    stats.frames_delivered = delivered
                    stats.wall_s = time.perf_counter() - t0
            return stats
        finally:
            self.playing = False
            stats.wall_s = time.perf_counter() - t0
