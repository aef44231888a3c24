from .live import LiveWriter, decode_live, decode_live_array, live_stream_bytes
from .pipeline import DecodedWindow, DecodePipeline, RecoveryLog
from .playback import PlaybackStats, Player, play_live

__all__ = [
    "DecodePipeline",
    "DecodedWindow",
    "RecoveryLog",
    "LiveWriter",
    "Player",
    "PlaybackStats",
    "decode_live",
    "decode_live_array",
    "live_stream_bytes",
    "play_live",
]
