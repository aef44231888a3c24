from .pipeline import DecodedWindow, DecodePipeline
from .playback import PlaybackStats, Player

__all__ = ["DecodePipeline", "DecodedWindow", "Player", "PlaybackStats"]
