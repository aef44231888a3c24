"""Device mesh construction for sharded MJPEG423 decode.

The reference's parallelism (SURVEY.md §2, parallelism table) maps onto two
mesh axes:

  "data"  — GOP / frame-batch sharding (the dual-core task split and the
            "many independent streams" axis; reference: GOP independence via
            I-frame state reset, lossless_decode.c:76-78).
  "block" — spatial block sharding within a frame (the accelerator's
            block-stream data parallelism; reference:
            idct_ycbcr_to_rgb_accel.c:28-37 feeds whole planes of blocks).

Both axes are embarrassingly parallel for the transform; collectives appear
only in the cross-device temporal scan (temporal.py) and metric reductions.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
BLOCK_AXIS = "block"


def make_mesh(
    n_data: int | None = None,
    n_block: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, block) mesh over the given (default: all) devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_block
    need = n_data * n_block
    if need > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_block} needs {need} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(n_data, n_block)
    return Mesh(arr, (DATA_AXIS, BLOCK_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (frames / GOPs) over "data", replicate over "block"."""
    return NamedSharding(mesh, P(DATA_AXIS))


def frame_block_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (F, B, 64) tensors: frames over "data", blocks over "block"."""
    return NamedSharding(mesh, P(DATA_AXIS, BLOCK_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
