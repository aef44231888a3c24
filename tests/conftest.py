"""Test configuration: force an 8-device virtual CPU mesh for JAX tests.

Multi-chip hardware is not available in CI; sharding correctness is validated
on a virtual CPU mesh (the driver separately dry-run-compiles the multi-chip
path via __graft_entry__.dryrun_multichip).  bench.py, NOT the tests, runs on
the real TPU chip.
"""
import os

# Force CPU even if the environment selects the TPU platform (e.g. axon):
# tests validate sharding on the virtual 8-device mesh; bench.py runs on TPU.
# A pytest plugin imports jax before this conftest, so the env var alone is
# too late — update the live jax config as well (backends init lazily, so
# this sticks as long as no device has been touched yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(423)


def make_test_frames(rng, num_frames=6, h=48, w=64, motion=True):
    """Synthetic RGB frames: smooth gradients + moving square + noise.

    Exercises DC chains (gradients), P-frame deltas (motion), and the
    clamping paths (saturated patches).
    """
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(num_frames):
        base = np.zeros((h, w, 3), dtype=np.float64)
        base[..., 0] = (xx * 255 / w + t * 3) % 256
        base[..., 1] = (yy * 255 / h) % 256
        base[..., 2] = ((xx + yy) * 2 + t * 5) % 256
        if motion:
            x0 = (t * 7) % max(w - 16, 1)
            y0 = (t * 5) % max(h - 16, 1)
            base[y0:y0 + 16, x0:x0 + 16] = [255, 255, 255]
            base[:8, :8] = [0, 0, 0]
        noise = rng.integers(0, 12, size=(h, w, 3))
        frames.append(np.clip(base + noise, 0, 255).astype(np.uint8))
    return frames
