"""GOP partitioning logic for multi-host decode (pure host-side math)."""
import numpy as np
import pytest

from mjpeg423_tpu.parallel.multihost import (
    GopPartition,
    aggregate_counts,
    initialize,
    partition_gops,
)


def _check_cover(parts, n_gops, n_frames):
    assert parts[0].gop_lo == 0
    assert parts[-1].gop_hi == n_gops
    assert parts[0].frame_lo == 0
    assert parts[-1].frame_hi == n_frames
    for a, b in zip(parts, parts[1:]):
        assert a.gop_hi == b.gop_lo
        assert a.frame_hi == b.frame_lo


def test_partition_even_gops():
    starts = [0, 10, 20, 30]
    parts = partition_gops(starts, 40, 2)
    _check_cover(parts, 4, 40)
    assert [p.num_frames for p in parts] == [20, 20]


def test_partition_uneven_gops_balances_frames():
    # GOP sizes 30, 1, 1, 1, 1: one fat GOP should go alone to host 0.
    starts = [0, 30, 31, 32, 33]
    parts = partition_gops(starts, 34, 2)
    _check_cover(parts, 5, 34)
    sizes = [p.num_frames for p in parts]
    assert max(sizes) - min(sizes) <= 30  # host 0 takes the fat GOP only
    assert sizes[0] == 30

def test_partition_more_hosts_than_gops():
    starts = [0, 5]
    parts = partition_gops(starts, 10, 4)
    _check_cover(parts, 2, 10)
    nonempty = [p for p in parts if p.num_frames]
    assert sum(p.num_frames for p in nonempty) == 10


def test_partition_single_host_takes_all():
    starts = [0, 7, 14]
    (p,) = partition_gops(starts, 20, 1)
    assert (p.gop_lo, p.gop_hi, p.frame_lo, p.frame_hi) == (0, 3, 0, 20)


def test_initialize_noop_and_aggregate_identity():
    assert initialize() == (0, 1)
    assert aggregate_counts(42.0) == 42.0
