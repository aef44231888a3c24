"""Controlled calibration experiment (VERDICT r4 next#2): can the probe
NORMALIZE, or only FLAG?

DESIGN.md §4 (round 4) prescribed reading cross-round host-stage numbers
as stage_rate / probe_rate.  The two round-4 artifacts refuted that as a
normalizer: the stage/probe ratio differed 5.5x between a clean and a
contended hour, because the probe runs at a different INSTANT than the
stage and contention varies within a run.  This script settles it with a
controlled experiment on one box-hour: run (probe, stage, probe) under an
ARTIFICIAL load of L busy cores, L = 0..2*cores, and report how the
stage/probe ratio moves with load.

  linear-enough to normalize  <=> ratio ~constant across L
  contention flag only        <=> ratio drifts with L

Workload: the parse stage's dense 1080p decode_batch (the host stage the
probe brackets in bench.py) and the probe itself (native FDCT+quantize,
the same _calibration_probe bench.py runs).

Load processes are plain `python -c "while True: pass"` spinners, one per
requested core, terminated by exact PID (never by pattern).

Usage: python scripts/calibration_experiment.py [--out FILE.json]
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from mjpeg423_tpu.core.tables import YQUANT64  # noqa: E402
from mjpeg423_tpu.native import centropy  # noqa: E402


def probe_once() -> dict:
    """bench.py's _calibration_probe workload, median of 5."""
    rng = np.random.default_rng(0xCA11B)
    blocks = rng.integers(0, 256, size=(98304, 64), dtype=np.uint8)
    quant = np.ascontiguousarray(YQUANT64, dtype=np.uint16)
    out = np.empty((blocks.shape[0], 64), dtype=np.int16)
    centropy.fdct_quant_blocks(blocks, quant, out=out)  # warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        centropy.fdct_quant_blocks(blocks, quant, out=out)
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    return {
        "probe_mblocks_per_s": round(blocks.shape[0] / med / 1e6, 1),
        "probe_spread": round(times[-1] / max(times[0], 1e-9), 2),
    }


def build_stage_content(f=8):
    """Dense 1080p parse content (the bench parse stage's bm row)."""
    h, w = 1088, 1920
    b = (h // 8) * (w // 8)
    rng = np.random.default_rng(423)
    amps = np.zeros((3, f, b, 64), dtype=np.int16)
    amps[..., :8] = rng.integers(-64, 64, size=(3, f, b, 8))
    hi = rng.integers(-8, 8, size=(3, f, b, 56))
    mask = rng.random((3, f, b, 56)) < 0.15
    amps[..., 8:] = np.where(mask, hi, 0).astype(np.int16)
    blobs = [centropy.encode_plane(amps[p, fi])
             for p in range(3) for fi in range(f)]
    data = b"".join(blobs)
    lens = np.array([len(x) for x in blobs], dtype=np.uint64)
    offs = np.zeros(len(blobs), dtype=np.uint64)
    offs[1:] = np.cumsum(lens)[:-1]
    isp = np.ones(len(blobs), dtype=np.uint8)
    dest = centropy.alloc_hugepage_buf((len(blobs), b, 64), np.int16)
    return f, b, data, offs, lens, isp, dest


def stage_once(content) -> float:
    """Median-of-5 parse frames/s over the dense content."""
    f, b, data, offs, lens, isp, dest = content
    centropy.decode_batch(data, offs, lens, isp, b, out=dest)  # warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        centropy.decode_batch(data, offs, lens, isp, b, out=dest)
        times.append(time.perf_counter() - t0)
    times.sort()
    return f / times[len(times) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--loads", default=None,
                    help="comma-separated busy-core counts "
                         "(default 0..2*cores in steps)")
    args = ap.parse_args()
    if not centropy.native_available():
        print("native codec unavailable", file=sys.stderr)
        return 1

    cores = os.cpu_count() or 4
    loads = ([int(x) for x in args.loads.split(",")] if args.loads
             else sorted({0, 1, 2, cores - 1, cores, cores + 2, 2 * cores}))
    content = build_stage_content()

    rows = []
    for load in loads:
        spinners: list[subprocess.Popen] = []
        try:
            for _ in range(load):
                spinners.append(subprocess.Popen(
                    [sys.executable, "-c", "while True: pass"],
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                ))
            time.sleep(0.5)  # let the scheduler settle
            pre = probe_once()
            fps = stage_once(content)
            post = probe_once()
        finally:
            for p in spinners:  # exact PIDs only — never kill by pattern
                p.terminate()
            for p in spinners:
                p.wait(timeout=10)
        probe_mean = (pre["probe_mblocks_per_s"]
                      + post["probe_mblocks_per_s"]) / 2
        rows.append({
            "busy_cores": load,
            "probe_pre": pre,
            "probe_post": post,
            "stage_frames_per_s": round(fps, 1),
            "ratio_stage_over_probe": round(fps / probe_mean, 2),
        })
        print(f"load={load:2d}: probe {pre['probe_mblocks_per_s']:.1f}/"
              f"{post['probe_mblocks_per_s']:.1f} Mblocks/s, stage "
              f"{fps:.1f} f/s, ratio {fps / probe_mean:.2f}",
              file=sys.stderr)

    ratios = [r["ratio_stage_over_probe"] for r in rows]
    result = {
        "metric": "calibration_probe_linearity",
        "cores": cores,
        "rows": rows,
        "ratio_min": min(ratios),
        "ratio_max": max(ratios),
        "ratio_spread": round(max(ratios) / min(ratios), 2),
        "verdict": (
            "normalizer" if max(ratios) / min(ratios) <= 1.25
            else "contention flag only"
        ),
        "note": (
            "ratio_spread <= 1.25 across the load sweep would license "
            "stage/probe normalization; a larger spread means the probe "
            "can only FLAG contention (stage and probe respond "
            "differently to load: the probe is pure compute over a "
            "0.5 MB-resident buffer, the stage is a bandwidth+compute "
            "mix over ~40 MB of bitstream + 100+ MB of output)"
        ),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
