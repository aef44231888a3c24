"""Headline benchmark: 1080p-equivalent MJPEG423 device decode throughput.

Runs the full device decode transform (dequant + segmented temporal scan +
IDCT + YCbCr->RGB + raster) on synthetic coefficient streams and reports
frames/s at 1080p-equivalent (1920x1088, 4:4:4 — 32640 blocks/plane).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

vs_baseline is pixel-throughput relative to the reference FPGA player's
implied 7.37 Mpix/s (640x480 @ 24 fps; BASELINE.md — the reference publishes
no numbers, this is its hardware envelope).

Usage: python bench.py [--small] [--frames F] [--iters N] [--path auto|xla|pallas]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REF_PIX_PER_S = 640 * 480 * 24  # 7.37 Mpix/s (BASELINE.md)


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_amps(rng, f, b):
    """Synthetic entropy-decoded amplitude tensors with realistic sparsity."""
    amps = np.zeros((3, f, b, 64), dtype=np.int16)
    # Dense low-frequency content, sparse high frequency (like real streams).
    amps[..., :8] = rng.integers(-64, 64, size=(3, f, b, 8))
    hi = rng.integers(-8, 8, size=(3, f, b, 56))
    mask = rng.random((3, f, b, 56)) < 0.15
    amps[..., 8:] = np.where(mask, hi, 0).astype(np.int16)
    seg = np.zeros(f, dtype=bool)
    seg[::24] = True  # I-frame every 24 (config.h:54 max interval)
    return amps, seg


def bench_path(fn, args, iters):
    out = fn(*args)
    out.block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--path", choices=("auto", "xla", "pallas"), default="auto")
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mjpeg423_tpu.ops import transform_jax, transform_pallas

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    _log(f"backend={backend} devices={len(jax.devices())}")

    small = cli.small or not on_tpu
    if small:
        h, w, f = 272, 480, cli.frames or 8
    else:
        h, w, f = 1088, 1920, cli.frames or 16
    bh, bw = h // 8, w // 8
    b = bh * bw

    rng = np.random.default_rng(423)
    amps, seg = make_amps(rng, f, b)
    dev_args = (
        jax.device_put(jnp.asarray(amps[0])),
        jax.device_put(jnp.asarray(amps[1])),
        jax.device_put(jnp.asarray(amps[2])),
        jax.device_put(jnp.asarray(seg)),
    )

    def xla_fn(ay, acb, acr, s):
        return transform_jax.decode_transform(ay, acb, acr, s, blocks_h=bh, blocks_w=bw)

    def pallas_fn(ay, acb, acr, s):
        return transform_pallas.decode_transform_pallas(
            ay, acb, acr, s, blocks_h=bh, blocks_w=bw
        )

    candidates = {}
    if cli.path in ("auto", "xla"):
        candidates["xla"] = xla_fn
    if cli.path in ("auto", "pallas") and on_tpu:
        candidates["pallas"] = pallas_fn

    results = {}
    for name, fn in candidates.items():
        try:
            dt = bench_path(fn, dev_args, cli.iters)
        except Exception as e:  # noqa: BLE001 — a failing path must not kill bench
            _log(f"path {name} failed: {type(e).__name__}: {e}")
            continue
        fps = f / dt
        results[name] = fps
        _log(
            f"path={name}: {dt * 1e3:.2f} ms/batch({f} frames @ {w}x{h}), "
            f"{fps:.1f} frames/s, {fps * h * w / 1e6:.0f} Mpix/s, "
            f"{fps * b * 3:.3e} IDCT blocks/s"
        )

    if not results:
        print(json.dumps({"metric": "decode_1080p_frames_per_s", "value": 0,
                          "unit": "frames/s", "vs_baseline": 0}))
        return 1

    best = max(results.values())
    pix_per_s = best * h * w
    out = {
        "metric": f"decode_{w}x{h}_frames_per_s_single_chip",
        "value": round(best, 1),
        "unit": "frames/s",
        "vs_baseline": round(pix_per_s / REF_PIX_PER_S, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
