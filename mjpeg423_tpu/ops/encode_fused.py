"""Fused Pallas encode transform: sample blocks -> quantized planes, one pass.

The encode-side mirror of transform_fused.py.  encode_jax.encode_transform
(plain XLA) pays separate HBM passes for the FDCT's two butterfly stages,
the quantize, and the I/P differencing; this kernel runs FDCT + exact
quantize entirely in VMEM and writes ABSOLUTE quantized amplitudes — the
only output the round-2 encoder needs, because the host's select-then-pack
flow (codec/encoder.py) computes the I-DC chain and P deltas inline in the
C packer from absolute planes.  Dropping the differencing from the device
step removes the decode kernel's carry/seg machinery entirely: every block
is independent, so the grid is embarrassingly parallel.

    grid step = (frame, block-row group)
    in:   (3, 1, 1, bw, 64) uint8 sample blocks  (one plane-set slice)
          (2, 64)           int16 quant tables   (VMEM, [yq, cq])
    out:  (3, 1, 1, bw, 64) int16 absolute quantized amplitudes

    per plane: transpose to coefficient-major -> LL&M forward butterflies
    on (8, bw) int32 tiles with int16 DCTELEM wrap between passes
    (fdct.c:52-87) -> exact round-half-away quantize -> transpose back.

Quantize exactness on the VPU: mag = floor((2|c| + q) / (2q)) computed as
an f32 division plus integer fixups.  Numerator < 2^17 and denominator
< 2^9 are both exact in f32; the correctly-rounded quotient's floor can be
off by at most one, and the remainder test (r >= d -> +1, r < 0 -> -1)
restores the exact integer floor — identical to the host's
Granlund-Montgomery path (centropy.c) and C round((double)c/q)
(quantize.c:16) for the full int16 range.

Bit-exactness vs encode_ref.fdct_blocks + quantize_blocks is enforced by
tests/test_encode_fused.py; container-level equality flows through the
existing oracle tests once encode_frames_device picks this kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import tables as T
from .encode_jax import _fdct_butterfly

_I32 = jnp.int32


def _fdct_quant_cm(scm: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Coefficient-major FDCT + quantize.

    scm: (64, Tb) uint8/int32 samples (row-major 8x8 flattened along dim 0).
    q:   (64, 1) int32 quant divisors.
    Returns (64, Tb) int16 quantized coefficients, natural order.
    """
    x3 = scm.astype(_I32).reshape(8, 8, -1)  # [row, col, Tb]
    # Pass 1: butterfly across each row's 8 columns (vectorized over rows).
    p1 = _fdct_butterfly([x3[:, c, :] for c in range(8)], pass1=True)
    # int16 DCTELEM stores between passes (fdct.c:52-87).
    p1 = [v.astype(jnp.int16).astype(_I32) for v in p1]
    w = jnp.stack(p1, axis=1)  # [row, u, Tb]
    # Pass 2: butterfly across each column's 8 rows.
    p2 = _fdct_butterfly([w[r] for r in range(8)], pass1=False)
    c = jnp.stack(p2, axis=0).astype(jnp.int16)  # [v, u, Tb]
    c32 = c.astype(_I32).reshape(64, -1)
    # Exact round-half-away-from-zero: sign(c) * floor((2|c| + q) / (2q)).
    # floor via reciprocal MULTIPLY (f32 divide is the VPU's slowest op;
    # the 64 per-table reciprocals cost one tiny divide per grid step):
    # |relative error| < 2^-21 keeps the estimate within +-1 of the true
    # floor for u < 2^17, and the remainder fixups restore exactness.
    u = 2 * jnp.abs(c32) + q
    d = 2 * q
    recip = jnp.float32(1.0) / d.astype(jnp.float32)  # (64, 1)
    t = jnp.floor(u.astype(jnp.float32) * recip).astype(_I32)
    r = u - t * d
    t = t + (r >= d).astype(_I32) - (r < 0).astype(_I32)
    return (jnp.sign(c32) * t).astype(jnp.int16)


def auto_rows_per_step_encode(blocks_h: int, blocks_w: int) -> int:
    """Block-row fold for the encode kernel (lane-tile width = k*bw).

    The encode grid carries no window dimension (one frame per step), so
    VMEM pressure is far lower than decode's and the fold can go much
    wider: measured @1080p (bw=240) — k=2: 5.3 ms, k=8: 4.25 ms,
    k=17 (4080 lanes): 4.3 ms per 16-frame batch.  Smallest fold reaching
    >= 1920 lanes, capped at 4096 (k=17's 4080 compiled and ran)."""
    from .transform_fused import pick_fold

    return pick_fold(blocks_h, blocks_w, target=1920, lane_cap=4096)


def _kernel(quants_ref, samples_ref, out_ref):
    # One frame x one block-row group per grid step.  A decode-style
    # W-folded variant (all frames per step, fori inside) measured SLOWER
    # (5.7 vs 5.3 ms per 16-frame 1080p batch) and OOMs VMEM at k=2: the
    # kernel is VPU-bound, not grid-overhead-bound, so the small step wins.
    for p in range(3):
        s = samples_ref[p, 0, 0]                      # (bw, 64) uint8
        q = quants_ref[min(p, 1)].astype(_I32).reshape(64, 1)
        out_ref[p, 0, 0] = _fdct_quant_cm(s.T, q).T   # (bw, 64) int16


@functools.partial(
    jax.jit, static_argnames=("blocks_h", "blocks_w", "interpret",
                              "rows_per_step")
)
def encode_window_fused(
    samples: jnp.ndarray,
    *,
    blocks_h: int,
    blocks_w: int,
    interpret: bool | None = None,
    rows_per_step: int = 1,
) -> jnp.ndarray:
    """Fused FDCT + quantize of a frame window.

    samples: (3, W, B, 64) uint8 blocked Y/Cb/Cr sample planes (B =
    blocks_h * blocks_w row-major; each block 8x8 flattened).
    Returns (3, W, B, 64) int16 ABSOLUTE quantized amplitudes — feed to
    codec/encoder.encode_quantized_frames (the packer applies I-DC chains
    and P deltas inline).

    rows_per_step folds k block-rows into one grid step (lane tiles widen
    to k*blocks_w), the same VPU-efficiency knob as the decode kernel's
    auto_rows_per_step.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, w_frames, b, _ = samples.shape
    assert b == blocks_h * blocks_w, (b, blocks_h, blocks_w)
    k = rows_per_step
    if blocks_h % k:
        raise ValueError(
            f"blocks_h {blocks_h} not divisible by rows_per_step {k}"
        )
    groups = blocks_h // k
    bw_eff = k * blocks_w
    quants = jnp.stack([
        jnp.asarray(T.YQUANT64, dtype=jnp.int16),
        jnp.asarray(T.CQUANT64, dtype=jnp.int16),
    ])
    s5 = samples.reshape(3, w_frames, groups, bw_eff, 64)
    out = pl.pallas_call(
        _kernel,
        grid=(w_frames, groups),
        in_specs=[
            pl.BlockSpec((2, 64), lambda f, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3, 1, 1, bw_eff, 64),
                lambda f, g: (0, f, g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, 1, 1, bw_eff, 64),
            lambda f, g: (0, f, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (3, w_frames, groups, bw_eff, 64), jnp.int16
        ),
        cost_estimate=pl.CostEstimate(
            flops=2600 * 3 * w_frames * b,
            bytes_accessed=samples.size + samples.size * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(quants, s5)
    return out.reshape(3, w_frames, b, 64)
