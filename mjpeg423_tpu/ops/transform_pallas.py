"""Pallas TPU kernel: fused dequantized-coefficients -> RGBA transform.

This is the hand-tuned device hot path replacing the reference's FPGA IDCT +
YCbCr->RGB accelerators (reference: idct_ycbcr_to_rgb_accel.c:19-98 drives
them; the RTL itself is absent — SURVEY.md §2.9).  One kernel fuses, per tile
of T blocks and for all three planes:

    int16 coefficient state -> islow IDCT (bit-exact int32 fixed point,
    idct.c:35-180) -> clamp -> 14-bit fixed-point YCbCr->RGB
    (ycbcr_to_rgb.c:26-49) -> packed uint32 BGRA

so the int32 pixel intermediates never touch HBM (the reference's chained
accelerators achieve the same: IDCT output streams straight into the color
core, SURVEY.md §2.9).

Layout: "coefficient-major" (64, N) — coefficient index in sublanes, block
index in lanes.  Every butterfly operand is an (8, T) tile (8 sublanes x T
lanes, T a multiple of 128), giving full VPU vreg utilization; the 8x8
within-block transpose between IDCT passes is a sublane-only shuffle.
HBM traffic per block: 3 x 128 B in + 256 B out; XLA pipelines tiles via the
BlockSpec grid (the mSGDMA double-buffering analog).

Bit-exactness: identical op-for-op integer arithmetic to ops/transform_jax.py
(the jit/XLA fallback), which is itself verified against the compiled
reference C decoder.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import tables as T

_I32 = jnp.int32

# Default lane-tile: blocks per grid step.  512 blocks = 64 KB in / 128 KB out
# per plane per tile in VMEM; with triple input + packed output + int32
# intermediates this stays well under the ~16 MB VMEM budget with double
# buffering.
DEFAULT_TILE = 512


def _descale(x, n: int):
    """(x + 2^(n-1)) >> n arithmetic, on int32 (reference: dct_math.h:48)."""
    return jax.lax.shift_right_arithmetic(x + _I32(1 << (n - 1)), _I32(n))


def _butterfly(x: list, pass1: bool) -> list:
    """islow 1-D IDCT over 8 int32 (8, T) tiles (reference: idct.c:41-180).

    Identical arithmetic to transform_jax._idct_butterfly; duplicated here so
    the kernel body has no cross-module tracing surprises.
    """
    z2, z3 = x[2], x[6]
    z1 = (z2 + z3) * _I32(T.FIX_0_541196100)
    tmp2 = z1 + z3 * _I32(-T.FIX_1_847759065)
    tmp3 = z1 + z2 * _I32(T.FIX_0_765366865)
    z2, z3 = x[0], x[4]
    tmp0 = jax.lax.shift_left(z2 + z3, _I32(T.CONST_BITS))
    tmp1 = jax.lax.shift_left(z2 - z3, _I32(T.CONST_BITS))
    tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
    tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2

    t0, t1, t2, t3 = x[7], x[5], x[3], x[1]
    z1 = t0 + t3
    z2 = t1 + t2
    z3 = t0 + t2
    z4 = t1 + t3
    z5 = (z3 + z4) * _I32(T.FIX_1_175875602)
    t0 = t0 * _I32(T.FIX_0_298631336)
    t1 = t1 * _I32(T.FIX_2_053119869)
    t2 = t2 * _I32(T.FIX_3_072711026)
    t3 = t3 * _I32(T.FIX_1_501321110)
    z1 = z1 * _I32(-T.FIX_0_899976223)
    z2 = z2 * _I32(-T.FIX_2_562915447)
    z3 = z3 * _I32(-T.FIX_1_961570560) + z5
    z4 = z4 * _I32(-T.FIX_0_390180644) + z5
    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4

    n = (T.CONST_BITS - T.PASS1_BITS) if pass1 else (T.CONST_BITS + T.PASS1_BITS + 3)
    return [
        _descale(tmp10 + t3, n),
        _descale(tmp11 + t2, n),
        _descale(tmp12 + t1, n),
        _descale(tmp13 + t0, n),
        _descale(tmp13 - t0, n),
        _descale(tmp12 - t1, n),
        _descale(tmp11 - t2, n),
        _descale(tmp10 - t3, n),
    ]


def _idct_plane(coef_ref) -> jnp.ndarray:
    """(64, T) int16 coefficient tile -> (8, 8, T) int32 samples in [0, 255].

    Returned layout: [outcol, row, T] (the stack order out of pass 2); callers
    only do elementwise math and a final fixed transpose, so the layout is an
    internal detail kept consistent across the three planes.
    """
    x3 = coef_ref[:].astype(_I32).reshape(8, 8, -1)  # [row, col, T]
    ws = _butterfly([x3[r] for r in range(8)], pass1=True)  # 8 x (8[col], T)
    w3 = jnp.stack(ws, axis=1)  # [col, row, T] — stack rows into axis 1
    cols = [w3[c] for c in range(8)]  # (8[row], T) each
    out = _butterfly(cols, pass1=False)  # 8 x (8[row], T), indexed by outcol
    o3 = jnp.stack(out, axis=0)  # [outcol, row, T]
    return jnp.clip(o3, 0, 255)


def _normalize_rgb(x):
    """if x < 0 -> 0 else min(x >> 14, 255) (reference: ycbcr_to_rgb.c:19)."""
    shifted = jax.lax.shift_right_arithmetic(x, _I32(T.COLOR_SHIFT))
    return jnp.where(x < 0, _I32(0), jnp.minimum(shifted, _I32(255)))


def _transform_kernel(y_ref, cb_ref, cr_ref, out_ref):
    """Fused dequant-state -> IDCT x3 -> color -> packed BGRA tile kernel."""
    y = _idct_plane(y_ref)
    cb = _idct_plane(cb_ref) - _I32(128)
    cr = _idct_plane(cr_ref) - _I32(128)
    yy = jax.lax.shift_left(y, _I32(T.COLOR_SHIFT))
    r = _normalize_rgb(yy + _I32(T.C_CR_R) * cr)
    g = _normalize_rgb(yy - _I32(T.C_CB_G) * cb - _I32(T.C_CR_G) * cr)
    b = _normalize_rgb(yy + _I32(T.C_CB_B) * cb)
    packed = b | jax.lax.shift_left(g, _I32(8)) | jax.lax.shift_left(r, _I32(16))
    # [outcol, row, T] -> natural coefficient-major [row*8+col, T].
    natural = jnp.swapaxes(packed, 0, 1).reshape(64, -1)
    out_ref[:] = natural.astype(jnp.uint32)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def transform_coefmajor(
    y: jnp.ndarray,
    cb: jnp.ndarray,
    cr: jnp.ndarray,
    *,
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Coefficient-major states (64, N) int16 x3 -> (64, N) uint32 packed BGRA.

    N must be a multiple of `tile` (pad with zero blocks; a zero coefficient
    block is valid input and its output is simply discarded by the caller).
    """
    if interpret is None:
        interpret = not _on_tpu()
    n = y.shape[1]
    assert n % tile == 0, f"block count {n} not a multiple of tile {tile}"
    grid = (n // tile,)
    spec = pl.BlockSpec((64, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    bytes_in = 3 * 64 * n * 2
    bytes_out = 64 * n * 4
    return pl.pallas_call(
        _transform_kernel,
        out_shape=jax.ShapeDtypeStruct((64, n), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((64, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            # ~29 multiplies + ~70 adds/shifts per 8-sample butterfly pass,
            # 16 passes/block/plane + color: call it ~2600 int ops per block.
            flops=2600 * 3 * n,
            bytes_accessed=bytes_in + bytes_out,
            transcendentals=0,
        ),
        interpret=interpret,
    )(y, cb, cr)


def _pad_blocks(x: jnp.ndarray, tile: int) -> jnp.ndarray:
    n = x.shape[1]
    pad = (-n) % tile
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


@functools.partial(
    jax.jit, static_argnames=("blocks_h", "blocks_w", "tile", "interpret")
)
def decode_transform_states_pallas(
    y_state: jnp.ndarray,
    cb_state: jnp.ndarray,
    cr_state: jnp.ndarray,
    *,
    blocks_h: int,
    blocks_w: int,
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pre-accumulated (..., B, 64) int16 states -> (..., H, W) uint32 RGBA.

    Drop-in replacement for transform_jax.decode_transform_states with the
    fused Pallas hot path.  The layout shuffles into/out of coefficient-major
    are single XLA transposes (input is half the bytes of output, so the
    unavoidable relayout rides the cheaper side; the output transpose doubles
    as the block->raster reassembly).
    """
    lead = y_state.shape[:-2]
    b = y_state.shape[-2]
    n = 1
    for d in lead:
        n *= d
    n *= b

    def to_cm(x):  # (..., B, 64) -> (64, N) coefficient-major
        return _pad_blocks(x.reshape(n, 64).T, tile)

    packed = transform_coefmajor(
        to_cm(y_state), to_cm(cb_state), to_cm(cr_state),
        tile=tile, interpret=interpret,
    )[:, :n]
    # (64, N) -> raster: [r*8+c, f*B + by*bw + bx] -> (..., bh*8, bw*8)
    x = packed.reshape(8, 8, *lead, blocks_h, blocks_w)
    k = len(lead)
    # axes: (r, c, *lead, by, bx) -> (*lead, by, r, bx, c)
    perm = tuple(range(2, 2 + k)) + (2 + k, 0, 3 + k, 1)
    return x.transpose(perm).reshape(*lead, blocks_h * 8, blocks_w * 8)


from .transform_jax import dequantize, quant_tensors, segmented_scan  # noqa: E402


@functools.partial(
    jax.jit, static_argnames=("blocks_h", "blocks_w", "tile", "interpret")
)
def decode_transform_pallas(
    amps_y: jnp.ndarray,
    amps_cb: jnp.ndarray,
    amps_cr: jnp.ndarray,
    is_iframe: jnp.ndarray,
    *,
    blocks_h: int,
    blocks_w: int,
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Full device decode, Pallas hot path: amplitudes -> (F, H, W) RGBA.

    Same contract as transform_jax.decode_transform: amps (F, B, 64) int16
    with I-frame DC cumsum pre-applied, is_iframe (F,) bool.  Dequant + the
    segmented temporal prefix-sum stay in XLA (exact int16, bandwidth-trivial
    next to the transform); the IDCT+color transform runs in the fused kernel.
    """
    yq, cq = quant_tensors()
    states = []
    for amps, q in ((amps_y, yq), (amps_cb, cq), (amps_cr, cq)):
        states.append(segmented_scan(dequantize(amps, q), is_iframe))
    return decode_transform_states_pallas(
        *states, blocks_h=blocks_h, blocks_w=blocks_w, tile=tile,
        interpret=interpret,
    )
