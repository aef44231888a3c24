"""Fully-fused Pallas decode window: amps -> raster frames in ONE HBM pass.

The v2 hot path.  transform_pallas.py fuses IDCT+color but still pays three
extra HBM round trips per batch: the dequant+temporal-scan pass (XLA), the
input relayout to coefficient-major, and the output block->raster transpose.
This kernel moves all of them into VMEM:

    grid step = one block-row of the frame, all W frames of the window
    in:   (W, 1)            int32 I-frame mask  (SMEM)
          (3, W, 1, bw, 64) int16 amplitudes    (one block-row slice)
          (3, 1, bw, 64)    int16 carry state   (previous window's last frame)
    out:  (W, 8, width)     uint32 raster rows  + new carry

    per frame f (sequential fori, W small):
      per plane: dequant (VPU) -> state update (I: replace, P: += int16)
      -> in-VMEM transpose to coefficient-major -> islow IDCT butterflies on
      (8, bw) int32 tiles -> color convert + BGRA pack -> in-VMEM transpose
      to raster rows -> dynamic store out_ref[f].

HBM traffic per window: read amps (3 x W x B x 128 B) + write raster
(W x H x width x 4 B) + carry — the information-theoretic minimum for this
stage.  The temporal recurrence runs sequentially inside the kernel (W <= ~32
iterations of pure VPU work per grid step); parallelism comes from the grid
over block-rows and XLA's pipelining of grid steps (the mSGDMA double
buffering analog).

Bit-exactness: same integer ops as transform_jax.py / the reference
(idct.c:35-180, ycbcr_to_rgb.c:26-49, lossless_decode.c:76-128).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import tables as T
from .transform_pallas import _butterfly, _normalize_rgb

_I32 = jnp.int32


def _idct_cm(xcm: jnp.ndarray) -> jnp.ndarray:
    """Coefficient-major (64, Tb) int16 -> (8[outcol], 8[row], Tb) int32 samples."""
    x3 = xcm.astype(_I32).reshape(8, 8, -1)  # [row, col, Tb]
    ws = _butterfly([x3[r] for r in range(8)], pass1=True)
    w3 = jnp.stack(ws, axis=1)  # [col, row, Tb]
    out = _butterfly([w3[c] for c in range(8)], pass1=False)
    return jnp.clip(jnp.stack(out, axis=0), 0, 255)  # [outcol, row, Tb]


def _window_body(w_frames: int, cm_state: bool):
    """The ONE fused-window kernel body, shared by all three input
    variants (block-major, coefficient-major, int8-packed).  They differ
    only in how the dequantized delta is loaded — `load_delta(p, f)` —
    and in the state orientation: cm_state=True keeps (64, lanes)
    coefficient-major tiles the IDCT consumes directly, cm_state=False
    keeps (lanes, 64) block-major tiles that transpose in VMEM.  One body
    means a color-math or packing fix can never drift between variants
    (the same rule the native 16x16 transpose follows).

    Per frame: state update (I: replace, P: += int16 — the
    MPEG_WORKING_BUFFER DCAC analog, mpeg423_decoder_ext.h:35-41) ->
    islow IDCT -> color convert + BGRA pack -> blocked store.  The
    wrapper does the raster transpose in XLA (a lane-interleaving reshape
    is not Mosaic-expressible); out layout [W, outcol, brow, row, bw]
    keeps the grid-blocked brow dim out of the tiled last-two dims.
    """
    def body(seg_ref, load_delta, carry_ref, out_ref, carry_out_ref, state):
        for p in range(3):
            state[p] = carry_ref[p, 0]

        def frame_body(f, _):
            is_i = seg_ref[f, 0] != 0
            planes = []
            for p in range(3):
                delta = load_delta(p, f)
                st = jnp.where(
                    is_i, delta, (state[p] + delta).astype(jnp.int16)
                )
                state[p] = st
                planes.append(_idct_cm(st if cm_state else st.T))
            y, cb, cr = planes
            cb = cb - _I32(128)
            cr = cr - _I32(128)
            yy = jax.lax.shift_left(y, _I32(T.COLOR_SHIFT))
            r = _normalize_rgb(yy + _I32(T.C_CR_R) * cr)
            g = _normalize_rgb(yy - _I32(T.C_CB_G) * cb - _I32(T.C_CR_G) * cr)
            b = _normalize_rgb(yy + _I32(T.C_CB_B) * cb)
            packed = (
                b
                | jax.lax.shift_left(g, _I32(8))
                | jax.lax.shift_left(r, _I32(16))
            ).astype(jnp.uint32)                        # [outcol, row, bw]
            out_ref[f, :, 0] = packed
            return 0

        jax.lax.fori_loop(0, w_frames, frame_body, 0)
        for p in range(3):
            carry_out_ref[p, 0] = state[p]

    return body


def _unfold_raster(frames, w_frames: int, blocks_h: int, blocks_w: int,
                   k: int):
    """Undo the k-fold and the blocked layout in one XLA transpose:
    [W, outcol, g, row, k, bw] -> [W, g, k, row, bw, outcol] -> raster."""
    groups = blocks_h // k
    x = frames.reshape(w_frames, 8, groups, 8, k, blocks_w)
    return x.transpose(0, 2, 4, 3, 5, 1).reshape(
        w_frames, blocks_h * 8, blocks_w * 8
    )


def _make_kernel(w_frames: int):
    def kernel(seg_ref, quants_ref, amps_ref, carry_ref, out_ref,
               carry_out_ref, state):
        """Block-major variant: state scratch (3, bw, 64) int16."""
        def load_delta(p, f):
            amp = amps_ref[p, f, 0]                     # (bw, 64) int16
            # quants_ref rows: [yq, cq]; planes (y, cb, cr) -> (0, 1, 1).
            # Multiply in int32 (v5e has no 16-bit vector multiply) and
            # truncate — identical to the int16 modular product.
            return (
                amp.astype(_I32) * quants_ref[min(p, 1)].astype(_I32)
            ).astype(jnp.int16)

        _window_body(w_frames, cm_state=False)(
            seg_ref, load_delta, carry_ref, out_ref, carry_out_ref, state
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "blocks_h", "blocks_w", "interpret", "raster", "rows_per_step"
    ),
)
def decode_window_fused(
    amps: jnp.ndarray,
    seg: jnp.ndarray,
    carry: jnp.ndarray,
    *,
    blocks_h: int,
    blocks_w: int,
    interpret: bool | None = None,
    raster: bool = True,
    rows_per_step: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused decode of a frame window with coefficient-state carry.

    amps:  (3, W, B, 64) int16 entropy-decoded amplitudes (I-frame DC cumsum
           pre-applied; B = blocks_h * blocks_w row-major).
    seg:   (W,) bool I-frame mask.
    carry: (3, B, 64) int16 state of the frame before the window (zeros for
           the first window of a stream — a leading I-frame overwrites it).
    Returns (frames, new_carry (3, B, 64) int16); frames is (W, H, width)
    uint32 raster when raster=True, else the kernel's native blocked layout
    (W, 8[outcol], blocks_h, 8[row], blocks_w).  The device-side raster
    transpose is PATHOLOGICAL on TPU (~85 ms per 16-frame 1080p batch,
    ~45x the kernel itself — XLA's minor-dim-8 pattern runs at ~3 GB/s):
    take raster=False and convert after transfer with
    blocked_to_raster_host (native OpenMP, same transfer bytes) unless the
    consumer is device-resident AND needs raster rows.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, w_frames, b, _ = amps.shape
    assert b == blocks_h * blocks_w, (b, blocks_h, blocks_w)
    # rows_per_step (k) folds k block-rows into one grid step: lane tiles
    # widen from bw to k*bw and the grid shrinks k-fold (trade VMEM for
    # VPU/grid efficiency).  Row-major block order makes the fold a pure
    # reshape.
    k = rows_per_step
    if blocks_h % k:
        raise ValueError(f"blocks_h {blocks_h} not divisible by rows_per_step {k}")
    groups = blocks_h // k
    bw_eff = k * blocks_w
    quants = jnp.stack([
        jnp.asarray(T.YQUANT64, dtype=jnp.int16),
        jnp.asarray(T.CQUANT64, dtype=jnp.int16),
    ])
    seg_i = seg.astype(jnp.int32).reshape(w_frames, 1)

    amps5 = amps.reshape(3, w_frames, groups, bw_eff, 64)
    carry4 = carry.reshape(3, groups, bw_eff, 64)

    frames, new_carry = pl.pallas_call(
        _make_kernel(w_frames),
        grid=(groups,),
        in_specs=[
            pl.BlockSpec(
                (w_frames, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (2, 64), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, w_frames, 1, bw_eff, 64),
                lambda i: (0, 0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 1, bw_eff, 64),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (w_frames, 8, 1, 8, bw_eff),
                lambda i: (0, 0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 1, bw_eff, 64),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (w_frames, 8, groups, 8, bw_eff), jnp.uint32
            ),
            jax.ShapeDtypeStruct((3, groups, bw_eff, 64), jnp.int16),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, bw_eff, 64), jnp.int16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2600 * 3 * w_frames * b,
            bytes_accessed=amps.size * 2 + w_frames * b * 64 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg_i, quants, amps5, carry4)
    new_carry = new_carry.reshape(3, b, 64)
    if not raster:
        return frames, new_carry
    return _unfold_raster(frames, w_frames, blocks_h, blocks_w, k), new_carry


def _make_kernel_cm(w_frames: int):
    def kernel(seg_ref, quants_ref, amps_ref, carry_ref, out_ref,
               carry_out_ref, state):
        """Coefficient-major variant: amps arrive as (.., 64, bw) tiles so
        neither the state nor the IDCT input needs an in-VMEM transpose
        (the kernel is VPU-bound, not bandwidth-bound — transposes were
        measurable).  State scratch is (3, 64, bw) coefficient-major."""
        def load_delta(p, f):
            amp = amps_ref[p, f, 0]                     # (64, bw) int16
            # Widen before the (64,) -> (64, 1) reshape: Mosaic only
            # supports non-no-op minor-dim insertion on 32-bit types.
            q = quants_ref[min(p, 1)].astype(_I32).reshape(64, 1)
            return (amp.astype(_I32) * q).astype(jnp.int16)

        _window_body(w_frames, cm_state=True)(
            seg_ref, load_delta, carry_ref, out_ref, carry_out_ref, state
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "blocks_h", "blocks_w", "interpret", "raster", "rows_per_step"
    ),
)
def decode_window_fused_cm(
    amps_cm: jnp.ndarray,
    seg: jnp.ndarray,
    carry_cm: jnp.ndarray,
    *,
    blocks_h: int,
    blocks_w: int,
    interpret: bool | None = None,
    raster: bool = True,
    rows_per_step: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Coefficient-major fused decode.

    amps_cm:  (3, W, bh/k, 64, k*bw) int16 with k = rows_per_step — the
              native parser's decode_batch_cm layout with row_blocks=k*bw
              (centropy.c decode_plane_cm: k block-rows fold into one lane
              tile; pass rows_per_step > 1 when bw alone underfills the
              128-lane vregs, e.g. VGA's bw=80).
    carry_cm: (3, bh/k, 64, k*bw) int16 state in the same layout.
    Output identical to decode_window_fused.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = rows_per_step
    if blocks_h % k:
        raise ValueError(
            f"blocks_h {blocks_h} not divisible by rows_per_step {k}"
        )
    groups = blocks_h // k
    bw_eff = k * blocks_w
    _, w_frames, g_in, _, bw_in = amps_cm.shape
    assert (g_in, bw_in) == (groups, bw_eff), (g_in, bw_in, groups, bw_eff)
    bh, bw = groups, bw_eff  # the kernel operates on the folded geometry
    quants = jnp.stack([
        jnp.asarray(T.YQUANT64, dtype=jnp.int16),
        jnp.asarray(T.CQUANT64, dtype=jnp.int16),
    ])
    seg_i = seg.astype(jnp.int32).reshape(w_frames, 1)

    frames, new_carry = pl.pallas_call(
        _make_kernel_cm(w_frames),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec(
                (w_frames, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (2, 64), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, w_frames, 1, 64, bw),
                lambda i: (0, 0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 1, 64, bw),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (w_frames, 8, 1, 8, bw),
                lambda i: (0, 0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 1, 64, bw),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w_frames, 8, bh, 8, bw), jnp.uint32),
            jax.ShapeDtypeStruct((3, bh, 64, bw), jnp.int16),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, 64, bw), jnp.int16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2600 * 3 * w_frames * bh * bw,
            bytes_accessed=amps_cm.size * 2 + w_frames * bh * bw * 64 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg_i, quants, amps_cm, carry_cm)
    if not raster:
        return frames, new_carry
    return _unfold_raster(frames, w_frames, blocks_h, blocks_w, k), new_carry


def pack_amps_i8(amps):
    """Host-side compressed packing: (3, W, B, 64) int16 -> (dc, ac8) or None.

    dc: (3, W, B) int16 (DC needs the full range — the I-frame cumsum wraps
    int16); ac8: (3, W, B, 64) int8 with position 0 zeroed.  Returns None
    when any AC amplitude exceeds int8 (the caller uses the int16 kernel —
    VLI amplitudes reach +/-2047, but quantized AC of real content rarely
    leaves int8).  Input HBM traffic drops 128 -> 66 bytes per block.
    """
    import numpy as np

    ac = amps[..., 1:]
    if ac.max(initial=0) > 127 or ac.min(initial=0) < -128:
        return None
    dc = np.ascontiguousarray(amps[..., 0])
    ac8 = amps.astype(np.int8)
    ac8[..., 0] = 0
    return dc, ac8


def _make_kernel_i8(w_frames: int):
    def kernel(seg_ref, quants_ref, dc_ref, ac_ref, carry_ref, out_ref,
               carry_out_ref, state):
        """int8-AC variant of the fused window kernel (same math, the AC
        amplitudes widen in VMEM; DC merges into lane 0 via a select)."""
        def load_delta(p, f):
            ac = ac_ref[p, f, 0].astype(_I32)              # (bw, 64)
            dc = dc_ref[p, f, 0].astype(_I32)              # (bw, 1)
            lane = jax.lax.broadcasted_iota(_I32, ac.shape, 1)
            amp = jnp.where(lane == 0, dc, ac)
            return (
                amp * quants_ref[min(p, 1)].astype(_I32)
            ).astype(jnp.int16)

        _window_body(w_frames, cm_state=False)(
            seg_ref, load_delta, carry_ref, out_ref, carry_out_ref, state
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("blocks_h", "blocks_w", "interpret", "raster"),
)
def decode_window_fused_i8(
    dc: jnp.ndarray,
    ac8: jnp.ndarray,
    seg: jnp.ndarray,
    carry: jnp.ndarray,
    *,
    blocks_h: int,
    blocks_w: int,
    interpret: bool | None = None,
    raster: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compressed-input fused decode: see pack_amps_i8 for the format.

    Bit-identical to decode_window_fused on inputs that pack losslessly.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, w_frames, b = dc.shape
    assert b == blocks_h * blocks_w, (b, blocks_h, blocks_w)
    quants = jnp.stack([
        jnp.asarray(T.YQUANT64, dtype=jnp.int16),
        jnp.asarray(T.CQUANT64, dtype=jnp.int16),
    ])
    seg_i = seg.astype(jnp.int32).reshape(w_frames, 1)
    dc4 = dc.reshape(3, w_frames, blocks_h, blocks_w, 1)
    ac5 = ac8.reshape(3, w_frames, blocks_h, blocks_w, 64)
    carry4 = carry.reshape(3, blocks_h, blocks_w, 64)

    frames, new_carry = pl.pallas_call(
        _make_kernel_i8(w_frames),
        grid=(blocks_h,),
        in_specs=[
            pl.BlockSpec(
                (w_frames, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (2, 64), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (3, w_frames, 1, blocks_w, 1),
                lambda i: (0, 0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, w_frames, 1, blocks_w, 64),
                lambda i: (0, 0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 1, blocks_w, 64),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (w_frames, 8, 1, 8, blocks_w),
                lambda i: (0, 0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 1, blocks_w, 64),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (w_frames, 8, blocks_h, 8, blocks_w), jnp.uint32
            ),
            jax.ShapeDtypeStruct((3, blocks_h, blocks_w, 64), jnp.int16),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, blocks_w, 64), jnp.int16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2600 * 3 * w_frames * b,
            bytes_accessed=ac8.size + dc.size * 2 + w_frames * b * 64 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seg_i, quants, dc4, ac5, carry4)
    new_carry = new_carry.reshape(3, b, 64)
    if not raster:
        return frames, new_carry
    return _unfold_raster(frames, w_frames, blocks_h, blocks_w, 1), new_carry


def pick_fold(rows: int, bw: int, *, target: int, lane_cap: int) -> int:
    """Shared block-row fold selector (rows_per_step = k, lane width k*bw).

    Smallest k dividing `rows` with k*bw <= lane_cap, stopping at the first
    k whose lane width reaches `target`; the largest fitting fold otherwise.
    The three calibrations (decode streaming, block-major sharded, encode)
    differ ONLY in (target, lane_cap) — keeping the selection loop in one
    place so a VMEM-model fix can't silently miss a copy.
    """
    best = 1
    for k in range(1, rows + 1):
        if rows % k or k * bw > lane_cap:
            continue
        best = k
        if k * bw >= target:
            return k
    return best


def to_cm(amps, blocks_h: int, blocks_w: int, rows_per_step: int = 1):
    """Block-major (..., B, 64) -> the cm kernel layout (..., bh/k, 64, k*bw).

    Host-side reference for the layout decode_window_fused_cm consumes (the
    native parser's decode_batch_cm emits it directly with no extra cost);
    bench/tests use this so they can never drift from the kernel's layout.
    """
    import numpy as np

    k = rows_per_step
    g, bwe = blocks_h // k, k * blocks_w
    a = np.asarray(amps)
    return np.ascontiguousarray(
        a.reshape(a.shape[:-2] + (g, bwe, 64)).swapaxes(-1, -2)
    )


def blocked_to_raster_host(
    blocked: "np.ndarray",  # noqa: F821
    blocks_h: int | None = None,
    blocks_w: int | None = None,
):
    """Host-side raster conversion of the kernel's blocked output.

    blocked: (W, 8[outcol], bh/k, 8[row], k*bw) uint32 (NumPy) — the
    raster=False output of any fused kernel variant, including a
    rows_per_step fold k > 1 (pass the true blocks_h/blocks_w to unfold;
    defaults assume k = 1).  The final reshape copies (the transpose view
    is non-contiguous), but a host memcpy is orders of magnitude cheaper
    than the device-side XLA transpose, whose minor-dim-8 pattern measures
    ~85 ms per 16-frame 1080p batch on v5e vs 1.8 ms for the kernel
    itself — frames that land on the host should ALWAYS travel blocked.
    """
    import numpy as np

    w, _, g, _, bw_eff = blocked.shape
    if blocks_h is None:
        blocks_h, blocks_w = g, bw_eff
    from ..native import centropy

    native = centropy.blocked_to_raster(
        np.asarray(blocked), blocks_h, blocks_w
    )
    if native is not None:
        return native
    k = blocks_h // g
    x = np.asarray(blocked).reshape(w, 8, g, 8, k, blocks_w)
    return x.transpose(0, 2, 4, 3, 5, 1).reshape(
        w, blocks_h * 8, blocks_w * 8
    )
