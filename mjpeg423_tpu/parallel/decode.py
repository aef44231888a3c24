"""Sharded device decode: the multi-chip transform step.

Composes the mesh axes (parallel/mesh.py) with the decode transform:

  * "data" shards the frame axis.  With GOP-aligned shards the temporal scan
    is shard-local (GOPs are independent, SURVEY.md §5.7); with arbitrary
    frame sharding the cross-device carry is one all-gather
    (parallel/temporal.py).
  * "block" shards the block axis of every (F, B, 64) tensor.  The transform
    is elementwise over blocks, so this needs no collectives at all — the
    analog of the reference accelerator consuming an arbitrary sub-stream of
    blocks (idct_ycbcr_to_rgb_accel.c:28-37).

The returned frames stay sharded (data axis over frames, block axis over
raster rows); callers gather only what they consume.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import transform_fused, transform_jax, transform_pallas
from .mesh import BLOCK_AXIS, DATA_AXIS
from .temporal import _local_scan, _sharded_scan_body


def _transform_states(states, blocks_h, blocks_w, use_pallas, interpret):
    if use_pallas:
        return transform_pallas.decode_transform_states_pallas(
            *states, blocks_h=blocks_h, blocks_w=blocks_w, interpret=interpret
        )
    return transform_jax.decode_transform_states(
        *states, blocks_h=blocks_h, blocks_w=blocks_w
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "blocks_h", "blocks_w", "gop_aligned", "use_pallas", "interpret"
    ),
)
def decode_transform_sharded(
    amps_y: jnp.ndarray,
    amps_cb: jnp.ndarray,
    amps_cr: jnp.ndarray,
    is_iframe: jnp.ndarray,
    *,
    mesh: Mesh,
    blocks_h: int,
    blocks_w: int,
    gop_aligned: bool = False,
    use_pallas: bool = False,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Sharded decode: (F, B, 64) int16 amplitudes x3 -> (F, H, W) uint32.

    Frames shard over "data", blocks over "block".  F must divide by the
    data-axis size and B by the block-axis size.  gop_aligned=True asserts
    every data-shard starts with an I-frame (skips the carry exchange);
    callers that shard by GOP boundaries should pass it for zero collectives.

    The block->raster reassembly needs whole block-rows per device, so inside
    each shard the frame is built from the local block range; the output
    raster is sharded (F over "data", rows over "block") — valid because the
    block axis is row-major (blocks_w divides evenly into the block shards
    when B % n_block == 0 and (B/n_block) % blocks_w == 0; otherwise the
    caller uses block-sharding only for the coefficient stages).
    """
    n_data = mesh.shape[DATA_AXIS]
    n_block = mesh.shape[BLOCK_AXIS]
    local_rows = blocks_h // n_block
    if blocks_h % n_block:
        raise ValueError(
            f"blocks_h {blocks_h} must divide by block-axis size {n_block}"
        )

    yq, cq = transform_jax.quant_tensors()

    def body(ay, acb, acr, seg):
        if use_pallas and (gop_aligned or n_data == 1):
            # Fully-fused kernel: the temporal recurrence runs inside (each
            # shard's first frame is an I-frame, so zero carry is correct).
            local_b = ay.shape[1]
            carry = jnp.zeros((3, local_b, 64), dtype=jnp.int16)
            frames, _ = transform_fused.decode_window_fused(
                jnp.stack([ay, acb, acr]), seg, carry,
                blocks_h=local_rows, blocks_w=blocks_w, interpret=interpret,
            )
            return frames
        states = []
        for amps, q in ((ay, yq), (acb, cq), (acr, cq)):
            deltas = transform_jax.dequantize(amps, q)
            if gop_aligned or n_data == 1:
                vals, _ = _local_scan(deltas, seg)
            else:
                vals = _sharded_scan_body(deltas, seg, n_data)
            states.append(vals)
        return _transform_states(
            states, local_rows, blocks_w, use_pallas, interpret
        )

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, BLOCK_AXIS, None),
            P(DATA_AXIS, BLOCK_AXIS, None),
            P(DATA_AXIS, BLOCK_AXIS, None),
            P(DATA_AXIS),
        ),
        out_specs=P(DATA_AXIS, BLOCK_AXIS, None),
        # pallas_call out_shapes carry no varying-mesh-axis info; skip the
        # vma check (shardings are fully explicit here anyway).
        check_vma=False,
    )
    return fn(amps_y, amps_cb, amps_cr, is_iframe)


def decode_stream_sharded(
    data: bytes,
    mesh: Mesh,
    *,
    use_pallas: bool = False,
    interpret: bool | None = None,
    decode_plane=None,
) -> "jnp.ndarray":
    """Whole-container sharded decode: bytes -> (F, H, W) uint32 frames.

    Host-parses every frame (native batch decoder), pads the frame axis to
    the data-axis size, and runs the mesh decode (frames over "data" with
    the cross-device temporal carry, blocks over "block").  Convenience
    wrapper for the single-call batch-decode use case; streaming callers use
    runtime.DecodePipeline.
    """
    from ..codec.decoder import parse_coefficient_deltas
    from ..core.format import parse_file

    mpg = parse_file(data)
    coefs = parse_coefficient_deltas(mpg, decode_plane)
    f = coefs.num_frames
    n_data = mesh.shape[DATA_AXIS]
    pad = (-f) % n_data
    import numpy as np

    def padf(x):
        if pad:
            x = np.concatenate(
                [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )
        return x

    seg = padf((coefs.frame_types == 0).astype(bool))
    args = shard_inputs(
        mesh, padf(coefs.y), padf(coefs.cb), padf(coefs.cr), seg
    )
    frames = decode_transform_sharded(
        *args,
        mesh=mesh,
        blocks_h=coefs.height // 8,
        blocks_w=coefs.width // 8,
        gop_aligned=False,
        use_pallas=use_pallas,
        interpret=interpret,
    )
    return frames[:f]


def shard_inputs(
    mesh: Mesh,
    amps_y, amps_cb, amps_cr, is_iframe,
):
    """Place host arrays with the decode sharding (device_put, the mSGDMA
    feed analog — SURVEY.md §5.8)."""
    fb = NamedSharding(mesh, P(DATA_AXIS, BLOCK_AXIS, None))
    fo = NamedSharding(mesh, P(DATA_AXIS))
    return (
        jax.device_put(amps_y, fb),
        jax.device_put(amps_cb, fb),
        jax.device_put(amps_cr, fb),
        jax.device_put(is_iframe, fo),
    )
