"""Minimal BMP read/write for oracle interchange (the 2.2 analog).

The reference writes 32-bpp BMPs from its BGRA frame buffers via libbmp
(reference: encoder/encode_bmp.c:7-25, libbmp/bmpfile.h:121-140) and reads
arbitrary BMPs via NetSurf libnsbmp (decoder/decode_bmp.c:38-90).  We only
need lossless interchange with our own tools and the compiled reference
codec, so: write 32-bpp uncompressed BI_RGB, read 24/32-bpp uncompressed.
"""
from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")      # BITMAPFILEHEADER
_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def write_bmp32(path: str, rgba_packed: np.ndarray) -> None:
    """Write an (H, W) uint32 packed BGRA frame as a 32-bpp BMP.

    Matches the reference's output pixel layout: the packed word is
    b | g<<8 | r<<16 (rgb_pixel_t, mjpeg423_types.h:56-61), which is exactly
    BMP's little-endian BGRX byte order — the frame dumps directly.
    BMP rows are bottom-up.
    """
    h, w = rgba_packed.shape
    img = np.ascontiguousarray(rgba_packed[::-1].astype("<u4"))
    pixel_bytes = img.tobytes()
    info = _INFO_HDR.pack(40, w, h, 1, 32, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    offset = _FILE_HDR.size + _INFO_HDR.size
    hdr = _FILE_HDR.pack(b"BM", offset + len(pixel_bytes), 0, 0, offset)
    with open(path, "wb") as f:
        f.write(hdr)
        f.write(info)
        f.write(pixel_bytes)


def read_bmp(path: str) -> np.ndarray:
    """Read a 24- or 32-bpp uncompressed BMP -> (H, W, 3) uint8 RGB."""
    with open(path, "rb") as f:
        data = f.read()
    magic, _size, _r1, _r2, offset = _FILE_HDR.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP file")
    (hdr_size, w, h, _planes, bpp, compression, *_rest) = _INFO_HDR.unpack_from(
        data, _FILE_HDR.size
    )
    if compression not in (0, 3):
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bpp {bpp}")
    flip = h > 0
    h = abs(h)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=offset)
    px = px.reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    if flip:
        px = px[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(px[..., 2::-1])


def packed_to_rgb(frame: np.ndarray) -> np.ndarray:
    """(H, W) uint32 packed -> (H, W, 3) uint8 RGB."""
    r = (frame >> 16) & 0xFF
    g = (frame >> 8) & 0xFF
    b = frame & 0xFF
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def rgb_to_packed(rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB -> (H, W) uint32 packed BGRA (alpha 0)."""
    rgb = rgb.astype(np.uint32)
    return rgb[..., 2] | (rgb[..., 1] << 8) | (rgb[..., 0] << 16)
