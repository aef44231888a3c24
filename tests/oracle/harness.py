"""Build + invoke the reference-codec oracle driver.

Compiles tests/oracle/oracle_driver.c against the reference's portable codec
sources in-place under /root/reference (read-only).  If the reference tree or
a C compiler is unavailable, oracle tests are skipped.
"""
from __future__ import annotations

import pathlib
import shutil
import subprocess
import tempfile

import numpy as np

REFERENCE = pathlib.Path("/root/reference")
CODEC = REFERENCE / "core0/software/common/libs/mjpeg423"
HERE = pathlib.Path(__file__).resolve().parent
BUILD_DIR = HERE.parent.parent / ".oracle_build"

_REF_SOURCES = [
    "common/tables.c",
    "common/util.c",
    "decoder/lossless_decode.c",
    "decoder/idct.c",
    "decoder/ycbcr_to_rgb.c",
    "encoder/fdct.c",
    "encoder/quantize.c",
    "encoder/rgb_to_ycbcr.c",
    "encoder/lossless_encode.c",
]


def oracle_available() -> bool:
    return CODEC.is_dir() and shutil.which("gcc") is not None


def build_oracle() -> pathlib.Path:
    """Compile the oracle driver; cached across test runs."""
    exe = BUILD_DIR / "oracle_driver"
    src = HERE / "oracle_driver.c"
    stamps = [src.stat().st_mtime] + [
        (CODEC / s).stat().st_mtime for s in _REF_SOURCES
    ]
    stamp_file = BUILD_DIR / "stamp"
    stamp = repr(stamps)
    if exe.exists() and stamp_file.exists() and stamp_file.read_text() == stamp:
        return exe
    BUILD_DIR.mkdir(exist_ok=True)
    cmd = (
        ["gcc", "-O2", "-std=c99", "-fwrapv", "-o", str(exe), str(src)]
        + [str(CODEC / s) for s in _REF_SOURCES]
        + ["-I", str(CODEC / "common"), "-lm"]
    )
    subprocess.run(cmd, check=True, capture_output=True)
    stamp_file.write_text(stamp)
    return exe


class Oracle:
    """File-based invocation wrapper around the compiled driver."""

    def __init__(self) -> None:
        self.exe = build_oracle()
        self._tmp = tempfile.TemporaryDirectory(prefix="mjpeg423_oracle_")
        self.dir = pathlib.Path(self._tmp.name)

    def _run(self, *args: str) -> None:
        subprocess.run([str(self.exe), *args], check=True, capture_output=True)

    def _wr(self, name: str, arr_or_bytes) -> str:
        p = self.dir / name
        if isinstance(arr_or_bytes, (bytes, bytearray)):
            p.write_bytes(bytes(arr_or_bytes))
        else:
            p.write_bytes(np.ascontiguousarray(arr_or_bytes).tobytes())
        return str(p)

    def _rd(self, name: str, dtype, shape) -> np.ndarray:
        raw = (self.dir / name).read_bytes()
        return np.frombuffer(raw, dtype=dtype).reshape(shape).copy()

    def decode(self, mpg: bytes, num_frames: int, w: int, h: int) -> np.ndarray:
        """Full decode -> (F, H, W) uint32 RGBA (LE-packed b|g<<8|r<<16|a<<24)."""
        self._run("decode", self._wr("in.mpg", mpg), str(self.dir / "out.raw"))
        return self._rd("out.raw", np.uint32, (num_frames, h, w))

    def lossless_dec(
        self, bits: bytes, nblocks: int, is_p: bool, quant: str,
        state: np.ndarray | None = None,
    ) -> np.ndarray:
        sp = self._wr("state.i16", state) if state is not None else "-"
        self._run(
            "lossless_dec", self._wr("in.bits", bits), str(nblocks),
            str(int(is_p)), quant, sp, str(self.dir / "out.i16"),
        )
        return self._rd("out.i16", np.int16, (nblocks, 64))

    def lossless_enc(self, coeffs: np.ndarray) -> bytes:
        nb = coeffs.shape[0]
        self._run(
            "lossless_enc", self._wr("in.i16", coeffs.astype(np.int16)),
            str(nb), str(self.dir / "out.bits"),
        )
        raw = (self.dir / "out.bits").read_bytes()
        n = int(np.frombuffer(raw[:4], dtype=np.uint32)[0])
        return raw[4:4 + n]

    def idct(self, coeffs: np.ndarray) -> np.ndarray:
        nb = coeffs.shape[0]
        self._run("idct", self._wr("in.i16", coeffs.astype(np.int16)),
                  str(nb), str(self.dir / "out.u8"))
        return self._rd("out.u8", np.uint8, (nb, 8, 8))

    def fdct(self, samples: np.ndarray) -> np.ndarray:
        nb = samples.shape[0]
        self._run("fdct", self._wr("in.u8", samples.astype(np.uint8)),
                  str(nb), str(self.dir / "out.i16"))
        return self._rd("out.i16", np.int16, (nb, 8, 8))

    def quant_i(self, coeffs: np.ndarray, quant: str) -> tuple[np.ndarray, np.ndarray]:
        nb = coeffs.shape[0]
        self._run("quant_i", self._wr("in.i16", coeffs.astype(np.int16)),
                  str(nb), quant, str(self.dir / "out.i16"), str(self.dir / "next.i16"))
        return (self._rd("out.i16", np.int16, (nb, 64)),
                self._rd("next.i16", np.int16, (nb, 64)))

    def quant_p(self, coeffs: np.ndarray, prev: np.ndarray, quant: str) -> tuple[np.ndarray, np.ndarray]:
        nb = coeffs.shape[0]
        self._run("quant_p", self._wr("in.i16", coeffs.astype(np.int16)),
                  self._wr("prev.i16", prev.astype(np.int16)), str(nb), quant,
                  str(self.dir / "out.i16"), str(self.dir / "newprev.i16"))
        return (self._rd("out.i16", np.int16, (nb, 64)),
                self._rd("newprev.i16", np.int16, (nb, 64)))

    def ycbcr2rgb(self, y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                  w: int, h: int) -> np.ndarray:
        self._run("ycbcr2rgb", self._wr("y.u8", y.astype(np.uint8)),
                  self._wr("cb.u8", cb.astype(np.uint8)),
                  self._wr("cr.u8", cr.astype(np.uint8)),
                  str(w), str(h), str(self.dir / "out.rgba"))
        return self._rd("out.rgba", np.uint32, (h, w))

    def rgb2ycbcr(self, rgba: np.ndarray, w: int, h: int):
        """rgba: (H, W) uint32 packed. Returns (y, cb, cr) block arrays."""
        nb = (w // 8) * (h // 8)
        self._run("rgb2ycbcr", self._wr("in.rgba", rgba.astype(np.uint32)),
                  str(w), str(h), str(self.dir / "y.u8"),
                  str(self.dir / "cb.u8"), str(self.dir / "cr.u8"))
        return (self._rd("y.u8", np.uint8, (nb, 8, 8)),
                self._rd("cb.u8", np.uint8, (nb, 8, 8)),
                self._rd("cr.u8", np.uint8, (nb, 8, 8)))
