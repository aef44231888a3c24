"""Bit-exactness vs the COMPILED REFERENCE C codec (the golden oracle).

Each test round-trips data through both our NumPy implementation and the
reference stage functions (compiled in-place from /root/reference, see
tests/oracle/harness.py) and requires byte equality.
"""
import numpy as np
import pytest

from mjpeg423_tpu.codec import decoder as dec
from mjpeg423_tpu.codec import encoder as enc
from mjpeg423_tpu.core import tables as T
from mjpeg423_tpu.core.format import parse_file
from mjpeg423_tpu.ops import encode_ref, entropy_ref, transform_ref

from tests.oracle import harness
from tests.conftest import make_test_frames

pytestmark = pytest.mark.skipif(
    not harness.oracle_available(), reason="reference tree or gcc unavailable"
)


@pytest.fixture(scope="module")
def oracle():
    return harness.Oracle()


def _rand_coeffs(rng, nb, lo=-300, hi=300, density=0.3):
    c = rng.integers(lo, hi, size=(nb, 64)).astype(np.int16)
    c[rng.random((nb, 64)) > density] = 0
    return c


# ---------- IDCT ----------

def test_idct_matches_reference(oracle, rng):
    c = _rand_coeffs(rng, 64, -2000, 2000, 0.4).reshape(-1, 8, 8)
    ours = transform_ref.idct_blocks(c)
    ref = oracle.idct(c)
    np.testing.assert_array_equal(ours, ref)


def test_idct_extremes(oracle):
    cases = np.zeros((6, 8, 8), dtype=np.int16)
    cases[0, 0, 0] = 32767
    cases[1, 0, 0] = -32768
    cases[2] = 32767
    cases[3] = -32768
    cases[4, 0, 0] = 1024  # mid gray
    cases[5, 7, 7] = -3000
    np.testing.assert_array_equal(
        transform_ref.idct_blocks(cases), oracle.idct(cases)
    )


# ---------- Color ----------

def test_ycbcr_to_rgb_matches_reference(oracle, rng):
    h, w = 16, 24
    nb = (h // 8) * (w // 8)
    y = rng.integers(0, 256, (nb, 8, 8)).astype(np.uint8)
    cb = rng.integers(0, 256, (nb, 8, 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (nb, 8, 8)).astype(np.uint8)
    ours = transform_ref.blocks_to_raster(
        transform_ref.ycbcr_to_rgb_blocks(y, cb, cr), h // 8, w // 8
    )
    ref = oracle.ycbcr2rgb(y, cb, cr, w, h)
    np.testing.assert_array_equal(ours, ref)


def test_rgb_to_ycbcr_matches_reference(oracle, rng):
    h, w = 16, 16
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    # pack as the reference rgb_pixel_t (b | g<<8 | r<<16)
    packed = (
        rgb[..., 2].astype(np.uint32)
        | (rgb[..., 1].astype(np.uint32) << 8)
        | (rgb[..., 0].astype(np.uint32) << 16)
    )
    ry, rcb, rcr = oracle.rgb2ycbcr(packed, w, h)
    y, cb, cr = encode_ref.rgb_to_ycbcr_frame(rgb)
    np.testing.assert_array_equal(transform_ref.raster_to_blocks(y), ry)
    np.testing.assert_array_equal(transform_ref.raster_to_blocks(cb), rcb)
    np.testing.assert_array_equal(transform_ref.raster_to_blocks(cr), rcr)


# ---------- FDCT / quantize ----------

def test_fdct_matches_reference(oracle, rng):
    s = rng.integers(0, 256, (100, 8, 8)).astype(np.uint8)
    np.testing.assert_array_equal(encode_ref.fdct_blocks(s), oracle.fdct(s))


def test_quantize_i_matches_reference(oracle, rng):
    c = _rand_coeffs(rng, 40, -2040, 2040, 0.5)
    q = encode_ref.quantize_blocks(c, T.YQUANT64)
    ours_qi = encode_ref.diff_dc_i(q)
    ref_qi, ref_next = oracle.quant_i(c, "y")
    np.testing.assert_array_equal(ours_qi, ref_qi)
    np.testing.assert_array_equal(q, ref_next)


def test_quantize_p_matches_reference(oracle, rng):
    c = _rand_coeffs(rng, 40, -2040, 2040, 0.5)
    prev = _rand_coeffs(rng, 40, -120, 120, 0.5)
    q = encode_ref.quantize_blocks(c, T.CQUANT64)
    ours_qp = encode_ref.diff_p(q, prev)
    ref_qp, ref_newprev = oracle.quant_p(c, prev, "c")
    np.testing.assert_array_equal(ours_qp, ref_qp)
    np.testing.assert_array_equal(q, ref_newprev)


# ---------- Entropy ----------

def test_lossless_encode_matches_reference(oracle, rng):
    c = _rand_coeffs(rng, 30, -1000, 1000, 0.25)
    np.testing.assert_array_equal(
        np.frombuffer(entropy_ref.encode_plane(c), np.uint8),
        np.frombuffer(oracle.lossless_enc(c), np.uint8),
    )


def test_lossless_decode_i_matches_reference(oracle, rng):
    c = _rand_coeffs(rng, 30, -200, 200, 0.3)
    bits = oracle.lossless_enc(c)
    ref_state = oracle.lossless_dec(bits, 30, False, "y")
    amps = entropy_ref.decode_plane(bits, 30, False)
    ours = transform_ref.dequant_i(amps, T.YQUANT64)
    np.testing.assert_array_equal(ours, ref_state)


def test_lossless_decode_p_matches_reference(oracle, rng):
    prev_state = _rand_coeffs(rng, 30, -5000, 5000, 0.4)
    deltas = _rand_coeffs(rng, 30, -50, 50, 0.2)
    bits = oracle.lossless_enc(deltas)
    ref_state = oracle.lossless_dec(bits, 30, True, "c", state=prev_state)
    amps = entropy_ref.decode_plane(bits, 30, True)
    ours = transform_ref.accumulate_p(prev_state, amps, T.CQUANT64)
    np.testing.assert_array_equal(ours, ref_state)


# ---------- End-to-end ----------

def test_full_decode_matches_reference(oracle, rng):
    frames = make_test_frames(rng, num_frames=8, h=48, w=64)
    mpg = enc.encode_frames(frames, max_i_interval=4)
    hdr = parse_file(mpg).header
    assert hdr.num_iframes >= 2  # exercise multiple GOPs
    ref = oracle.decode(mpg, hdr.num_frames, hdr.width, hdr.height)
    ours = dec.decode_stream_array(mpg)
    np.testing.assert_array_equal(ours, ref)


def test_full_decode_static_scene_p_heavy(oracle, rng):
    # Nearly-static frames -> P frames dominate; exercises the accumulator.
    base = make_test_frames(rng, num_frames=1, h=32, w=32, motion=False)[0]
    frames = [base]
    for t in range(7):
        f = base.copy()
        f[t % 32, :, 0] ^= 3  # tiny change
        frames.append(f)
    mpg = enc.encode_frames(frames, max_i_interval=24)
    hdr = parse_file(mpg).header
    types = [fr.frame_type for fr in parse_file(mpg).frames]
    assert types.count(1) >= 5, f"expected P-dominated stream, got {types}"
    ref = oracle.decode(mpg, hdr.num_frames, hdr.width, hdr.height)
    ours = dec.decode_stream_array(mpg)
    np.testing.assert_array_equal(ours, ref)


# ---------- Full encoder vs reference-composed encoder ----------

def test_full_encode_matches_reference_composition(oracle, rng):
    """Byte-compare our whole encoder (RGB frames -> .MPG container) against
    an encoder composed purely from the reference's own compiled stages
    (rgb_to_ycbcr -> fdct -> quantize_I/P -> lossless_encode) driven by the
    reference's frame loop (mjpeg423_encoder.c:104-231): smaller-wins
    selection with forced I at frame 0 and at max_I_interval, prev/next
    state swap, 4-byte aligned frame payloads, I-frame trailer, 512 pad.

    This pins every byte of the container — headers, candidate selection,
    bitstreams, padding, trailer — to reference-derived data, end to end.
    """
    import struct

    w, h, nf, max_i = 32, 24, 7, 3
    nb = (w // 8) * (h // 8)
    # mixed content: slowly-varying so both I and P frames win somewhere
    frames = []
    base = rng.integers(90, 160, (h, w, 3)).astype(np.uint8)
    for i in range(nf):
        f = base.copy()
        f[(i * 8) % h:(i * 8) % h + 8] += rng.integers(
            0, 6 + 20 * (i % 3 == 0), (8, w, 3)
        ).astype(np.uint8)
        frames.append(f)
        base = f

    # --- reference-composed encoder ---
    chunks = [b""]  # placeholder for file header
    trailer = []
    pos = 20
    prev = {"y": None, "cb": None, "cr": None}
    last_iframe = 0
    for fi, rgb in enumerate(frames):
        packed = (
            rgb[..., 2].astype(np.uint32)
            | (rgb[..., 1].astype(np.uint32) << 8)
            | (rgb[..., 0].astype(np.uint32) << 16)
        )
        yb, cbb, crb = oracle.rgb2ycbcr(packed, w, h)
        coef = {
            "y": oracle.fdct(yb).reshape(nb, 64),
            "cb": oracle.fdct(cbb).reshape(nb, 64),
            "cr": oracle.fdct(crb).reshape(nb, 64),
        }
        qi, nxt, bits_i, bits_p, newprev = {}, {}, {}, {}, {}
        for p, q in (("y", "y"), ("cb", "c"), ("cr", "c")):
            qi[p], nxt[p] = oracle.quant_i(coef[p], q)
            bits_i[p] = oracle.lossless_enc(qi[p])
            if fi > 0:
                qp, newprev[p] = oracle.quant_p(coef[p], prev[p], q)
                bits_p[p] = oracle.lossless_enc(qp)
        size_i = sum(len(bits_i[p]) for p in ("y", "cb", "cr"))
        size_p = (
            sum(len(bits_p[p]) for p in ("y", "cb", "cr")) if fi else None
        )
        if fi == 0 or size_i <= size_p or fi - last_iframe >= max_i:
            ftype, bits = 0, bits_i
            last_iframe = fi
            prev = nxt
        else:
            ftype, bits = 1, bits_p
            prev = newprev
        raw = 16 + sum(len(bits[p]) for p in ("y", "cb", "cr"))
        fsize = raw + (-raw) % 4
        payload = (
            struct.pack("<4I", fsize, ftype, len(bits["y"]), len(bits["cb"]))
            + bits["y"] + bits["cb"] + bits["cr"] + b"\x00" * (fsize - raw)
        )
        if ftype == 0:
            trailer.append((fi, pos))
        chunks.append(payload)
        pos += fsize
    chunks[0] = struct.pack("<5I", nf, w, h, len(trailer), pos - 20)
    ref_mpg = b"".join(chunks) + b"".join(
        struct.pack("<2I", i, p) for i, p in trailer
    ) + b"\x00" * 512

    ours = enc.encode_frames(frames, max_i_interval=max_i)
    assert ours == ref_mpg
    # and the same through the pure-Python packer (native bypass)
    ours_py = enc.encode_frames(
        frames, max_i_interval=max_i, entropy_encode=entropy_ref.encode_plane
    )
    assert ours_py == ref_mpg
