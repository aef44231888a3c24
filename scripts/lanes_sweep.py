"""Deep randomized SIMD-lanes-vs-scalar decoder sweep (opt-in soak).

Generates batches of valid and corrupted plane bitstreams (bitflips,
truncations, injected ZRL runs — the class that found the EOB-at-index-64
phantom store) and asserts mj423_decode_batch's SIMD group path is
byte-identical to mj423_decode_plane on every item, and that batch-level
errors name the same smallest failing index the scalar path would.

Usage: python scripts/lanes_sweep.py [trials] [seed]
"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from mjpeg423_tpu.native import centropy
from mjpeg423_tpu.ops import entropy_ref

trials = int(sys.argv[1]) if len(sys.argv) > 1 else 300
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
rng = np.random.default_rng(seed)
t0 = time.time()
for t in range(trials):
    nb = int(rng.integers(1, 400))
    n = int(rng.integers(8, 25))
    style = rng.integers(0, 5)
    blobs = []
    for _ in range(n):
        c = np.zeros((nb, 64), np.int16)
        if style == 0:
            d = float(rng.uniform(0, 1))
            c = np.where(rng.random((nb, 64)) < d,
                         rng.integers(-2047, 2048, size=(nb, 64)), 0).astype(np.int16)
        elif style == 1:
            c[:, 0] = rng.integers(-2047, 2048, size=nb)
        elif style == 2:
            pos = rng.integers(0, 64, size=nb)
            c[np.arange(nb), pos] = rng.integers(1, 2000, size=nb)
        elif style == 3:
            c[:] = rng.integers(-50, 50, size=(nb, 64)); c[c == 0] = 1
        blobs.append(bytearray(centropy.encode_plane(c)))
    # corrupt ~half the lanes: bitflips / truncation / garbage
    for i in range(n):
        if rng.random() < 0.5 and len(blobs[i]) > 8:
            mode = rng.integers(0, 3)
            if mode == 0:
                for _k in range(int(rng.integers(1, 4))):
                    blobs[i][int(rng.integers(0, len(blobs[i])))] ^= int(rng.integers(1, 256))
            elif mode == 1:
                blobs[i] = blobs[i][: max(8, int(rng.integers(8, len(blobs[i]))))]
            else:
                j = int(rng.integers(0, len(blobs[i])))
                blobs[i][j:j+4] = bytes([0xF0] * min(4, len(blobs[i]) - j))
    blobs = [bytes(b) for b in blobs]
    data = b"".join(blobs)
    lens = np.array([len(b) for b in blobs], np.uint64)
    offs = np.zeros(n, np.uint64); offs[1:] = np.cumsum(lens)[:-1]
    isp = rng.integers(0, 2, size=n).astype(np.uint8)
    try:
        out = centropy.decode_batch(data, offs, lens, isp, nb)
    except ValueError as e:
        # batch raised: scalar must raise for the SAME smallest index
        msg = str(e)
        first_bad = None
        for i in range(n):
            try:
                centropy.decode_plane(blobs[i], nb, bool(isp[i]))
            except ValueError:
                first_bad = i
                break
        assert first_bad is not None and f"item {first_bad}" in msg, (
            f"trial {t}: batch error {msg!r} but scalar first-bad={first_bad}")
        continue
    for i in range(n):
        sc = centropy.decode_plane(blobs[i], nb, bool(isp[i]))
        if not np.array_equal(out[i], sc):
            d0 = np.argwhere(out[i] != sc)[0]
            raise AssertionError(
                f"trial {t} item {i} nb={nb} isp={isp[i]}: diverges at {d0}")
    # i8 lanes path vs its forced-scalar oracle (MJ_I8_NO_LANES): both
    # must agree on the outcome class (packed tuple / overflow-None /
    # raise) and byte-identically on the packed outputs.
    def _i8(forced):
        prior = os.environ.get("MJ_I8_NO_LANES")
        if forced:
            os.environ["MJ_I8_NO_LANES"] = "1"
        else:
            os.environ.pop("MJ_I8_NO_LANES", None)  # fast path means LANES
        try:
            return centropy.decode_batch_i8(data, offs, lens, isp, nb)
        except ValueError as e:
            return ("raise", str(e))
        finally:
            if prior is None:
                os.environ.pop("MJ_I8_NO_LANES", None)
            else:
                os.environ["MJ_I8_NO_LANES"] = prior
    fast, slow = _i8(False), _i8(True)
    def _raised(r):
        return isinstance(r, tuple) and len(r) == 2 and isinstance(r[0], str)
    if _raised(fast):
        assert _raised(slow), (
            f"trial {t}: i8 lanes raised {fast[1]!r} but scalar returned")
        assert fast[1] == slow[1], (
            f"trial {t}: i8 error mismatch {fast[1]!r} vs {slow[1]!r}")
    elif fast is None:
        assert slow is None, f"trial {t}: i8 lanes None but scalar decoded"
    else:
        assert slow is not None and not _raised(slow), (
            f"trial {t}: i8 lanes decoded but scalar did not: {slow!r}")
        for k, name in ((0, "dc"), (1, "ac")):
            if not np.array_equal(fast[k], slow[k]):
                d0 = np.argwhere(fast[k] != slow[k])[0]
                raise AssertionError(
                    f"trial {t} i8 {name} diverges at {d0} nb={nb}")
    if t % 50 == 0:
        print(f"trial {t} ok ({time.time()-t0:.0f}s)", flush=True)
print(f"ALL {trials} TRIALS CLEAN ({time.time()-t0:.0f}s)")
