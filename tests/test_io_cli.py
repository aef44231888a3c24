"""BMP I/O, stream reader, profiler, and CLI round-trips."""
import json
import os

import numpy as np
import pytest

from mjpeg423_tpu import cli
from mjpeg423_tpu.codec import decoder, encoder
from mjpeg423_tpu.io import bmp
from mjpeg423_tpu.io.reader import StreamReader
from mjpeg423_tpu.utils.profile import Profiler

from conftest import make_test_frames


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(9)
    frames = make_test_frames(rng, num_frames=10, h=32, w=48)
    data = encoder.encode_frames(frames, max_i_interval=4)
    return data, frames


def test_bmp32_roundtrip(tmp_path, rng):
    packed = rng.integers(0, 2**24, size=(16, 24)).astype(np.uint32)
    path = str(tmp_path / "t.bmp")
    bmp.write_bmp32(path, packed)
    rgb = bmp.read_bmp(path)
    np.testing.assert_array_equal(rgb, bmp.packed_to_rgb(packed))
    np.testing.assert_array_equal(bmp.rgb_to_packed(rgb), packed & 0xFFFFFF)


def test_stream_reader_gops_cover_stream(stream):
    data, _ = stream
    reader = StreamReader(data)
    chunks = list(reader.iter_gops())
    total = sum(c.num_frames for c in chunks)
    assert total == reader.num_frames
    assert [c.start_frame for c in chunks] == reader.gop_starts
    # Every chunk starts with an I-frame.
    for c in chunks:
        assert c.frames[0].is_iframe


def test_stream_reader_seek(stream):
    data, _ = stream
    reader = StreamReader(data)
    starts = reader.gop_starts
    chunks = list(reader.iter_gops(start_gop=1))
    assert chunks[0].start_frame == starts[1]


def test_profiler_aggregates():
    p = Profiler()
    with p.time("x"):
        pass
    p.probe("y").add(2.0)
    p.probe("y").add(4.0)
    rep = p.report()
    assert rep["y"]["count"] == 2
    assert rep["y"]["total"] == 6.0
    assert rep["y"]["max"] == 4.0
    assert "x" in p.format_report()


def test_cli_info_decode_encode_roundtrip(tmp_path, stream, capsys):
    data, _frames = stream
    mpg = str(tmp_path / "in.mpg")
    with open(mpg, "wb") as f:
        f.write(data)

    assert cli.main(["info", mpg]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["num_frames"] == 10
    assert meta["iframe_count_check"] == meta["num_iframes"]

    outdir = str(tmp_path / "out")
    assert cli.main(["decode", mpg, "-o", outdir, "--no-pallas"]) == 0
    files = sorted(os.listdir(outdir))
    assert len(files) == 10

    # BMP output matches the oracle decode exactly.
    want = decoder.decode_stream_array(data)
    got0 = bmp.read_bmp(os.path.join(outdir, files[0]))
    np.testing.assert_array_equal(got0, bmp.packed_to_rgb(want[0]))

    # Re-encode the decoded BMPs and decode again: stable (already quantized).
    out2 = str(tmp_path / "re.mpg")
    assert cli.main([
        "encode", *[os.path.join(outdir, f) for f in files], "-o", out2,
        "--max-i-interval", "4",
    ]) == 0
    assert os.path.getsize(out2) > 0


def test_cli_serve(tmp_path, stream, capsys):
    data, _ = stream
    paths = []
    for k in range(2):
        p = str(tmp_path / f"s{k}.mpg")
        with open(p, "wb") as f:
            f.write(data)
        paths.append(p)
    assert cli.main(["serve", *paths, "--no-pallas"]) == 0


def test_cli_play_unpaced(tmp_path, stream, capsys):
    data, _ = stream
    mpg = str(tmp_path / "p.mpg")
    with open(mpg, "wb") as f:
        f.write(data)
    assert cli.main(["play", mpg, "--no-pace", "--no-pallas"]) == 0


def test_cli_selftest():
    assert cli.main(["selftest", "--no-pallas", "--frames", "4"]) == 0


def test_player_state_snapshot(stream):
    from mjpeg423_tpu.runtime import Player
    from mjpeg423_tpu.utils.config import DecodeConfig

    data, _ = stream
    player = Player(data, DecodeConfig(use_pallas=False))
    player.current_frame = 6
    st = player.get_state()
    player2 = Player(data, DecodeConfig(use_pallas=False))
    player2.set_state(st)
    # Snaps to the GOP's I-frame at or before frame 6.
    assert player2.current_frame in player2.index.gop_starts()
    assert player2.current_frame <= 6


def test_serve_retry_commits_once(stream):
    from mjpeg423_tpu.runtime.serve import StreamPool
    from mjpeg423_tpu.utils.config import DecodeConfig

    data, want_frames = stream
    calls = {"n": 0}
    pool = StreamPool(DecodeConfig(use_pallas=False, frames_per_batch=4))
    orig = pool.pipeline.decode

    def flaky(d, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected fault")
        return orig(d, **kw)

    pool.pipeline.decode = flaky
    stats = pool.decode_all([data], retries=1)
    assert stats.frames == 10  # counted once despite the retry


def test_cli_play_playlist(tmp_path, stream, capsys):
    data, _ = stream
    paths = []
    for k in range(2):
        p = str(tmp_path / f"pl{k}.mpg")
        with open(p, "wb") as f:
            f.write(data)
        paths.append(p)
    assert cli.main(["play", *paths, "--no-pace", "--no-pallas"]) == 0
    err = capsys.readouterr().err
    assert "playlist total: 20 frames" in err


def test_cli_play_interactive_keys(tmp_path, stream, monkeypatch):
    """Piped key input drives the interactive player: pause toggles twice,
    FF, then quit — exits cleanly."""
    import io

    from mjpeg423_tpu import cli

    data, _ = stream
    mpg = str(tmp_path / "v.mpg")
    open(mpg, "wb").write(data)
    monkeypatch.setattr("sys.stdin", io.StringIO("p p f q"))
    assert cli.main(
        ["play", mpg, "--no-pace", "--no-pallas", "--interactive"]
    ) == 0
