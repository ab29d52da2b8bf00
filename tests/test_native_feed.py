"""Native C++ frame feed: decode correctness, ordering, error paths.

The feed (csrc/feed.cc) is the TPU-native successor of the reference's
vidDebug ring-buffer recorder (`vidDebug/buffer.cpp:20-120`) and the ROS
image queues (`live_stereo.cpp:162-269`): N decoder threads, ordered
consumption.  Tests build the shared object with the system g++ on first
run and are skipped if no toolchain exists.
"""
import struct
import zlib

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not pytest.importorskip("front_end_tpu.io.native_feed").available(),
    reason="native toolchain unavailable")

from front_end_tpu.io.native_feed import NativeStereoFeed  # noqa: E402


def write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(b"P5\n# comment line\n%d %d\n255\n"
                % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


def write_png_gray8(path, img):
    """Minimal 8-bit grayscale PNG encoder (filter 0 rows, one IDAT)."""
    h, w = img.shape

    def chunk(tag, data):
        out = struct.pack(">I", len(data)) + tag + data
        return out + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, depth 8
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))


def make_frames(n, h, w, rng):
    return [rng.integers(0, 256, (h, w)).astype(np.uint8) for _ in range(n)]


def test_pgm_roundtrip_ordering(tmp_path, rng):
    h, w = 24, 32
    n = 20
    ls = make_frames(n, h, w, rng)
    rs = make_frames(n, h, w, rng)
    lp, rp = [], []
    for i in range(n):
        lp.append(str(tmp_path / f"l{i:03d}.pgm"))
        rp.append(str(tmp_path / f"r{i:03d}.pgm"))
        write_pgm(lp[-1], ls[i])
        write_pgm(rp[-1], rs[i])
    # many threads + tiny ring stresses the ordered-consumption contract
    with NativeStereoFeed(lp, rp, h, w, ring=3, threads=6) as feed:
        got = list(feed)
    assert len(got) == n
    for i, (l, r) in enumerate(got):
        np.testing.assert_array_equal(l, ls[i])
        np.testing.assert_array_equal(r, rs[i])


def test_png_and_raw_decode(tmp_path, rng):
    h, w = 16, 20
    img_l = rng.integers(0, 256, (h, w)).astype(np.uint8)
    img_r = rng.integers(0, 256, (h, w)).astype(np.uint8)
    lp = str(tmp_path / "l.png")
    rp = str(tmp_path / "r.raw")
    write_png_gray8(lp, img_l)
    with open(rp, "wb") as f:
        f.write(img_r.tobytes())
    with NativeStereoFeed([lp], [rp], h, w) as feed:
        frames = list(feed)
    assert len(frames) == 1
    np.testing.assert_array_equal(frames[0][0], img_l)
    np.testing.assert_array_equal(frames[0][1], img_r)


def test_zero_copy_path(tmp_path, rng):
    h, w = 8, 12
    imgs = make_frames(4, h, w, rng)
    paths = []
    for i, im in enumerate(imgs):
        p = str(tmp_path / f"f{i}.pgm")
        write_pgm(p, im)
        paths.append(p)
    with NativeStereoFeed(paths, paths, h, w, ring=2, threads=2) as feed:
        seen = [l.copy() for l, _ in feed.frames_zero_copy()]
    for im, got in zip(imgs, seen):
        np.testing.assert_array_equal(got, im)


def test_missing_file_raises(tmp_path, rng):
    h, w = 8, 8
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    good = str(tmp_path / "g.pgm")
    write_pgm(good, img)
    bad = str(tmp_path / "nope.pgm")
    with NativeStereoFeed([good, bad], [good, good], h, w) as feed:
        with pytest.raises(RuntimeError, match="native feed"):
            list(feed)


def test_size_mismatch_raises(tmp_path, rng):
    img = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    p = str(tmp_path / "a.pgm")
    write_pgm(p, img)
    with NativeStereoFeed([p], [p], 16, 16) as feed:
        with pytest.raises(RuntimeError, match="mismatch"):
            list(feed)
