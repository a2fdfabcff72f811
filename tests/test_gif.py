"""GIF codec: LZW round-trips across code-width growth, palette
handling, block structure, and failure modes."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from hbase_tohdfs_spark.formats import gif


def _grid(w, h, fn):
    return [[fn(x, y) for x in range(w)] for y in range(h)]


def test_roundtrip_small():
    pix = _grid(7, 5, lambda x, y: ((x * 37) % 256, (y * 91) % 256, (x * y) % 256))
    blob = gif.write_gif(7, 5, pix)
    assert blob[:3] == b"GIF"
    assert gif.read_gif(blob) == (7, 5, pix)


def test_roundtrip_crosses_code_width_boundaries():
    """4096 pixels from a 200-color palette: the LZW table grows past
    512 and 1024 entries, so 9->10->11-bit code widths are exercised;
    an encoder/decoder width desync corrupts every pixel after the
    boundary."""
    rng = random.Random(3)
    colors = [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(200)]
    pix = _grid(64, 64, lambda x, y: colors[rng.randrange(200)])
    rng = random.Random(3)  # regenerate identically for the assert
    colors = [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(200)]
    pix = _grid(64, 64, lambda x, y: colors[rng.randrange(200)])
    assert gif.read_gif(gif.write_gif(64, 64, pix)) == (64, 64, pix)


def test_roundtrip_table_full_reclear():
    """Enough low-redundancy pixels to fill the 4095-entry table and
    force a mid-stream CLEAR + table rebuild."""
    rng = random.Random(9)
    seq = [(i % 251, (i * 7) % 251, (i * 13) % 251) for i in range(251)]
    pix = [[seq[rng.randrange(251)] for _ in range(100)] for _ in range(100)]
    assert gif.read_gif(gif.write_gif(100, 100, pix)) == (100, 100, pix)


def test_single_color_and_two_color():
    one = _grid(4, 4, lambda x, y: (9, 8, 7))
    assert gif.read_gif(gif.write_gif(4, 4, one)) == (4, 4, one)
    two = _grid(4, 4, lambda x, y: (0, 0, 0) if (x + y) % 2 else (255, 255, 255))
    assert gif.read_gif(gif.write_gif(4, 4, two)) == (4, 4, two)


def test_rejects_too_many_colors():
    pix = [[(x, y, (x + y) % 256) for x in range(32)] for y in range(32)]
    with pytest.raises(ValueError, match="256 distinct colors"):
        gif.write_gif(32, 32, pix)


def test_rejects_non_gif_and_corruption():
    with pytest.raises(ValueError, match="signature"):
        gif.read_gif(b"PNG no")
    blob = bytearray(gif.write_gif(3, 3, _grid(3, 3, lambda x, y: (x, y, 0))))
    # corrupt the image-descriptor width: the decoded pixel count no
    # longer matches the declared geometry
    flags = blob[10]
    desc = 13 + 3 * (2 << (flags & 0x07))  # image descriptor offset
    assert blob[desc] == 0x2C
    blob[desc + 5] = 7  # width low byte: 3 -> 7
    with pytest.raises(ValueError, match="pixels"):
        gif.read_gif(bytes(blob))


def test_skips_89a_extension_blocks():
    """89a graphic-control extensions before the image descriptor must
    be skipped, not treated as image data."""
    pix = _grid(2, 2, lambda x, y: (x * 100, y * 100, 50))
    blob = gif.write_gif(2, 2, pix)
    # splice in a GCE after the 13-byte header + color table
    ct_end = 13 + 3 * 2  # 2-color padded table? compute from flags instead
    flags = blob[10]
    n = 2 << (flags & 0x07)
    ct_end = 13 + 3 * n
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = blob[:6] + b"89a"[:0] + blob[6:ct_end] + gce + blob[ct_end:]
    spliced = b"GIF89a" + spliced[6:]
    assert gif.read_gif(spliced) == (2, 2, pix)


@settings(max_examples=20, deadline=None)
@given(w=st.integers(1, 10), h=st.integers(1, 10), seed=st.integers(0, 2**32 - 1))
def test_roundtrip_property(w, h, seed):
    rng = random.Random(seed)
    colors = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(min(w * h, 64))
    ]
    pix = [[colors[rng.randrange(len(colors))] for _ in range(w)] for _ in range(h)]
    assert gif.read_gif(gif.write_gif(w, h, pix)) == (w, h, pix)


def test_decodes_real_world_gifs_if_present():
    """Interop against files written by REAL encoders (not our own
    writer): any system GIF under /usr/share must parse — this is what
    pins the LZW code-width convention to actual GIF streams, not just
    our encoder/decoder pair.  Skips if the machine has none."""
    import glob

    paths = sorted(glob.glob("/usr/share/**/*.gif", recursive=True))[:10]
    if not paths:
        pytest.skip("no system GIF fixtures on this machine")
    decoded = 0
    for p in paths:
        data = open(p, "rb").read()
        if data[:3] != b"GIF":
            continue
        try:
            w, h, rows = gif.read_gif(data)
        except ValueError as e:
            if "interlaced" in str(e):
                continue  # documented unsupported subset
            raise
        assert w > 0 and h > 0
        assert len(rows) == h and all(len(r) == w for r in rows)
        decoded += 1
    if not decoded:
        pytest.skip("system GIFs all outside the supported subset")


def test_animated_gif_roundtrip():
    """Multi-frame write/read: every frame survives exactly (local
    color tables, per-frame LZW streams, GCE blocks between)."""
    rng = random.Random(21)
    frames = [
        _grid(9, 6, lambda x, y: ((x * 31 + f * 97) % 256, (y * 53) % 256, f * 40))
        for f in range(5)
    ]
    blob = gif.write_gif_frames(9, 6, frames)
    assert blob[3:6] == b"89a"
    w, h, got = gif.read_gif_frames(blob)
    assert (w, h) == (9, 6)
    assert got == frames
    # the single-image reader sees the first frame
    assert gif.read_gif(blob) == (9, 6, frames[0])


def test_read_gif_frames_on_single_image():
    pix = _grid(4, 3, lambda x, y: (x * 50, y * 70, 20))
    w, h, frames = gif.read_gif_frames(gif.write_gif(4, 3, pix))
    assert (w, h, len(frames)) == (4, 3, 1)
    assert frames[0] == pix


def test_read_gif_frames_real_world_if_present():
    import glob

    for p in sorted(glob.glob("/usr/share/**/*.gif", recursive=True))[:6]:
        data = open(p, "rb").read()
        try:
            w, h, frames = gif.read_gif_frames(data)
        except ValueError:
            continue
        assert frames and all(len(f) == h for f in frames)
        return
    pytest.skip("no decodable system GIFs")


def test_truncated_payloads_raise_value_error():
    """Truncation anywhere (color table, sub-blocks, descriptors) must
    surface as ValueError like the other codecs, never a bare
    IndexError or silent short color tuples (review finding)."""
    pix = _grid(6, 5, lambda x, y: ((x * 40) % 256, (y * 60) % 256, 128))
    blob = gif.write_gif(6, 5, pix)
    for cut in (8, 12, 14, 20, len(blob) // 2, len(blob) - 3):
        with pytest.raises(ValueError):
            gif.read_gif(blob[:cut])
        with pytest.raises(ValueError):
            gif.read_gif_frames(blob[:cut])
