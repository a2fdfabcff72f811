"""PNG codec: spec conformance, round-trips, and failure modes.

No PIL/libpng in the container, so correctness rests on (a) exact
round-trip identity across all five filter types, (b) a hand-assembled
golden file decoded to known pixels, (c) property tests over random
grids, and (d) the DuckDB oracle downstream (media queries replay the
pixel formula independently of the container)."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings, strategies as st

from hbase_tohdfs_spark.formats import png


def _grid(w, h, fn):
    return [[fn(x, y) for x in range(w)] for y in range(h)]


def test_roundtrip_all_filters_exercised():
    """>=5 rows with filter_cycle means every filter type 0-4 appears;
    decode must reproduce every pixel exactly."""
    pix = _grid(7, 9, lambda x, y: ((x * 37) % 256, (y * 91) % 256, (x * y) % 256))
    blob = png.write_png(7, 9, pix)
    w, h, rows = png.read_png(blob)
    assert (w, h) == (7, 9)
    assert rows == pix
    # prove the cycle actually wrote all five filter types
    raw = zlib.decompress(_idat(blob))
    stride = 1 + 3 * 7
    assert {raw[y * stride] for y in range(9)} == {0, 1, 2, 3, 4}


def _idat(blob: bytes) -> bytes:
    pos, out = 8, b""
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            out += blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
    return out


def test_golden_2x2_unfiltered():
    """Hand-assembled 2x2 image, filter 0 rows: the decoder must read
    exactly these bytes back (pins signature/chunk/IHDR layout)."""
    pix = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (1, 2, 3)]]
    blob = png.write_png(2, 2, pix, filter_cycle=False)
    assert blob[:8] == png.SIGNATURE
    raw = zlib.decompress(_idat(blob))
    assert raw == bytes(
        [0, 255, 0, 0, 0, 255, 0] + [0, 0, 0, 255, 1, 2, 3]
    )
    assert png.read_png(blob) == (2, 2, pix)


def test_crc_corruption_detected():
    blob = bytearray(png.write_png(3, 3, _grid(3, 3, lambda x, y: (x, y, 7))))
    # flip a byte inside IHDR data (offset 8 sig + 8 hdr = first data byte)
    blob[16] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png.read_png(bytes(blob))


def test_rejects_non_png_and_truncation():
    with pytest.raises(ValueError, match="signature"):
        png.read_png(b"BMnotapng")
    blob = png.write_png(4, 4, _grid(4, 4, lambda x, y: (x, y, 0)))
    with pytest.raises(ValueError, match="truncated"):
        png.read_png(blob[:20])


def test_rejects_unsupported_color_type():
    """Grayscale IHDR must be refused, not silently misread."""
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    blob = (
        png.SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="color"):
        png.read_png(blob)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**32 - 1),
)
def test_roundtrip_property(w, h, seed):
    """Random grids round-trip exactly at any size >= 1x1, including
    width 1 (no left neighbor: Sub/Average/Paeth degenerate paths)."""
    import random

    rng = random.Random(seed)
    pix = _grid(
        w, h, lambda x, y: (rng.randrange(256), rng.randrange(256), rng.randrange(256))
    )
    assert png.read_png(png.write_png(w, h, pix)) == (w, h, pix)


def test_paeth_predictor_spec_vectors():
    """PNG spec tie-breaking: prefer a, then b, then c."""
    assert png._paeth(1, 1, 1) == 1  # all distances 0 -> a
    assert png._paeth(5, 5, 0) == 5  # p=10: pa=pb=5, pc=10 -> tie -> a
    assert png._paeth(100, 10, 100) == 10  # p=10: pb=0 smallest -> b
    assert png._paeth(0, 20, 10) == 10  # p=10: pa=pb=10, pc=0 -> c


def test_decodes_real_world_pngs_if_present():
    """Interop against PNGs written by real encoders: every 8-bit RGB
    non-interlaced PNG under /usr/share must inflate + unfilter to its
    declared geometry.  Skips if the machine has none in our subset."""
    import glob
    import struct

    candidates = []
    for p in glob.glob("/usr/share/**/*.png", recursive=True):
        try:
            d = open(p, "rb").read()
        except OSError:
            continue
        if d[:8] != png.SIGNATURE or len(d) < 33:
            continue
        w, h, depth, ctype, _c, _f, inter = struct.unpack(">IIBBBBB", d[16:29])
        if (depth, ctype, inter) == (8, 2, 0):
            candidates.append((p, d, w, h))
    if not candidates:
        pytest.skip("no rgb8 non-interlaced PNG fixtures on this machine")
    for p, d, w, h in candidates[:4]:
        gw, gh, rows = png.read_png(d)
        assert (gw, gh) == (w, h), p
        assert len(rows) == h and all(len(r) == w for r in rows)
