"""JPEG codec: baseline + progressive decode, 4:4:4/4:2:0 encode,
round-trip error bounds, and real-world interop.

JPEG is lossy, so unlike the BMP/PNG/GIF tests these assert ERROR
BOUNDS, not equality: flat blocks survive exactly (DC-only), smooth
gradients within a few units at q95, and chroma subsampling adds
bounded chroma error.  Interop: the system's progressive JFIF files
decode to their declared geometry with plausible content, and a
decode -> re-encode -> decode loop stays near-identical."""

from __future__ import annotations

import glob

import pytest

from hbase_tohdfs_spark.formats import jpeg


def _grid(w, h, fn):
    return [[fn(x, y) for x in range(w)] for y in range(h)]


def test_flat_color_roundtrip_exact():
    for sub in ("444", "420"):
        pix = _grid(16, 16, lambda x, y: (200, 100, 50))
        w, h, rows = jpeg.read_jpeg(
            jpeg.write_jpeg(16, 16, pix, quality=95, subsampling=sub)
        )
        assert (w, h) == (16, 16)
        assert rows == pix, sub


def test_gradient_roundtrip_error_bound():
    pix = _grid(35, 21, lambda x, y: (x * 7 % 256, y * 5 % 256, (x + y) * 3 % 256))
    for sub, bound in (("444", 4), ("420", 12)):
        w, h, rows = jpeg.read_jpeg(
            jpeg.write_jpeg(35, 21, pix, quality=95, subsampling=sub)
        )
        errs = [
            abs(rows[y][x][c] - pix[y][x][c])
            for y in range(21)
            for x in range(35)
            for c in range(3)
        ]
        assert max(errs) <= bound, (sub, max(errs))


def test_non_multiple_of_mcu_geometry():
    """Edge replication: odd sizes decode back at the exact requested
    geometry for both MCU layouts (8x8 and 16x16)."""
    for w, h in ((1, 1), (9, 17), (15, 31)):
        pix = _grid(w, h, lambda x, y: (x * 20 % 256, y * 30 % 256, 120))
        for sub in ("444", "420"):
            gw, gh, rows = jpeg.read_jpeg(
                jpeg.write_jpeg(w, h, pix, quality=95, subsampling=sub)
            )
            assert (gw, gh) == (w, h)
            assert len(rows) == h and all(len(r) == w for r in rows)


def test_synthetic_noise_channel_means_survive():
    """md5-noise images are JPEG's worst case; channel MEANS (what the
    media pipeline extracts) must still come through closely — the DC
    coefficients carry them."""
    import hashlib

    d = hashlib.md5(b"some doc").digest()
    w, h = 4 + d[0] % 13, 4 + d[1] % 13
    pix = [
        [
            (d[(y * w + x + 11) % 16], d[(y * w + x + 5) % 16], d[(y * w + x) % 16])
            for x in range(w)
        ]
        for y in range(h)
    ]
    _, _, rows = jpeg.read_jpeg(jpeg.write_jpeg(w, h, pix, quality=95))
    n = w * h
    for c in range(3):
        want = sum(p[c] for row in pix for p in row) / n
        got = sum(p[c] for row in rows for p in row) / n
        assert abs(want - got) < 6, (c, want, got)


def test_rejects_bad_inputs():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.read_jpeg(b"BM not a jpeg")
    with pytest.raises(ValueError, match="subsampling"):
        jpeg.write_jpeg(2, 2, _grid(2, 2, lambda x, y: (0, 0, 0)), subsampling="422")
    # arithmetic-coded SOF9 must be rejected loudly
    blob = bytearray(jpeg.write_jpeg(8, 8, _grid(8, 8, lambda x, y: (1, 2, 3))))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC9
    with pytest.raises(ValueError, match="unsupported"):
        jpeg.read_jpeg(bytes(blob))


_FIXTURES = sorted(
    glob.glob("/usr/share/doc/nodejs/*white-stripe.jpg")
)


@pytest.mark.skipif(not _FIXTURES, reason="no system JPEG fixtures")
def test_decodes_real_world_progressive_jpegs():
    """Interop: the system's JFIF files are PROGRESSIVE (SOF2) with
    multiple spectral-selection + successive-approximation scans —
    decoding them exercises the G.1.2 DC/AC first + refinement paths
    against a real encoder's output.  'white-stripe' images must come
    out predominantly white."""
    for p in _FIXTURES:
        w, h, rows = jpeg.read_jpeg(open(p, "rb").read())
        assert w > 0 and h > 0
        assert len(rows) == h and all(len(r) == w for r in rows)
        n = w * h
        means = [
            sum(rows[y][x][c] for y in range(h) for x in range(w)) / n
            for c in range(3)
        ]
        assert all(m > 200 for m in means), (p, means)


@pytest.mark.skipif(not _FIXTURES, reason="no system JPEG fixtures")
def test_reencode_loop_on_real_image():
    """decode(progressive) -> encode(baseline q95) -> decode: the loop
    must be near-lossless (mean error well under 1 unit; edges may ring
    a few units)."""
    w, h, rows = jpeg.read_jpeg(open(_FIXTURES[0], "rb").read())
    w2, h2, rows2 = jpeg.read_jpeg(jpeg.write_jpeg(w, h, rows, quality=95))
    assert (w2, h2) == (w, h)
    errs = [
        abs(rows2[y][x][c] - rows[y][x][c])
        for y in range(h)
        for x in range(0, w, 3)
        for c in range(3)
    ]
    assert sum(errs) / len(errs) < 1.0
    assert max(errs) <= 32


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker; splice
    some before SOS and the file must still decode identically."""
    pix = _grid(10, 7, lambda x, y: (x * 20, y * 30, 90))
    blob = jpeg.write_jpeg(10, 7, pix, quality=95)
    i = blob.index(b"\xff\xda")
    padded = blob[:i] + b"\xff\xff\xff" + blob[i:]
    assert jpeg.read_jpeg(padded) == jpeg.read_jpeg(blob)


def test_baseline_single_component_scan_non_mcu_aligned():
    """T.81 A.2: a single-component scan is NON-INTERLEAVED even in
    baseline.  Hand-assemble a grayscale baseline JPEG whose width is
    not MCU-aligned with 2x2 sampling declared; decoding on the padded
    interleaved grid would desync the entropy stream (review finding)."""
    import struct

    w, h = 20, 12  # with 2x2 sampling: MCU grid 2x1, true block grid 3x2
    ql = jpeg._quality_scale(jpeg._Q_LUMA, 95)
    # luma plane, edge-replicated to the TRUE block grid (24 x 16)
    pw, ph = 24, 16
    plane = [0.0] * (pw * ph)
    for y in range(ph):
        for x in range(pw):
            sx, sy = min(x, w - 1), min(y, h - 1)
            plane[y * pw + x] = (sx * 9 + sy * 5) % 256 - 128
    dc_l, ac_l = jpeg._enc_table(*jpeg._DC_LUMA), jpeg._enc_table(*jpeg._AC_LUMA)
    wtr = jpeg._BitWriter()
    pred = [0]
    for by in range(2):
        for bx in range(3):  # component raster order, NOT MCU order
            zz = jpeg._quantized_block(plane, pw, bx * 8, by * 8, ql)
            jpeg._encode_block(zz, pred, 0, dc_l, ac_l, wtr)
    wtr.flush()

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    blob = bytearray(b"\xff\xd8")
    blob += seg(0xDB, bytes([0]) + bytes(ql[jpeg.ZIGZAG[i]] for i in range(64)))
    blob += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x22, 0]),
    )
    for tc_th, (bits, vals) in ((0x00, jpeg._DC_LUMA), (0x10, jpeg._AC_LUMA)):
        blob += seg(0xC4, bytes([tc_th] + bits) + bytes(vals))
    blob += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    blob += wtr.out
    blob += b"\xff\xd9"

    gw, gh, rows = jpeg.read_jpeg(bytes(blob))
    assert (gw, gh) == (w, h)
    # grayscale ramp survives within quantization error
    for y in range(0, h, 3):
        for x in range(0, w, 3):
            want = (x * 9 + y * 5) % 256
            assert abs(rows[y][x][0] - want) <= 6, (x, y, rows[y][x][0], want)

def test_truncated_scan_raises():
    """A JPEG whose entropy segment is cut mid-scan must raise (not
    silently decode the remaining blocks as gray) — consistent with the
    'truncated' errors BMP/PNG/GIF raise (ADVICE r6).  Truncate a noisy
    baseline image halfway through its entropy data and close with EOI:
    the decoder hits the marker with blocks still to decode."""
    import random

    rnd = random.Random(7)
    pix = _grid(32, 32, lambda x, y: (rnd.randrange(256),) * 3)
    blob = jpeg.write_jpeg(32, 32, pix, quality=95)
    i = blob.index(b"\xff\xda")
    hdr_len = int.from_bytes(blob[i + 2 : i + 4], "big")
    scan_start = i + 2 + hdr_len
    scan_end = blob.rindex(b"\xff\xd9")
    cut = scan_start + (scan_end - scan_start) // 2
    truncated = blob[:cut] + b"\xff\xd9"
    with pytest.raises(ValueError, match="truncated JPEG scan"):
        jpeg.read_jpeg(truncated)
