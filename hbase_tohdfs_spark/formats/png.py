"""Minimal 8-bit RGB PNG writer/reader, pure stdlib (zlib + struct).

Implements the public PNG spec (RFC 2083 / ISO 15948) for the subset a
training-data pipeline's dominant compressed image format needs to be
REAL rather than stubbed: 8-bit-per-channel truecolor (color type 2),
non-interlaced, with all five scanline filter types (None/Sub/Up/
Average/Paeth).  IDAT payloads are DEFLATE streams via ``zlib``; chunk
CRCs are ``zlib.crc32`` — everything in this container is reachable from
the standard library, which is what makes PNG the honest compressed
codec here where libjpeg is not available.

The WRITER deliberately cycles the row filter type (``y % 5``) so every
encoded image exercises every unfilter path in the reader — a decoder
that mishandles Sub/Up/Average/Paeth reconstruction corrupts pixel
values and fails the channel-mean oracle, exactly like the BMP stride
trap in ``formats/bmp.py``.

No reference counterpart: tmalaska/HBase-ToHDFS has no media path; this
supports the training-data-pipeline surface (SURVEY.md north star).
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # bytes per pixel: 8-bit RGB


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec 6.6): nearest of left/up/upper-left to
    the initial estimate a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def write_png(
    width: int,
    height: int,
    pixels: list[list[tuple[int, int, int]]],
    filter_cycle: bool = True,
) -> bytes:
    """Encode top-down ``pixels[y][x] = (r, g, b)`` as an 8-bit RGB PNG.

    ``filter_cycle=True`` assigns row ``y`` filter type ``y % 5`` so all
    five filters appear in any image of >= 5 rows; ``False`` writes
    filter 0 everywhere (useful to isolate inflate bugs from unfilter
    bugs in tests)."""
    if height <= 0 or width <= 0 or len(pixels) != height:
        raise ValueError("pixels must be a non-empty height x width grid")
    raw = bytearray()
    prev = bytes(_BPP * width)
    for y in range(height):
        row = pixels[y]
        if len(row) != width:
            raise ValueError(f"row {y} has {len(row)} pixels, want {width}")
        cur = bytes(v & 0xFF for px in row for v in px)
        ftype = (y % 5) if filter_cycle else 0
        raw.append(ftype)
        for i in range(len(cur)):
            a = cur[i - _BPP] if i >= _BPP else 0
            b = prev[i]
            c = prev[i - _BPP] if i >= _BPP else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            raw.append((cur[i] - pred) & 0xFF)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def read_png(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode an 8-bit RGB non-interlaced PNG -> (width, height,
    top-down rows of (r, g, b)).  Verifies chunk CRCs, concatenates all
    IDAT chunks, inflates, and reconstructs every scanline through the
    spec's five filter types."""
    payload = bytes(payload)
    if payload[:8] != SIGNATURE:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    width = height = None
    idat = bytearray()
    seen_iend = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk data")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, depth, ctype_n, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (depth, ctype_n, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only 8-bit RGB (color type 2) non-interlaced PNG "
                    f"supported (depth={depth}, color={ctype_n}, "
                    f"interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if width is None or not seen_iend:
        raise ValueError("missing IHDR or IEND chunk")
    raw = zlib.decompress(bytes(idat))
    stride = _BPP * width
    if len(raw) != height * (1 + stride):
        raise ValueError(
            f"inflated scanline data is {len(raw)} bytes, want "
            f"{height * (1 + stride)}"
        )
    rows: list[list[tuple[int, int, int]]] = []
    prev = bytes(stride)
    for y in range(height):
        base = y * (1 + stride)
        ftype = raw[base]
        if ftype > 4:
            raise ValueError(f"unknown filter type {ftype} on row {y}")
        line = raw[base + 1 : base + 1 + stride]
        cur = bytearray(stride)
        for i in range(stride):
            a = cur[i - _BPP] if i >= _BPP else 0
            b = prev[i]
            c = prev[i - _BPP] if i >= _BPP else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            cur[i] = (line[i] + pred) & 0xFF
        rows.append(
            [
                (cur[3 * x], cur[3 * x + 1], cur[3 * x + 2])
                for x in range(width)
            ]
        )
        prev = bytes(cur)
    return width, height, rows
