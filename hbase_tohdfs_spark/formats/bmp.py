"""Minimal uncompressed 24-bit BMP writer/reader, pure stdlib.

Implements the public Windows BMP layout: a 14-byte BITMAPFILEHEADER,
a 40-byte BITMAPINFOHEADER, then pixel rows stored BOTTOM-UP as BGR
triples with each row padded to a 4-byte boundary.  This is the real
binary-image codec behind the multimodal pipeline (round-4 verdict item:
retire the deterministic fake decode) — small enough to be honest about,
real enough that a decoder bug (stride, byte order, row direction) is a
pixel-value mismatch the DuckDB oracle catches.

No reference counterpart: tmalaska/HBase-ToHDFS has no media path; this
supports the training-data-pipeline surface (SURVEY.md north star).
"""

from __future__ import annotations

import struct

_FILE_HEADER = "<2sIHHI"      # magic, file size, reserved x2, pixel offset
_INFO_HEADER = "<IiiHHIIiiII"  # size, w, h, planes, bpp, compression,
                               # image size, ppm x/y, colors used/important

HEADER_BYTES = struct.calcsize(_FILE_HEADER) + struct.calcsize(_INFO_HEADER)


def row_stride(width: int) -> int:
    """Bytes per stored row: 3*width rounded up to a 4-byte boundary."""
    return (3 * width + 3) & ~3


def write_bmp24(width: int, height: int, pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode top-down ``pixels[y][x] = (r, g, b)`` as an uncompressed
    24-bit BMP.  Row padding is written as 0xFF on purpose: a decoder
    that ignores the stride and reads rows back-to-back picks up the
    padding as pixel data and fails the channel-mean oracle."""
    if height <= 0 or width <= 0 or len(pixels) != height:
        raise ValueError("pixels must be a non-empty height x width grid")
    stride = row_stride(width)
    image_size = stride * height
    file_header = struct.pack(
        _FILE_HEADER, b"BM", HEADER_BYTES + image_size, 0, 0, HEADER_BYTES
    )
    info_header = struct.pack(
        _INFO_HEADER, 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    pad = b"\xff" * (stride - 3 * width)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for r, g, b in pixels[y]:
            row += bytes((b, g, r))  # BGR on disk
        rows.append(bytes(row) + pad)
    return file_header + info_header + b"".join(rows)


def read_bmp24(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode an uncompressed 24-bit BMP -> (width, height, top-down rows
    of (r, g, b)).  Handles both bottom-up (height > 0) and top-down
    (height < 0) storage and skips row padding."""
    payload = bytes(payload)
    magic, _fsize, _r1, _r2, offset = struct.unpack_from(_FILE_HEADER, payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    _hsize, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, struct.calcsize(_FILE_HEADER)
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    stride = row_stride(width)
    if len(payload) < offset + stride * height:
        raise ValueError("truncated BMP payload")
    rows = []
    for file_row in range(height):
        base = offset + file_row * stride
        rows.append(
            [
                (
                    payload[base + 3 * x + 2],
                    payload[base + 3 * x + 1],
                    payload[base + 3 * x],
                )
                for x in range(width)
            ]
        )
    if bottom_up:
        rows.reverse()
    return width, height, rows
