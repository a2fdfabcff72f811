"""Minimal GIF87a writer/reader, pure stdlib.

Implements the public GIF specification for the subset the multimodal
pipeline needs as a third REAL compressed container (after BMP's strides
and PNG's DEFLATE+filters): logical screen descriptor, a global color
table, one non-interlaced image, and genuine variable-code-width LZW
compression of the pixel indices — the codec that made GIF famous, done
honestly with code table growth, clear codes, and EOI.

The constraint this inherits from the format: at most 256 distinct
colors per image.  The synthetic corpus images are <= 16x16 = 256
pixels, so every image trivially fits a palette; the writer builds the
palette from the distinct pixels in first-appearance order and refuses
inputs that exceed 256 colors (this is a codec boundary, not a decoder
shortcut — full-color photos need quantization, which is out of scope).

No reference counterpart: tmalaska/HBase-ToHDFS has no media path; this
supports the training-data-pipeline surface (SURVEY.md north star).
"""

from __future__ import annotations

import struct

SIGNATURE = b"GIF87a"


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Variable-width LZW per the GIF spec: start at min_code_size+1
    bits, emit CLEAR first, grow the table to 4095, re-CLEAR when full,
    finish with EOI.  Output is the raw code stream (not yet
    sub-blocked)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def fresh_table():
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh_table()
    out_bits.append((clear, width))
    buf: tuple[int, ...] = ()
    for idx in indices:
        cand = buf + (idx,)
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        # The decoder builds its table one code BEHIND the encoder (it
        # learns entry i only upon receiving code i+1), so it reaches
        # the 1<<width boundary one emission later than we do.  Growing
        # here at (1<<width)+1 makes our first wider emission land
        # exactly when the decoder has widened — the no-early-change
        # convention, locked in by round-trip tests that cross the
        # 512/1024/2048 boundaries.
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        buf = (idx,)
        if next_code > 4095:
            out_bits.append((clear, width))
            table, next_code, width = fresh_table()
    if buf:
        out_bits.append((table[buf], width))
    out_bits.append((eoi, width))

    acc = n = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << n
        n += w
        while n >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Inverse of :func:`_lzw_encode` — the spec's decoder with the
    classic KwKwK case (code == next_code)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh_table():
        return {i: (i,) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh_table()
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = n = pos = 0
    while True:
        while n < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI")
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table, next_code, width = fresh_table()
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + (entry[0],)
            next_code += 1
        elif code == next_code:
            entry = prev + (prev[0],)  # KwKwK
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > {next_code}")
        if next_code == (1 << width) and width < 12:
            width += 1
        out.extend(entry)
        prev = entry


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _truncation_guard(fn):
    """Re-raise raw IndexError/struct.error from a truncated payload as
    the ValueError('truncated ...') the other codecs raise."""
    import functools

    @functools.wraps(fn)
    def inner(payload):
        try:
            return fn(payload)
        except (IndexError, struct.error) as exc:
            raise ValueError(f"truncated GIF payload ({exc})") from exc

    return inner


def _color_table(payload: bytes, pos: int, n: int) -> tuple[list, int]:
    """Read an n-entry RGB color table with an explicit bounds check —
    a truncated table must raise, not yield short/empty tuples that
    masquerade as pixels downstream."""
    if pos + 3 * n > len(payload):
        raise ValueError("truncated GIF color table")
    ct = [tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
    return ct, pos + 3 * n


def write_gif(
    width: int, height: int, pixels: list[list[tuple[int, int, int]]]
) -> bytes:
    """Encode top-down ``pixels[y][x] = (r, g, b)`` as a single-image
    GIF87a with a global color table built from the distinct colors
    (first-appearance order; > 256 distinct colors is a ValueError)."""
    if height <= 0 or width <= 0 or len(pixels) != height:
        raise ValueError("pixels must be a non-empty height x width grid")
    palette: dict[tuple[int, int, int], int] = {}
    indices: list[int] = []
    for row in pixels:
        if len(row) != width:
            raise ValueError("ragged pixel grid")
        for px in row:
            if px not in palette:
                if len(palette) == 256:
                    raise ValueError(
                        "more than 256 distinct colors: GIF needs "
                        "quantization, which this codec does not do"
                    )
                palette[px] = len(palette)
            indices.append(palette[px])
    # color table size: power of two >= len(palette), min 2
    ct_bits = 1
    while (1 << ct_bits) < len(palette):
        ct_bits += 1
    ct = bytearray()
    for (r, g, b) in palette:
        ct += bytes((r, g, b))
    ct += b"\x00" * (3 * ((1 << ct_bits) - len(palette)))
    min_code_size = max(ct_bits, 2)
    screen = struct.pack(
        "<HHBBB", width, height, 0x80 | ((ct_bits - 1) & 0x07), 0, 0
    )
    image_desc = struct.pack("<sHHHHB", b",", 0, 0, width, height, 0)
    lzw = _lzw_encode(indices, min_code_size)
    return (
        SIGNATURE
        + screen
        + bytes(ct)
        + image_desc
        + bytes([min_code_size])
        + _sub_blocks(lzw)
        + b";"
    )


@_truncation_guard
def read_gif(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a single-image non-interlaced GIF87a/89a -> (width,
    height, top-down RGB rows).  Walks the block structure (skipping
    89a extensions), reads the active color table, de-sub-blocks the
    LZW stream, and decompresses it for real."""
    payload = bytes(payload)
    if payload[:3] != b"GIF" or payload[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF payload (bad signature)")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(payload, pos, 2 << (flags & 0x07))
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # 89a extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:
                ct, pos = _color_table(payload, pos, 2 << (iflags & 0x07))
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if ct is None:
                raise ValueError("no color table")
            min_code_size = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(lzw), min_code_size)
            if len(indices) != w * h:
                raise ValueError(
                    f"LZW produced {len(indices)} pixels, want {w * h}"
                )
            rows = [
                [ct[indices[y * w + x]] for x in range(w)] for y in range(h)
            ]
            return w, h, rows
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("no image data in GIF")


def write_gif_frames(
    width: int,
    height: int,
    frames: list[list[list[tuple[int, int, int]]]],
) -> bytes:
    """Encode multiple full-size frames as an animated GIF89a: one
    global-palette-free stream where each frame carries its own LOCAL
    color table and LZW stream, preceded by a minimal graphic-control
    extension.  Frames are full replacements (disposal 'none'), which
    keeps decode = per-frame decode with no compositing state."""
    if not frames:
        raise ValueError("need at least one frame")
    parts = [b"GIF89a", struct.pack("<HHBBB", width, height, 0, 0, 0)]
    for fr in frames:
        if len(fr) != height or any(len(r) != width for r in fr):
            raise ValueError("every frame must be height x width")
        single = write_gif(width, height, fr)
        # strip header/trailer, keep (image descriptor + CT + data);
        # the single-image writer uses a GLOBAL table, so rewrite its
        # screen-descriptor table as a LOCAL one on the descriptor
        flags = single[10]
        ct_bits = (flags & 0x07) + 1
        ct = single[13 : 13 + 3 * (1 << ct_bits)]
        body = single[13 + len(ct) : -1]  # image descriptor + lzw
        desc = bytearray(body[:10])
        desc[9] = 0x80 | (ct_bits - 1)  # local color table flag + size
        parts.append(b"\x21\xf9\x04\x00\x00\x00\x00\x00")  # GCE
        parts.append(bytes(desc) + ct + body[10:])
    parts.append(b";")
    return b"".join(parts)


@_truncation_guard
def read_gif_frames(
    payload: bytes,
) -> tuple[int, int, list[list[list[tuple[int, int, int]]]]]:
    """Decode EVERY image in a GIF87a/89a stream -> (screen_w,
    screen_h, frames).  Each frame is returned at the screen geometry
    with its pixels placed at the image descriptor's offset (no
    inter-frame compositing — frames written by write_gif_frames are
    full replacements; partial-update GIFs yield the painted region
    over black)."""
    payload = bytes(payload)
    if payload[:3] != b"GIF" or payload[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF payload (bad signature)")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(payload, pos, 2 << (flags & 0x07))
    frames = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            left, top, w, h, iflags = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            ct = gct
            if iflags & 0x80:
                ct, pos = _color_table(payload, pos, 2 << (iflags & 0x07))
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            if ct is None:
                raise ValueError("no color table")
            min_code_size = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(lzw), min_code_size)
            if len(indices) != w * h:
                raise ValueError("frame pixel count mismatch")
            frame = [[(0, 0, 0)] * sw for _ in range(sh)]
            for y in range(h):
                for x in range(w):
                    if top + y < sh and left + x < sw:
                        frame[top + y][left + x] = ct[indices[y * w + x]]
            frames.append(frame)
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("no image data in GIF")
    return sw, sh, frames
