"""JFIF/JPEG codec, pure stdlib: baseline + progressive decoder,
baseline 4:4:4 / 4:2:0 encoder.

Implements the ITU-T T.81 DCT processes honestly: marker parsing
(SOI/APP/COM/DQT/SOF/DHT/DRI/SOS/RST/EOI), canonical Huffman table
construction, byte-stuffed entropy-coded scan decoding with DC
prediction and AC run-length/EOB/ZRL, the PROGRESSIVE (SOF2) spectral
selection + successive approximation procedures of Annex G (DC/AC
first and refinement scans, EOB runs), dequantization, zigzag, a
separable floating-point IDCT, chroma upsampling for 4:2:0/4:2:2, and
JFIF full-range YCbCr<->RGB.  The encoder writes baseline with
quality-scaled Annex K quantization tables, the Annex K Huffman
tables, and either 4:4:4 or box-averaged 4:2:0 sampling.

JPEG is LOSSY, so unlike BMP/PNG/GIF it cannot join the bit-exact
DuckDB pixel oracle (the oracle replays a generation formula; a decoded
JPEG is the formula plus quantization error that only a full DCT model
could replay in SQL).  Its evidence is therefore test-level: encoder->
decoder round-trips within analytic error bounds, and interop decoding
of real JFIF files produced by real encoders.

No reference counterpart: tmalaska/HBase-ToHDFS has no media path; this
supports the training-data-pipeline surface (SURVEY.md north star).

PRODUCTION SEAM: this interpreted decoder is the sandbox reference
implementation, not the 100 TB deployment shape — at scale, swap
``read_jpeg``/``write_jpeg`` for libjpeg-turbo/Pillow-SIMD behind the
same signatures; every ``mapInPandas`` stage, plan, and oracle above
the seam is unchanged (SCALE.md "The production codec seam").
"""

from __future__ import annotations

import math
import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 quantization tables (luminance, chrominance), natural order
_Q_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_Q_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _idct_2d(coef: list[float]) -> list[float]:
    """Separable 8x8 inverse DCT (T.81 A.3.3), rows then columns."""
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[8 * y : 8 * y + 8]
        for x in range(8):
            tmp[8 * y + x] = 0.5 * sum(
                _C[u] * row[u] * _COS[x][u] for u in range(8)
            )
    out = [0.0] * 64
    for x in range(8):
        col = [tmp[8 * y + x] for y in range(8)]
        for y in range(8):
            out[8 * y + x] = 0.5 * sum(
                _C[v] * col[v] * _COS[y][v] for v in range(8)
            )
    return out


def _dct_2d(block: list[float]) -> list[float]:
    """Separable forward 8x8 DCT (T.81 A.3.3)."""
    tmp = [0.0] * 64
    for y in range(8):
        row = block[8 * y : 8 * y + 8]
        for u in range(8):
            tmp[8 * y + u] = 0.5 * _C[u] * sum(
                row[x] * _COS[x][u] for x in range(8)
            )
    out = [0.0] * 64
    for u in range(8):
        col = [tmp[8 * y + u] for y in range(8)]
        for v in range(8):
            out[8 * v + u] = 0.5 * _C[v] * sum(
                col[y] * _COS[y][v] for y in range(8)
            )
    return out


# --------------------------------------------------------------- decoder
class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; RSTn markers are consumed by reset()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _next_byte(self) -> int:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            # marker (RST or EOI): signal padding; caller handles
            raise _MarkerReached()
        self.pos += 1
        return b

    def bit(self) -> int:
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_to_marker(self) -> int:
        """Discard partial byte, step over an expected marker, return its
        second byte."""
        self.n = 0
        d = self.data
        while d[self.pos] != 0xFF or d[self.pos + 1] == 0x00:
            self.pos += 1
        m = d[self.pos + 1]
        self.pos += 2
        return m


class _MarkerReached(Exception):
    pass


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for a canonical T.81 table."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_code(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def read_jpeg(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a JFIF/JPEG -> (width, height, top-down RGB rows).

    Supports BOTH baseline sequential (SOF0/1) and PROGRESSIVE (SOF2)
    processes: progressive coefficients accumulate across scans
    (spectral selection Ss..Se, successive approximation Ah/Al with the
    T.81 G.1.2 DC/AC first + refinement procedures, EOB runs), then one
    dequantize + IDCT pass renders the final image.  1- and
    3-component frames, 4:4:4 / 4:2:2 / 4:2:0 sampling, and restart
    intervals are handled; arithmetic coding and hierarchical mode are
    rejected loudly."""
    d = bytes(payload)
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    blocks = None  # per comp: dict[(by, bx)] -> 64 quantized coefs, zigzag order
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — skip them instead of reading 0xFF as the code
        while pos + 1 < len(d) and d[pos + 1] == 0xFF:
            pos += 1
        marker = d[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", d, pos)
        seg = d[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    vals = list(struct.unpack_from(f">{64}H", seg, i))
                    i += 128
                else:
                    vals = list(seg[i : i + 64])
                    i += 64
                qt[tq] = vals  # zigzag order, matching stored coefs
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _build_huffman(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame["mcus_x"] = -(-w // (8 * hmax))
            frame["mcus_y"] = -(-h // (8 * vmax))
            frame["hmax"], frame["vmax"] = hmax, vmax
            for c in comps:
                # true component block grid (non-interleaved scans walk
                # exactly this) and the padded interleaved grid
                c["bw"] = -(-(-(-w * c["h"] // hmax)) // 8)
                c["bh"] = -(-(-(-h * c["v"] // vmax)) // 8)
            blocks = [{} for _ in comps]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tds = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(
                    i for i, cc in enumerate(frame["comps"]) if cc["id"] == cs
                )
                scan_comps.append((ci, tds >> 4, tds & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _decode_scan(
                d, pos + seglen, frame, scan_comps, blocks, huff_dc,
                huff_ac, restart_interval, progressive, ss, se, ah, al,
            )
            continue
        pos += seglen
    if blocks is None or not any(blocks):
        raise ValueError("no scan data — truncated JPEG")
    return _render(frame, blocks, qt)


def _decode_scan(
    d, pos, frame, scan_comps, blocks, huff_dc, huff_ac, restart,
    progressive, ss, se, ah, al,
):
    """Decode one entropy-coded segment into the quantized-coefficient
    store; returns the stream position after the segment."""
    comps = frame["comps"]
    r = _BitReader(d, pos)
    pred = {ci: 0 for ci, _, _ in scan_comps}
    eobrun = 0

    def block(ci, by, bx):
        st = blocks[ci]
        if (by, bx) not in st:
            st[(by, bx)] = [0] * 64
        return st[(by, bx)]

    def decode_dc_first(ci, dc_t, coef):
        t = _read_code(r, huff_dc[dc_t])
        diff = _extend(r.bits(t), t) if t else 0
        pred[ci] += diff
        coef[0] = pred[ci] << al

    def decode_dc_refine(coef):
        if r.bit():
            coef[0] |= 1 << al

    def decode_ac_first(ac_t, coef):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _read_code(r, huff_ac[ac_t])
            rr, s = rs >> 4, rs & 0x0F
            if s == 0:
                if rr != 15:
                    eobrun = (1 << rr) - 1
                    if rr:
                        eobrun += r.bits(rr)
                    return
                k += 16
                continue
            k += rr
            if k > se:
                raise ValueError("AC run past spectral band")
            coef[k] = _extend(r.bits(s), s) << al
            k += 1

    def decode_ac_refine(ac_t, coef):
        # T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine
        nonlocal eobrun
        p1, m1 = 1 << al, -1 << al

        def correct(k):
            if r.bit() and (coef[k] & p1) == 0:
                coef[k] += p1 if coef[k] >= 0 else m1

        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _read_code(r, huff_ac[ac_t])
                rr, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if rr != 15:
                        eobrun = (1 << rr)
                        if rr:
                            eobrun += r.bits(rr)
                        break
                else:
                    if s != 1:
                        raise ValueError("bad refinement magnitude")
                    val = p1 if r.bit() else m1
                while k <= se:
                    if coef[k] != 0:
                        correct(k)
                    else:
                        if rr == 0:
                            if val:
                                coef[k] = val
                            k += 1
                            break
                        rr -= 1
                    k += 1
        if eobrun > 0:
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                k += 1
            eobrun -= 1

    marker_hit = False

    def do_block(ci, dc_t, ac_t, by, bx):
        # A marker interrupting entropy decode is benign ONLY in the very
        # last block of the scan (encoder padding before the segment-end
        # marker).  Hitting one with blocks still to decode means the
        # entropy stream is truncated/corrupt — raise instead of leaving
        # the rest of the image plausibly gray (matches the 'truncated'
        # errors the BMP/PNG/GIF parsers raise).
        nonlocal marker_hit
        if marker_hit:
            raise ValueError("truncated JPEG scan")
        coef = block(ci, by, bx)
        try:
            if progressive:
                if ss == 0:
                    if ah == 0:
                        decode_dc_first(ci, dc_t, coef)
                    else:
                        decode_dc_refine(coef)
                else:
                    if ah == 0:
                        decode_ac_first(ac_t, coef)
                    else:
                        decode_ac_refine(ac_t, coef)
            else:
                decode_dc_first(ci, dc_t, coef)
                k = 1
                while k < 64:
                    rs = _read_code(r, huff_ac[ac_t])
                    rr, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if rr == 15:
                            k += 16
                            continue
                        break
                    k += rr
                    if k > 63:
                        raise ValueError("AC run past block")
                    coef[k] = _extend(r.bits(s), s)
                    k += 1
        except _MarkerReached:
            marker_hit = True  # tolerated iff no further block follows

    def reset_state():
        nonlocal eobrun
        for ci in pred:
            pred[ci] = 0
        eobrun = 0

    unit_count = 0

    def maybe_restart():
        nonlocal unit_count
        if restart and unit_count and unit_count % restart == 0:
            m = r.sync_to_marker()
            if not (0xD0 <= m <= 0xD7):
                raise ValueError(f"expected RST marker, got 0x{m:02x}")
            reset_state()
        unit_count += 1

    if len(scan_comps) == 1:
        # T.81 A.2: a single-component scan is NON-INTERLEAVED in both
        # baseline and progressive — walk the component's true block
        # grid, not the padded MCU grid (the padded walk would read
        # blocks the stream doesn't contain and desync the entropy
        # decode whenever dimensions aren't MCU-aligned)
        ci, dc_t, ac_t = scan_comps[0]
        c = comps[ci]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                maybe_restart()
                do_block(ci, dc_t, ac_t, by, bx)
    else:
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                maybe_restart()
                for ci, dc_t, ac_t in scan_comps:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            do_block(
                                ci, dc_t, ac_t,
                                my * c["v"] + by, mx * c["h"] + bx,
                            )
    # step past any partial byte; position caller at the next marker
    r.n = 0
    dta = r.data
    p2 = r.pos
    while p2 < len(dta) - 1 and not (
        dta[p2] == 0xFF and dta[p2 + 1] not in (0x00,)
    ):
        p2 += 1
    return p2


def _render(frame, blocks, qt):
    """Dequantize + IDCT every stored block, assemble RGB rows."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    cws = []
    for ci, c in enumerate(comps):
        cw = frame["mcus_x"] * c["h"] * 8
        ch = frame["mcus_y"] * c["v"] * 8
        plane = [0.0] * (cw * ch)
        q = qt[c["tq"]]
        for (by, bx), zz in blocks[ci].items():
            coef = [0.0] * 64
            for k in range(64):
                coef[ZIGZAG[k]] = zz[k] * q[k]
            px = _idct_2d(coef)
            ox, oy = bx * 8, by * 8
            for yy in range(8):
                if oy + yy >= ch:
                    break
                row = (oy + yy) * cw + ox
                for xx in range(8):
                    if ox + xx < cw:
                        plane[row + xx] = px[8 * yy + xx] + 128
        planes.append(plane)
        cws.append(cw)
    rows = []
    if len(comps) == 1:
        cw = cws[0]
        for y in range(h):
            row = []
            for x in range(w):
                g = min(max(int(round(planes[0][y * cw + x])), 0), 255)
                row.append((g, g, g))
            rows.append(row)
        return w, h, rows
    for y in range(h):
        row = []
        for x in range(w):
            vals = []
            for ci, c in enumerate(comps):
                sx = x * c["h"] // hmax
                sy = y * c["v"] // vmax
                vals.append(planes[ci][sy * cws[ci] + sx])
            yy, cb, cr = vals[0], vals[1] - 128, vals[2] - 128
            rr = yy + 1.402 * cr
            gg = yy - 0.344136 * cb - 0.714136 * cr
            bb = yy + 1.772 * cb
            row.append(
                tuple(min(max(int(round(v)), 0), 255) for v in (rr, gg, bb))
            )
        rows.append(row)
    return w, h, rows


# --------------------------------------------------------------- encoder
def _quality_scale(table: list[int], quality: int) -> list[int]:
    """IJG quality scaling of an Annex K table."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(max((v * s + 50) // 100, 1), 255) for v in table]


def _enc_table(bits, vals):
    """symbol -> (code, length) for the encoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _magnitude(v: int) -> tuple[int, int]:
    """(category, magnitude bits) per T.81 F.1.2.1."""
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t, v if v >= 0 else v + (1 << t) - 1


def _encode_block(zz, pred, ci, dc_tab, ac_tab, wtr):
    diff = zz[0] - pred[ci]
    pred[ci] = zz[0]
    t, mag = _magnitude(diff)
    code, ln = dc_tab[t]
    wtr.write(code, ln)
    if t:
        wtr.write(mag, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        t, mag = _magnitude(zz[k])
        code, ln = ac_tab[(run << 4) | t]
        wtr.write(code, ln)
        wtr.write(mag, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        wtr.write(code, ln)


def _quantized_block(plane, pw, ox, oy, q):
    dct_in = [
        plane[(oy + y) * pw + ox + x] for y in range(8) for x in range(8)
    ]
    coef = _dct_2d(dct_in)
    quant = [int(round(coef[i] / q[i])) for i in range(64)]
    return [quant[ZIGZAG[i]] for i in range(64)]


def write_jpeg(
    width: int,
    height: int,
    pixels: list[list[tuple[int, int, int]]],
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """Encode top-down RGB pixels as a baseline JFIF JPEG.

    ``subsampling``: "444" (every component full resolution, one block
    per component per MCU) or "420" (chroma box-averaged 2x2, MCUs of
    four Y blocks + Cb + Cr — the layout virtually every camera/phone
    JPEG uses, and the encoder half of the decoder's subsampled
    interleave test)."""
    if height <= 0 or width <= 0 or len(pixels) != height:
        raise ValueError("pixels must be a non-empty height x width grid")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    ql = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    hs = vs = 2 if subsampling == "420" else 1
    mcu_px = 8 * hs  # MCU edge in luma pixels
    mcus_x = -(-width // mcu_px)
    mcus_y = -(-height // mcu_px)
    yw, yh = mcus_x * mcu_px, mcus_y * mcu_px
    cw, ch = mcus_x * 8, mcus_y * 8
    yplane = [0.0] * (yw * yh)
    cbp = [0.0] * (cw * ch)
    crp = [0.0] * (ch * cw)
    # luma at full resolution with edge replication
    cbfull = [0.0] * (yw * yh)
    crfull = [0.0] * (yw * yh)
    for y in range(yh):
        sy = min(y, height - 1)
        for x in range(yw):
            sx = min(x, width - 1)
            r, g, b = pixels[sy][sx]
            i = y * yw + x
            yplane[i] = 0.299 * r + 0.587 * g + 0.114 * b - 128
            cbfull[i] = -0.168736 * r - 0.331264 * g + 0.5 * b
            crfull[i] = 0.5 * r - 0.418688 * g - 0.081312 * b
    if hs == 1:
        cbp, crp = cbfull, crfull
        cw = yw
    else:
        for y in range(ch):
            for x in range(cw):
                acc_cb = acc_cr = 0.0
                for dy in range(2):
                    for dx in range(2):
                        i = (2 * y + dy) * yw + 2 * x + dx
                        acc_cb += cbfull[i]
                        acc_cr += crfull[i]
                cbp[y * cw + x] = acc_cb / 4
                crp[y * cw + x] = acc_cr / 4
    dc_l, ac_l = _enc_table(*_DC_LUMA), _enc_table(*_AC_LUMA)
    dc_c, ac_c = _enc_table(*_DC_CHROMA), _enc_table(*_AC_CHROMA)
    wtr = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(vs):
                for bx in range(hs):
                    zz = _quantized_block(
                        yplane, yw, (mx * hs + bx) * 8, (my * vs + by) * 8, ql
                    )
                    _encode_block(zz, pred, 0, dc_l, ac_l, wtr)
            for ci, plane in ((1, cbp), (2, crp)):
                zz = _quantized_block(plane, cw, mx * 8, my * 8, qc)
                _encode_block(zz, pred, ci, dc_c, ac_c, wtr)
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    hv_luma = (hs << 4) | vs
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG[i]] for i in range(64)))
    out += seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG[i]] for i in range(64)))
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, hv_luma, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for tc_th, (bits, vals) in (
        (0x00, _DC_LUMA), (0x10, _AC_LUMA), (0x01, _DC_CHROMA), (0x11, _AC_CHROMA)
    ):
        out += seg(0xC4, bytes([tc_th] + bits) + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
