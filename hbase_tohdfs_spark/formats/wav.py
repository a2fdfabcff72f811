"""Minimal RIFF/WAVE 16-bit PCM writer/reader, pure stdlib.

Implements the public WAV layout: a RIFF container holding a ``fmt ``
chunk (PCM, interleaved little-endian int16 samples) and a ``data``
chunk.  The reader walks the chunk list — skipping unknown chunks, as a
real parser must — so a payload with e.g. a LIST/INFO chunk between
``fmt `` and ``data`` still decodes.

This is the real audio codec behind the multimodal pipeline: round-4's
``decode_audio_stub`` raised NotImplementedError because compressed
codecs (mp3/aac) need libraries this container lacks; uncompressed PCM
needs only ``struct``, so the decode can be honest.

No reference counterpart: tmalaska/HBase-ToHDFS has no media path; this
supports the training-data-pipeline surface (SURVEY.md north star).
"""

from __future__ import annotations

import struct


def write_wav16(sample_rate: int, channels: list[list[int]]) -> bytes:
    """Encode per-channel int16 sample lists (equal lengths) as PCM WAV."""
    n_ch = len(channels)
    if n_ch == 0 or len({len(c) for c in channels}) != 1:
        raise ValueError("channels must be non-empty lists of equal length")
    n_samples = len(channels[0])
    block_align = 2 * n_ch
    byte_rate = sample_rate * block_align
    frames = bytearray()
    for i in range(n_samples):
        for ch in channels:
            frames += struct.pack("<h", ch[i])
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, byte_rate, block_align, 16)
    data = bytes(frames)
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def read_wav16(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode PCM WAV -> (sample_rate, n_channels, per-channel samples).

    Walks chunks (word-aligned, per the RIFF spec) and ignores ones it
    doesn't know; requires an uncompressed 16-bit PCM ``fmt `` chunk
    before ``data``."""
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    end = min(end, len(payload))
    fmt = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body_at = pos + 8
        if body_at + size > len(payload):
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _brate, _balign, bits = struct.unpack_from(
                "<HHIIHH", payload, body_at
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"only uncompressed 16-bit PCM supported (fmt={audio_fmt}, bits={bits})"
                )
            fmt = (rate, n_ch)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            rate, n_ch = fmt
            n_frames = size // (2 * n_ch)
            chans: list[list[int]] = [[] for _ in range(n_ch)]
            for i in range(n_frames):
                base = body_at + i * 2 * n_ch
                for c in range(n_ch):
                    chans[c].append(struct.unpack_from("<h", payload, base + 2 * c)[0])
            return rate, n_ch, chans
        pos = body_at + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk found")
