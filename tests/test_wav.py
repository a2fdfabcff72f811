"""Pure-Python tests for the WAV codec, real audio decode, and the
BMP-sequence frame walker.  No SparkSession needed."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hbase_tohdfs_spark.formats import wav
from hbase_tohdfs_spark.operators import multimodal as mm


@given(
    rate=st.sampled_from([8000, 16000, 44100]),
    n_ch=st.integers(min_value=1, max_value=3),
    n_samples=st.integers(min_value=1, max_value=200),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_roundtrip(rate, n_ch, n_samples, seed):
    chans = [
        [((seed + c * 7919 + i * 31) % 65536) - 32768 for i in range(n_samples)]
        for c in range(n_ch)
    ]
    rrate, rch, rchans = wav.read_wav16(wav.write_wav16(rate, chans))
    assert (rrate, rch) == (rate, n_ch)
    assert rchans == chans


def test_reader_skips_unknown_chunks():
    # A LIST/INFO chunk between fmt and data is legal RIFF; a parser that
    # assumes data follows fmt directly mis-reads every sample.
    payload = wav.write_wav16(8000, [[1, -2, 3]])
    fmt_at = payload.index(b"fmt ")
    fmt_chunk = payload[fmt_at : fmt_at + 8 + 16]
    data_at = payload.index(b"data")
    data_chunk = payload[data_at:]
    info = b"LIST" + struct.pack("<I", 4) + b"INFO"
    rebuilt = payload[:12] + fmt_chunk + info + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    rate, n_ch, chans = wav.read_wav16(rebuilt)
    assert (rate, n_ch, chans) == (8000, 1, [[1, -2, 3]])


def test_reader_honors_word_alignment():
    # An odd-sized unknown chunk is padded to a word boundary; a reader
    # that forgets the pad byte walks into the middle of 'data'.
    payload = wav.write_wav16(8000, [[5, 6]])
    fmt_at = payload.index(b"fmt ")
    fmt_chunk = payload[fmt_at : fmt_at + 8 + 16]
    data_chunk = payload[payload.index(b"data"):]
    odd = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3 bytes + pad
    rebuilt = payload[:12] + fmt_chunk + odd + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    assert wav.read_wav16(rebuilt)[2] == [[5, 6]]


def test_reader_rejects_non_wav():
    with pytest.raises(ValueError, match="RIFF"):
        wav.read_wav16(b"OggS" + b"\x00" * 64)


def test_reader_rejects_compressed():
    payload = bytearray(wav.write_wav16(8000, [[1]]))
    fmt_at = payload.index(b"fmt ")
    struct.pack_into("<H", payload, fmt_at + 8, 85)  # fake mp3 format tag
    with pytest.raises(ValueError, match="PCM"):
        wav.read_wav16(bytes(payload))


def test_decode_wav_rms_matches_brute_force():
    payload = mm.synth_wav(b"a document")
    rate, n_ch, chans = wav.read_wav16(payload)
    feats = mm.decode_wav(payload)
    assert feats["sample_rate"] == rate
    assert feats["n_channels"] == n_ch
    for c, ch in enumerate(chans):
        exact = math.sqrt(sum(s * s for s in ch) / len(ch))
        assert feats["channel_rms"][c] == pytest.approx(exact, abs=1e-6)


def test_synth_wav_formula():
    import hashlib

    d = hashlib.md5(b"seed").digest()
    rate, n_ch, chans = wav.read_wav16(mm.synth_wav(b"seed"))
    assert n_ch == 1 + d[2] % 2
    assert len(chans[0]) == 64 + d[3] % 64
    assert chans[0][0] == d[7 % 16] * 257 - 32768


def test_bmp_sequence_walks_real_boundaries():
    payload = mm.synth_bmp_sequence(b"vid")
    frames = mm.sample_bmp_frames(payload, every=1)
    import hashlib

    d = hashlib.md5(b"vid").digest()
    assert frames[0]["n_frames"] == 4 + d[2] % 5
    assert [f["frame_idx"] for f in frames] == list(range(frames[0]["n_frames"]))
    # each decoded frame matches an independent single-frame decode
    for f in frames:
        single = mm.decode_bmp(mm.synth_bmp(b"vid:" + str(f["frame_idx"]).encode()))
        assert (f["width"], f["height"]) == (single["width"], single["height"])
        assert f["channel_means"] == single["channel_means"]


def test_bmp_sequence_sampling_stride():
    payload = mm.synth_bmp_sequence(b"vid2")
    all_frames = mm.sample_bmp_frames(payload, every=1)
    sampled = mm.sample_bmp_frames(payload, every=2)
    assert [f["frame_idx"] for f in sampled] == [
        f["frame_idx"] for f in all_frames if f["frame_idx"] % 2 == 0
    ]


def test_bmp_sequence_rejects_corrupt_boundary():
    payload = bytearray(mm.synth_bmp_sequence(b"vid3"))
    payload[0:2] = b"XX"
    with pytest.raises(ValueError, match="frame boundary"):
        mm.sample_bmp_frames(bytes(payload))


def test_g711_codeword_idempotence():
    """encode(decode(code)) == code for every 8-bit codeword, both laws
    — the defining property of a correct companding table pair."""
    from hbase_tohdfs_spark.formats import wav

    for code in range(256):
        got = wav.linear_to_ulaw(wav.ulaw_to_linear(code))
        # mu-law has two zero codewords (+0=0xFF, -0=0x7F); re-encoding
        # linear 0 canonicalizes to 0xFF — the one permitted alias
        assert got == code or (code == 0x7F and got == 0xFF)
        assert wav.linear_to_alaw(wav.alaw_to_linear(code)) == code


def test_g711_quantization_error_bounds():
    """decode(encode(x)) stays within the segment's quantization step:
    relative error shrinks for large amplitudes (logarithmic law)."""
    from hbase_tohdfs_spark.formats import wav

    for x in range(-32000, 32001, 257):
        for enc, dec in (
            (wav.linear_to_ulaw, wav.ulaw_to_linear),
            (wav.linear_to_alaw, wav.alaw_to_linear),
        ):
            y = dec(enc(x))
            err = abs(y - x)
            assert err <= max(64, abs(x) / 16), (x, y)


def test_g711_wav_roundtrip_both_laws():
    from hbase_tohdfs_spark.formats import wav

    import math

    tone = [int(8000 * math.sin(i / 7)) for i in range(200)]
    noise = [((i * 2654435761) % 65536) - 32768 for i in range(200)]
    for law in ("ulaw", "alaw"):
        blob = wav.write_wav_g711(8000, [tone, noise], law=law)
        rate, n_ch, chans = wav.read_wav_any(blob)
        assert (rate, n_ch) == (8000, 2)
        for got, want in zip(chans, (tone, noise)):
            for g, w in zip(got, want):
                assert abs(g - w) <= max(64, abs(w) / 16)


def test_read_wav_any_dispatches_pcm16():
    from hbase_tohdfs_spark.formats import wav

    blob = wav.write_wav16(16000, [[1, -1, 300, -300]])
    assert wav.read_wav_any(blob) == (16000, 1, [[1, -1, 300, -300]])
    import pytest

    bad = bytearray(wav.write_wav_g711(8000, [[0]], law="ulaw"))
    i = bad.index(b"fmt ") + 8
    bad[i] = 2  # ADPCM tag: unsupported
    with pytest.raises(ValueError, match="unsupported WAV encoding"):
        wav.read_wav_any(bytes(bad))


def test_short_fmt_chunk_rejected():
    """A fmt chunk declaring fewer than 16 bytes must raise, not read
    the next chunk's header as format fields (review finding)."""
    import struct

    from hbase_tohdfs_spark.formats import wav

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)[:12]
    data = b"\x00\x00" * 4
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 12) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    for reader in (wav.read_wav16, wav.read_wav_any):
        import pytest

        with pytest.raises(ValueError, match="fmt chunk too short"):
            reader(blob)
