"""Multimodal columns: opaque binary payloads + typed metadata, with
Pandas-UDF feature extraction plumbing.

Design for a 100 TB media pipeline: the payload is a ``binary`` column
(inline for small blobs; at real scale a (uri, offset, length) pointer
into object storage with the same downstream schema), metadata is a
typed struct, and every decode/transform runs as an Arrow-batched
``mapInPandas`` so Python cost is amortized per batch, not per row.

The image/audio decode steps themselves are STUBBED — the decode
libraries (Pillow, torchaudio, ffmpeg) are not in this container.  The
stubs are deterministic fakes clearly marked as such; the Spark-side
plumbing (schemas, batch iteration, partitioning) is real and tested,
and swapping a stub for a real decoder changes one inner function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def attach_blob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque media payload + typed metadata —
    the canonical multimodal row shape."""
    return docs.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("blob"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col).cast("binary")).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Features are deterministic pure-Python (hashlib) so the DuckDB oracle
    can verify the full plumbing; a real pipeline would compute pixels /
    spectrograms here with identical structure.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs_col = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs_col.map(len).astype("int64"),
                    "content_md5": blobs_col.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "head_hex": blobs_col.map(lambda b: bytes(b)[:8].hex()),
                }
            )

    return blobs.mapInPandas(featurize, FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channel_means", T.ArrayType(T.DoubleType())),
    ]
)


def _round_half_away(x: float, digits: int = 6) -> float:
    """SQL-style round (half away from zero).  Python's ``round`` is
    banker's (half to even) and its last digit can disagree with the
    DuckDB/Spark ``round`` on boundary values."""
    import math

    scale = 10.0**digits
    return math.floor(x * scale + 0.5) / scale if x >= 0 else -math.floor(
        -x * scale + 0.5
    ) / scale


def decode_image_stub(payload: bytes) -> dict:
    """STUB image decode — deterministic fake (no Pillow/libjpeg here).

    Derives a fake (width, height, channel_means) from the content hash
    so tests exercise real schemas and batch shapes.  Replace the body
    with ``PIL.Image.open(io.BytesIO(payload))`` in a real deployment.
    """
    h = hashlib.md5(payload).digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "channel_means": [_round_half_away(h[i] / 255.0, 6) for i in (2, 3, 4)],
    }


def resize_stub(payload: bytes, target_w: int = 32, target_h: int = 32) -> dict:
    """STUB image resize — scales the fake decode's channel means by the
    pixel-count ratio (deterministic, oracle-replayable).  A real
    deployment resamples pixels here (``PIL.Image.resize``); the
    signature, batching, and schema are what the pipeline tests."""
    img = decode_image_stub(payload)
    ratio = (target_w * target_h) / (img["width"] * img["height"])
    return {
        "src_width": img["width"],
        "src_height": img["height"],
        "width": target_w,
        "height": target_h,
        "channel_means": [
            _round_half_away(min(m * ratio, 1.0), 6) for m in img["channel_means"]
        ],
    }


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channel_means", T.ArrayType(T.DoubleType())),
    ]
)


def resize_images(blobs: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """Arrow-batched resize over binary payloads (stubbed resampling)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [resize_stub(bytes(b), target_w, target_h) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_width": [f["src_width"] for f in feats],
                    "src_height": [f["src_height"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "channel_means": [f["channel_means"] for f in feats],
                }
            )

    return blobs.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(blobs: DataFrame, every: int = 4) -> DataFrame:
    """STUB video frame sampling: the fake container has
    ``8 + md5(payload)[5] % 8`` frames; every ``every``-th frame is
    "decoded" to a per-frame content hash ``md5(payload || ':' || idx)``.
    One output row per sampled frame — the row-exploding batch shape a
    real ffmpeg-based sampler produces."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "frame_idx": [], "frame_md5": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                payload = bytes(b)
                n = 8 + hashlib.md5(payload).digest()[5] % 8
                for idx in range(0, n, every):
                    out["doc_id"].append(doc_id)
                    out["n_frames"].append(n)
                    out["frame_idx"].append(idx)
                    out["frame_md5"].append(
                        hashlib.md5(payload + b":" + str(idx).encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return blobs.mapInPandas(run, FRAME_SCHEMA)


def decode_audio_stub(payload: bytes) -> dict:
    """STUB audio decode — raises, documenting the missing dependency."""
    raise NotImplementedError(
        "audio decode requires torchaudio/ffmpeg, unavailable in this "
        "container; the mapInPandas plumbing is extract_media_features()"
    )


def extract_media_features(
    blobs: DataFrame, decoder=decode_image_stub
) -> DataFrame:
    """Image-shaped feature extraction through the same Arrow plumbing;
    ``decoder`` is pluggable (stub by default, see decode_image_stub)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(b)) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "channel_means": [f["channel_means"] for f in feats],
                }
            )

    return blobs.mapInPandas(featurize, IMAGE_FEATURE_SCHEMA)
