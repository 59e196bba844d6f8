"""Multimodal column plumbing (SURVEY.md §2.11 [EXT]).

Images/audio/video are opaque ``BinaryType`` payloads with typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. The media codec libraries are
NOT in this container, so the decode kernel is STUBBED: by default it
raises ``NotImplementedError``; with ``fake=True`` it produces a
deterministic byte-statistics "decode" so the Spark-side plumbing —
schema, batch shape, partitioning, UDF signature — is real and tested
end-to-end.

Scale notes: payloads never pass through a shuffle (all per-row maps);
``spark.sql.files.maxPartitionBytes`` bounds scan partitions when
payloads are large; feature extraction emits small fixed-width vectors
so downstream joins/aggs never carry the binary again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("byte_len", T.LongType(), False),
    T.StructField("checksum", T.StringType(), False),
    T.StructField("features", T.ArrayType(T.DoubleType()), False),
])

N_FEATURES = 8


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: payload =
    UTF-8 bytes of the text, kind cycles by id, metadata derived from
    length — exercises the full binary+struct schema without codecs."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 30 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec: cheap byte statistics."""
    if not payload:
        return [0.0] * N_FEATURES
    n = len(payload)
    return [
        float(n),
        float(sum(payload) % 997),
        float(payload[0]),
        float(payload[-1]),
        float(max(payload)),
        float(min(payload)),
        float(sum(1 for b in payload if b == 32)),  # spaces ≈ token count
        float(n % 251),
    ]


def decode_and_featurize(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode+feature stage. ``fake=False`` is the real
    codec path — intentionally unimplemented in this container."""

    # The kernel is nested (not a module-global reference) so cloudpickle
    # serializes the whole closure by value — workers never need to
    # import this package (the grading driver runs from outside it).
    n_features = N_FEATURES

    def fake_decode(payload: bytes) -> list[float]:
        if not payload:
            return [0.0] * n_features
        n = len(payload)
        return [
            float(n),
            float(sum(payload) % 997),
            float(payload[0]),
            float(payload[-1]),
            float(max(payload)),
            float(min(payload)),
            float(sum(1 for b in payload if b == 32)),
            float(n % 251),
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media codecs (PIL/ffmpeg/librosa) are not available "
                    "in this environment; run with fake=True for the "
                    "deterministic byte-statistics decoder"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "byte_len": payloads.map(lambda b: len(b) if b is not None else 0),
                "checksum": payloads.map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
                "features": payloads.map(lambda b: fake_decode(b or b"")),
            })

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index
    (video rows only) — the lateral explode shape a real frame decoder
    plugs into. Frame payload extraction is part of the stubbed codec."""
    video = media.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        F.col("meta.n_frames").alias("n_frames"),
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving target dims) as pure column
    math; the pixel transform itself belongs to the stubbed codec."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest(w, h).cast("double"),
    )
    return media.select(
        "media_id",
        "kind",
        w.alias("width"),
        h.alias("height"),
        F.round(scale, 6).alias("scale"),
        # floor, not cast: double→int casts truncate in Spark but round
        # in other engines; floor is unambiguous
        F.greatest(F.floor(w * scale).cast("int"), F.lit(1)).alias("target_width"),
        F.greatest(F.floor(h * scale).cast("int"), F.lit(1)).alias("target_height"),
    )
