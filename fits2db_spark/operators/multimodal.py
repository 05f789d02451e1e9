"""Multimodal columns (SURVEY.md §2.N): opaque binary payloads + typed
metadata, with decode / feature-extraction as Arrow-batched Python.

No image/audio libraries exist in this container (TESTDATA has no media
fixtures either), so the DECODE step is a clearly-marked deterministic fake
behind the same plumbing a real decoder would use: binary column in, fixed
metadata schema out, `mapInPandas` batch iteration, per-partition
parallelism. Swapping the fake for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

#: set True only in environments that ship a real decoder (PIL etc.)
REAL_DECODERS_AVAILABLE = False


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """Decode an image payload -> (width, height, channels).

    STUB: real decoding needs an image library not present in this
    container. The deterministic fake derives pseudo-dimensions from the
    payload bytes so the distributed plumbing (schema, batching,
    partitioning) is fully exercised and testable.
    """
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("plug PIL/turbojpeg decode here")
    w = 64 + (payload[0] if payload else 0) % 192 if payload else 64
    h = 64 + (payload[-1] if payload else 0) % 192 if payload else 64
    return int(w), int(h), 3


@register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_hash,
           CASE WHEN octet_length(encode(text)) > 300 THEN 'large' ELSE 'small' END
             AS size_class
    FROM documents WHERE doc_id < 300
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata: payload size, content hash, size class —
    computed on a real BinaryType column (text encoded to bytes), all
    JVM-side."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5("text").alias("content_hash"),
        F.when(F.length(payload) > 300, "large").otherwise("small").alias("size_class"),
    )


@register("mm_decode_features")  # rows-only: decode stub is engine-local
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary -> decoded metadata via mapInPandas: the real multimodal
    pipeline shape (Arrow batches of binary payloads into Python, fixed
    metadata schema out). Decode itself is the documented stub above."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    src = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(decode_image)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": meta.map(lambda m: m[0]),
                    "height": meta.map(lambda m: m[1]),
                    "channels": meta.map(lambda m: m[2]),
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return src.mapInPandas(
        decode_batches,
        schema="doc_id long, width int, height int, channels int, n_bytes long",
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, n_frames,
           array_to_string(
             list_transform(generate_series(0, CAST((n_frames - 1) // 10 AS INTEGER)),
                            i -> i * 10), ',') AS sampled_frames
    FROM (SELECT doc_id, CAST(n_chars % 120 + 1 AS INTEGER) AS n_frames
          FROM documents WHERE doc_id < 200)
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan for video-like payloads: every 10th frame index
    from a per-item frame count (derived deterministically here; supplied by
    the probe step in a real pipeline). Pure expression — the sampling plan
    is computed without touching payload bytes, so scheduling/pruning can
    happen before any expensive decode."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    n_frames = (F.col("n_chars") % 120 + 1).cast("int")
    base = d.select("doc_id", n_frames.alias("n_frames"))
    # ','-joined scalar rendering (driver canonicalizer cannot hash arrays);
    # positional order makes the join deterministic.
    return base.select(
        "doc_id",
        "n_frames",
        F.concat_ws(
            ",",
            F.transform(
                F.sequence(F.lit(0), ((F.col("n_frames") - 1) / 10).cast("int")),
                lambda i: (i * 10).cast("string"),
            ),
        ).alias("sampled_frames"),
    )
