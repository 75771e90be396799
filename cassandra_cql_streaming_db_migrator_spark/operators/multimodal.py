"""Multimodal columns (SURVEY §7.2.6): image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing is real — binary payload column, typed metadata
struct, Arrow-batched ``mapInPandas`` feature extraction with an explicit
output schema and bounded batch sizes.  The *decode* step (PIL/ffmpeg-class
work) is stubbed: those libraries are not in this container, so
``decode_stub`` raises NotImplementedError and tests/queries inject
``fake_decoder`` — a deterministic byte-level featurizer with the same
signature — keeping schema, partitioning, and batch shape under test.

Scale notes: payloads ride the DataFrame as binary; feature extraction is a
narrow map (no shuffle), so it scales with executors.  Keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small when payloads are
megabytes (memory per Arrow batch = rows x payload size).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, byte_sum long, feature_ok boolean"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in for real media bytes: the utf-8 encoding of
    the text column as an opaque ``binary`` payload, plus typed metadata —
    the same shape a real ingest (s3 object bytes + content-type/width/...)
    produces."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
        ),
    )


def decode_stub(payload: bytes) -> dict:
    """Placeholder for the real media decode (PIL.Image.open /
    soundfile.read / pyav frame sampling).  Decode libraries are not
    available in this environment."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; inject a decoder via extract_features(decoder=...)"
    )


def fake_decoder(payload: bytes) -> dict:
    """Deterministic byte-level 'decode' used by tests: same signature and
    output contract as a real decoder."""
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else -1,
        "byte_sum": int(sum(payload)),
        "feature_ok": True,
    }


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict] = decode_stub,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` so the decoder sees contiguous batches (vectorized
    pre/post-processing around the per-item decode), with an explicit
    output schema — the real shape of an image-embedding or frame-sampling
    stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].values)
            yield out[["doc_id", "n_bytes", "first_byte", "byte_sum", "feature_ok"]]

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)
