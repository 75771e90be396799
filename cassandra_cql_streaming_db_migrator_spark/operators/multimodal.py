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


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize (PIL.Image.resize):
    truncates/tiles the byte stream to width*height bytes.  Same signature
    and contract (binary in -> binary out) as the real thing."""
    target = max(width * height, 1)
    if not payload:
        return bytes(target)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def resize_payloads(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Binary -> binary media transform (the resize stage): narrow
    mapInPandas, output schema = (id, payload, width, height).  The real
    decoder/encoder slots into ``resizer``; this environment injects the
    deterministic fake (decode_stub explains why)."""
    rs = resizer or (lambda p, w, h: decode_stub(p))  # force explicit choice

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    payload_col: [rs(p, width, height) for p in pdf[payload_col]],
                }
            )
            out["width"] = width
            out["height"] = height
            yield out

    from pyspark.sql.types import BinaryType, IntegerType, StructField, StructType

    schema = StructType(
        [
            df.schema[id_col],
            StructField(payload_col, BinaryType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def fake_frame_sampler(payload: bytes, every_n: int) -> list[bytes]:
    """Deterministic stand-in for video frame sampling (pyav keyframe
    iteration): chunks the byte stream into 16-byte 'frames' and keeps
    every n-th."""
    frames = [payload[i : i + 16] for i in range(0, len(payload), 16)]
    return frames[::every_n] if frames else []


def sample_frames(
    df: DataFrame,
    every_n: int = 4,
    sampler: Callable[[bytes, int], list[bytes]] | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """1-row-in -> N-frame-rows-out media transform (the frame-sample
    stage): a Python-side generator inside mapInPandas — each video row
    explodes into (id, frame_idx, frame) rows.  Row-multiplying transforms
    must happen HERE, not driver-side: the output cardinality is data-
    dependent and the explode stays partition-local (no shuffle)."""
    fs = sampler or (lambda p, n: decode_stub(p))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            frames: list = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                for j, fr in enumerate(fs(p, every_n)):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    from pyspark.sql.types import BinaryType, IntegerType, StructField, StructType

    schema = StructType(
        [
            df.schema[id_col],
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


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
