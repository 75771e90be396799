"""Multimodal columns (SURVEY §7.2.6): image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing is real — binary payload column, typed metadata
struct, Arrow-batched ``mapInPandas`` feature extraction with an explicit
output schema and bounded batch sizes.  The *decode* step is real too for
the container-friendly formats: ``decode_media`` parses binary PGM (P5)
images and RIFF/WAVE 8-bit PCM audio with pure-Python header parsing and
pixel/sample statistics, and ``pgm_resize`` is a real nearest-neighbor
image resample.  Compressed codecs (JPEG/MP3/H.264) would slot into the
same ``decoder``/``resizer`` callables via PIL/ffmpeg where available;
``fake_decoder``/``fake_resizer`` remain as deterministic test doubles.

Scale notes: payloads ride the DataFrame as binary; feature extraction is a
narrow map (no shuffle), so it scales with executors.  Keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` small when payloads are
megabytes (memory per Arrow batch = rows x payload size).
"""

from __future__ import annotations

import struct

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA_FIELDS = (
    "n_bytes long, first_byte int, byte_sum long, feature_ok boolean"
)

MEDIA_FEATURE_FIELDS = (
    "media_kind string, width int, height int, sample_rate int, "
    "n_units long, unit_min int, unit_max int, unit_sum long, "
    "unit_mean double, feature_ok boolean"
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


def attach_media_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_units: int = 256,
) -> DataFrame:
    """Deterministic REAL-format media ingest over the fixtures: each doc's
    utf-8 text bytes, tiled to ``n_units``, become the pixel/sample data of
    a real file — even ids a 16x16 binary PGM, odd ids an 8 kHz 8-bit WAV.
    The payload is a fully valid file ``decode_media`` (or any external
    tool) can parse; construction happens in a narrow Arrow map, exactly
    where a real object-store fetch would sit."""
    side = max(1, int(n_units ** 0.5))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raw = (t or "").encode("utf-8")
                if raw:
                    reps = (n_units // len(raw)) + 1
                    units = (raw * reps)[:n_units]
                else:
                    units = b""
                if int(i) % 2 == 0:
                    w = side if units else 0
                    h = (len(units) // w) if w else 0
                    payloads.append(make_pgm(units[: w * h], w, h))
                else:
                    payloads.append(make_wav(units))
            yield pd.DataFrame({id_col: pdf[id_col].values, "payload": payloads})

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(
        [df.schema[id_col], StructField("payload", BinaryType(), True)]
    )
    payloads = df.select(id_col, text_col).mapInPandas(build, schema=schema)
    return payloads.withColumn(
        "media_meta",
        F.struct(
            F.when(F.col(id_col) % 2 == 0, F.lit("image/x-portable-graymap"))
            .otherwise(F.lit("audio/wav"))
            .alias("content_type"),
            F.octet_length(F.col("payload")).alias("n_bytes"),
        ),
    )


# --- real media formats (pure Python, no codec libraries needed) ----------


def make_pgm(pixels: bytes, width: int, height: int) -> bytes:
    """Binary PGM (P5): ASCII header + raw 8-bit grayscale pixels."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    return b"P5\n%d %d\n255\n" % (width, height) + pixels


def make_wav(samples: bytes, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE, mono 8-bit unsigned PCM."""
    n = len(samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate, 1, 8)
        + b"data"
        + struct.pack("<I", n)
        + samples
    )


def _pgm_parse(payload: bytes) -> tuple[int, int, int, bytes] | None:
    """Parse a binary PGM header: magic P5, then three whitespace-separated
    ints (width height maxval, '#' comments allowed), one whitespace byte,
    then width*height raw pixels.  None on any malformation."""
    if payload[:2] != b"P5":
        return None
    pos, vals = 2, []
    while len(vals) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(payload) and payload[pos : pos + 1].isdigit():
                pos += 1
            vals.append(int(payload[start:pos]))
        else:
            return None
    if len(vals) < 3 or pos >= len(payload) or not payload[pos : pos + 1].isspace():
        return None
    w, h, maxval = vals
    if w < 0 or h < 0 or not 0 < maxval < 256:
        return None
    data = payload[pos + 1 : pos + 1 + w * h]
    if len(data) < w * h:
        return None
    return w, h, maxval, data


def _wav_parse(payload: bytes) -> tuple[int, int, int, bytes] | None:
    """Walk RIFF chunks for fmt + data; accept mono/stereo 8-bit PCM.
    Returns (channels, sample_rate, bits, data) or None."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even length
    if fmt is None or data is None:
        return None
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 8:  # uncompressed 8-bit PCM only
        return None
    return channels, sample_rate, bits, data


def _unit_stats(units: bytes) -> dict:
    n = len(units)
    if n == 0:
        return {
            "n_units": 0, "unit_min": None, "unit_max": None,
            "unit_sum": None, "unit_mean": None,
        }
    s = int(sum(units))
    return {
        "n_units": n, "unit_min": min(units), "unit_max": max(units),
        "unit_sum": s, "unit_mean": s / n,
    }


def decode_media(payload: bytes) -> dict:
    """Real media decode for the formats this container can handle without
    codec libraries: binary PGM images (pixel stats + dimensions) and
    RIFF/WAVE 8-bit PCM audio (sample stats + rate).  Unknown or corrupt
    payloads come back feature_ok=False instead of raising — at 100 TB a
    bad object must quarantine, not kill the stage."""
    payload = bytes(payload or b"")
    base = {
        "media_kind": "unknown", "width": None, "height": None,
        "sample_rate": None, "feature_ok": False, **_unit_stats(b""),
    }
    pgm = _pgm_parse(payload)
    if pgm is not None:
        w, h, _, data = pgm
        return {**base, "media_kind": "pgm", "width": w, "height": h,
                "feature_ok": True, **_unit_stats(data)}
    wav = _wav_parse(payload)
    if wav is not None:
        _, rate, _, data = wav
        return {**base, "media_kind": "wav", "sample_rate": rate,
                "feature_ok": True, **_unit_stats(data)}
    return base


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


def pgm_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize for binary PGM: nearest-neighbor resample to
    (width, height), re-emitted as PGM.  src pixel for dst (x,y) is
    (x*src_w//width, y*src_h//height) — pure integer arithmetic, so the
    result is deterministic everywhere.  Non-PGM payloads raise (route
    other formats to their own resizer)."""
    if width <= 0 or height <= 0:
        raise ValueError("pgm_resize: target dimensions must be positive")
    parsed = _pgm_parse(bytes(payload or b""))
    if parsed is None:
        raise ValueError("pgm_resize: payload is not a parseable binary PGM")
    src_w, src_h, _, data = parsed
    if src_w == 0 or src_h == 0:  # degenerate source -> black target
        return make_pgm(bytes(width * height), width, height)
    out = bytearray(width * height)
    for y in range(height):
        row = (y * src_h // height) * src_w
        for x in range(width):
            out[y * width + x] = data[row + (x * src_w // width)]
    return make_pgm(bytes(out), width, height)


def resize_payloads(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Binary -> binary media transform (the resize stage): narrow
    mapInPandas, output schema = (id, payload, width, height).  Defaults to
    the real PGM nearest-neighbor resample; compressed formats inject their
    own ``resizer`` (PIL-class work)."""
    rs = resizer or pgm_resize

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
    dependent and the explode stays partition-local (no shuffle).  No
    simple uncompressed video container exists, so the default sampler is
    the deterministic byte-chunking fake; a pyav keyframe iterator slots
    into ``sampler`` unchanged."""
    fs = sampler or fake_frame_sampler

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


def audio_frame_stats(
    df: DataFrame,
    frame_len: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Audio frame sampling with a REAL decoder: parse each WAV payload
    (RIFF walk, 8-bit PCM), window its samples into fixed ``frame_len``
    frames, and emit per-frame integer statistics — the audio analog of
    video keyframe extraction, shaped as the 1-row-in -> N-rows-out media
    transform (cardinality is data-dependent, so the explode lives inside
    the Arrow kernel, partition-local, no shuffle).

    Non-WAV / corrupt payloads and trailing partial frames are dropped
    (quarantine-not-crash, same contract as decode_media).  Output:
    (id, frame_idx, n_samples, frame_min, frame_max, frame_sum) — all
    int64 stats, bit-reproducible in SQL from the same sample bytes.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            mins: list = []
            maxs: list = []
            sums: list = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                wav = _wav_parse(bytes(p or b""))
                if wav is None:
                    continue
                data = wav[3]
                n_frames = len(data) // frame_len
                if n_frames == 0:
                    continue
                mat = np.frombuffer(
                    data[: n_frames * frame_len], dtype=np.uint8
                ).reshape(n_frames, frame_len).astype(np.int64)
                ids.extend([i] * n_frames)
                idxs.extend(range(n_frames))
                mins.extend(mat.min(axis=1).tolist())
                maxs.extend(mat.max(axis=1).tolist())
                sums.extend(mat.sum(axis=1).tolist())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(
                        [frame_len] * len(ids), dtype="int64"
                    ),
                    "frame_min": pd.Series(mins, dtype="int64"),
                    "frame_max": pd.Series(maxs, dtype="int64"),
                    "frame_sum": pd.Series(sums, dtype="int64"),
                }
            )

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    schema = StructType(
        [
            df.schema[id_col],
            StructField("frame_idx", IntegerType(), False),
            StructField("n_samples", LongType(), False),
            StructField("frame_min", LongType(), True),
            StructField("frame_max", LongType(), True),
            StructField("frame_sum", LongType(), True),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def _feature_mapper(
    df: DataFrame,
    decoder: Callable[[bytes], dict],
    id_col: str,
    payload_col: str,
    field_ddl: str,
) -> DataFrame:
    """Shared Arrow-batched decode stage: id column (name AND type taken
    from the input schema — nothing hardcoded) + the decoder's feature
    dict, with an explicit output schema."""
    from pyspark.sql.types import StructType

    feat_struct = StructType.fromDDL(field_ddl)
    schema = StructType([df.schema[id_col], *feat_struct.fields])
    cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame([decoder(p) for p in pdf[payload_col]])
            out.insert(0, id_col, pdf[id_col].values)
            yield out[cols]

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict] = fake_decoder,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched byte-level feature extraction (n_bytes/first_byte/
    byte_sum shape).  ``mapInPandas`` so the decoder sees contiguous
    batches, with an explicit output schema."""
    return _feature_mapper(df, decoder, id_col, payload_col, FEATURE_SCHEMA_FIELDS)


def extract_media_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict] = decode_media,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Real media feature extraction: parse each binary payload with
    ``decode_media`` (PGM/WAV headers + pixel/sample statistics) into typed
    feature columns — the image-embedding/audio-feature stage shape with an
    actual decoder in the slot."""
    return _feature_mapper(df, decoder, id_col, payload_col, MEDIA_FEATURE_FIELDS)


# ---------------------------------------------------------------------------
# Perceptual image hashing (average hash) + Hamming near-dup pairs.


def avg_hash_64(payload: bytes) -> tuple[int, int] | None:
    """64-bit average hash of a square PGM whose side is a multiple of 8:
    2x2-ish block downsample to 8x8, threshold each block against the
    global mean, pack row-major bits.  Returned as two non-negative int32
    halves (hi = bits 32..63, lo = bits 0..31) so no value ever touches the
    int64 sign bit — keeps XOR/bit_count portable across engines.

    All arithmetic is integer (block mean > global mean <=> 64*blocksum >
    totalsum for 16x16), so the hash is bit-identical everywhere."""
    import numpy as np

    parsed = _pgm_parse(payload)
    if parsed is None:
        return None
    w, h, _maxval, pixels = parsed
    if w != h or w == 0 or w % 8 != 0 or len(pixels) != w * h:
        return None
    s = w // 8
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w).astype(np.int64)
    blocks = px.reshape(8, s, 8, s).sum(axis=(1, 3))
    total = int(px.sum())
    bits = (64 * blocks > total).astype(np.int64).ravel()
    lo = int(sum(int(b) << i for i, b in enumerate(bits[:32])))
    hi = int(sum(int(b) << i for i, b in enumerate(bits[32:])))
    return hi, lo


def image_avg_hashes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-image average hash: (id, hash_hi, hash_lo) for every payload
    that parses as a square PGM; non-image / malformed payloads drop out.
    A narrow Arrow kernel — no shuffle."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            df.schema[id_col],
            StructField("hash_hi", LongType(), True),
            StructField("hash_lo", LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                hl = avg_hash_64(bytes(p)) if p is not None else None
                if hl is None:
                    continue
                ids.append(i)
                his.append(hl[0])
                los.append(hl[1])
            yield pd.DataFrame(
                {id_col: ids, "hash_hi": his, "hash_lo": los}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def hamming_near_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    max_dist: int = 3,
) -> DataFrame:
    """Image near-duplicate pairs at Hamming distance <= ``max_dist`` over
    (hash_hi, hash_lo) fingerprints, via banded Hamming LSH: the 64 bits
    split into four 16-bit bands; by pigeonhole, any pair within distance
    3 shares at least one exact band, so a plain hash equi-join on
    (band_idx, band_value) finds every qualifying pair — never the
    quadratic all-pairs — and the exact XOR popcount verify rejects the
    band collisions.  (General rule: b bands guarantee distance <= b-1;
    raise the band count to widen the radius.)

    Scale shape: 4 rows per image shuffle once on the band key; candidate
    volume is bounded by band-bucket collisions.  Returns
    (id_a, id_b, dist), canonical id_a < id_b.
    """
    if max_dist > 3:
        raise ValueError(
            "4 bands guarantee completeness only up to distance 3; "
            f"got max_dist={max_dist}"
        )
    bands = hashes.select(
        F.col(id_col),
        "hash_hi",
        "hash_lo",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    (F.col("hash_lo") % 65536).alias("val"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    (F.col("hash_lo") / 65536).cast("long").alias("val"),
                ),
                F.struct(
                    F.lit(2).alias("band"),
                    (F.col("hash_hi") % 65536).alias("val"),
                ),
                F.struct(
                    F.lit(3).alias("band"),
                    (F.col("hash_hi") / 65536).cast("long").alias("val"),
                ),
            )
        ).alias("bv"),
    ).select(id_col, "hash_hi", "hash_lo", "bv.band", "bv.val")
    a = bands.select(
        F.col(id_col).alias("id_a"),
        F.col("hash_hi").alias("a_hi"),
        F.col("hash_lo").alias("a_lo"),
        "band",
        "val",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"),
        F.col("hash_hi").alias("b_hi"),
        F.col("hash_lo").alias("b_lo"),
        "band",
        "val",
    )
    cand = (
        a.join(b, on=["band", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "a_hi", "a_lo", "b_hi", "b_lo")
        .distinct()
    )
    dist = (
        F.bit_count(F.expr("a_hi ^ b_hi")) + F.bit_count(F.expr("a_lo ^ b_lo"))
    ).cast("int")
    return cand.select(
        "id_a", "id_b", dist.alias("dist")
    ).where(F.col("dist") <= max_dist)


def image_tile_stats(
    df: DataFrame,
    tile: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Patchify (the ViT/vision-training tiling stage): each decoded image
    splits into a (h/tile x w/tile) grid of tile x tile patches; one
    output row per patch with integer sum/min/max — the per-patch
    statistics a vision-data pipeline computes before embedding or
    filtering patches.

    1-row-in -> N-patch-rows-out happens INSIDE the Arrow kernel (the
    multiplying transform stays partition-local, same contract as
    sample_frames); undecodable payloads and images not divisible by the
    tile size contribute no rows.  Pure integer outputs, so the oracle
    hash-checks the real decoder bit-for-bit.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            tys: list = []
            txs: list = []
            sums: list = []
            mins: list = []
            maxs: list = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                parsed = _pgm_parse(p)
                if parsed is None:
                    continue
                w, h, _maxval, pixels = parsed
                if w % tile or h % tile or len(pixels) != w * h:
                    continue
                import numpy as np

                arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w)
                for ty in range(h // tile):
                    for tx in range(w // tile):
                        patch = arr[
                            ty * tile : (ty + 1) * tile,
                            tx * tile : (tx + 1) * tile,
                        ]
                        ids.append(i)
                        tys.append(ty)
                        txs.append(tx)
                        sums.append(int(patch.sum()))
                        mins.append(int(patch.min()))
                        maxs.append(int(patch.max()))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "tile_y": tys,
                    "tile_x": txs,
                    "tile_sum": sums,
                    "tile_min": mins,
                    "tile_max": maxs,
                }
            )

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    schema = StructType(
        [
            df.schema[id_col],
            StructField("tile_y", IntegerType(), False),
            StructField("tile_x", IntegerType(), False),
            StructField("tile_sum", LongType(), False),
            StructField("tile_min", IntegerType(), False),
            StructField("tile_max", IntegerType(), False),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_bits: int = 53,
) -> DataFrame:
    """53-bit audio fingerprint from a REAL WAV decode (the audio member
    of the fingerprint family: text SimHash / image average-hash / THIS):
    RIFF-parse the payload, then bit k compares the sample at position
    k*n//53 against the clip's mean — in the overflow-safe integer form
    ``n * sample > total`` — so a re-encoded or re-tiled copy of the same
    audio content lands at small Hamming distance.  Non-negative 53-bit
    longs (the SimHash banding contract), so the SAME banded Hamming
    machinery (operators.dedup.simhash_near_pairs) serves all three
    modalities.  Non-WAV / corrupt / empty payloads drop out
    (quarantine-not-crash).  One narrow Arrow kernel, no shuffle."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [df.schema[id_col], StructField("audio_hash", LongType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                wav = _wav_parse(bytes(p or b""))
                if wav is None:
                    continue
                data = np.frombuffer(wav[3], dtype=np.uint8).astype(np.int64)
                n = len(data)
                if n == 0:
                    continue
                total = int(data.sum())
                h = 0
                for k in range(n_bits):
                    if n * int(data[k * n // n_bits]) > total:
                        h |= 1 << k
                ids.append(i)
                hashes.append(h)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "audio_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)
