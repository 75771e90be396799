"""Multimodal plumbing tests: real schema/batch shape, stubbed decode."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cassandra_cql_streaming_db_migrator_spark.operators.multimodal import (
    attach_media_payload,
    attach_payload,
    decode_media,
    extract_features,
    extract_media_features,
    fake_decoder,
    make_pgm,
    make_wav,
    pgm_resize,
)
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table


def test_decode_media_parses_real_pgm():
    pixels = bytes(range(12))
    out = decode_media(make_pgm(pixels, 4, 3))
    assert out["media_kind"] == "pgm" and (out["width"], out["height"]) == (4, 3)
    assert out["n_units"] == 12 and out["unit_sum"] == sum(pixels)
    assert out["unit_min"] == 0 and out["unit_max"] == 11
    assert out["unit_mean"] == sum(pixels) / 12 and out["feature_ok"]
    # comments in the header are legal PGM
    commented = b"P5\n# made by a camera\n4 3\n255\n" + pixels
    assert decode_media(commented)["unit_sum"] == sum(pixels)


def test_decode_media_parses_real_wav():
    samples = bytes([10, 250, 0, 128])
    out = decode_media(make_wav(samples, sample_rate=8000))
    assert out["media_kind"] == "wav" and out["sample_rate"] == 8000
    assert out["n_units"] == 4 and out["unit_sum"] == 388
    assert (out["unit_min"], out["unit_max"]) == (0, 250) and out["feature_ok"]


def test_decode_media_quarantines_corrupt_payloads():
    # unknown magic, truncated PGM, truncated WAV data chunk: all must come
    # back feature_ok=False, never raise (quarantine path at scale)
    for bad in (
        b"\x89PNG....",
        b"",
        b"P5\n4 3\n255\n" + bytes(5),        # promises 12 pixels, has 5
        make_wav(bytes(8))[:-4],               # data chunk cut short
        b"P5\n4 3\n99999\n" + bytes(12),      # maxval out of 8-bit range
    ):
        assert decode_media(bad)["feature_ok"] is False


def test_pgm_resize_nearest_neighbor_exact():
    # 4x2 gradient -> 2x1: nearest-neighbor keeps src pixels (0*2,0*2)=(0,0)
    # and (1*4//2, 0)=(2,0)
    src = make_pgm(bytes([0, 10, 20, 30, 40, 50, 60, 70]), 4, 2)
    out = decode_media(pgm_resize(src, 2, 1))
    assert (out["width"], out["height"]) == (2, 1)
    assert out["unit_sum"] == 0 + 20
    with pytest.raises(ValueError):
        pgm_resize(b"not a pgm", 2, 2)


def test_payload_and_metadata_shape(spark, sf_dir):
    docs = attach_payload(load_table(spark, sf_dir, "documents").limit(10))
    row = docs.select("payload", "media_meta").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.media_meta.n_bytes == len(row.payload)


def test_feature_extraction_with_injected_decoder(spark, sf_dir):
    docs = attach_payload(load_table(spark, sf_dir, "documents").limit(25))
    feats = extract_features(docs, decoder=fake_decoder).collect()
    assert len(feats) == 25
    raw = {r.doc_id: bytes(r.payload) for r in docs.select("doc_id", "payload").collect()}
    for r in feats:
        expect = fake_decoder(raw[r.doc_id])
        assert (r.n_bytes, r.first_byte, r.byte_sum, r.feature_ok) == (
            expect["n_bytes"],
            expect["first_byte"],
            expect["byte_sum"],
            True,
        )


def test_resize_stage_schema_and_determinism(spark, sf_dir):
    from cassandra_cql_streaming_db_migrator_spark.operators.multimodal import (
        attach_payload,
        fake_resizer,
        resize_payloads,
    )

    docs = attach_payload(load_table(spark, sf_dir, "documents")).limit(20)
    out = resize_payloads(docs, 8, 4, resizer=fake_resizer)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r["payload"]) == 32 for r in rows)
    assert all((r["width"], r["height"]) == (8, 4) for r in rows)
    # per-row pure => rerunning yields identical bytes
    again = {r["doc_id"]: r["payload"] for r in resize_payloads(docs, 8, 4, resizer=fake_resizer).collect()}
    assert all(again[r["doc_id"]] == r["payload"] for r in rows)


def test_frame_sampling_explodes_rows_partition_locally(spark, sf_dir):
    from cassandra_cql_streaming_db_migrator_spark.operators.multimodal import (
        attach_payload,
        fake_frame_sampler,
        sample_frames,
    )

    docs = attach_payload(load_table(spark, sf_dir, "documents")).limit(5)
    out = sample_frames(docs, every_n=4, sampler=fake_frame_sampler)
    rows = out.collect()
    # every source doc produced >= 1 frame; frame_idx dense from 0
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert len(by_doc) == 5
    for idxs in by_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))
    # 1 -> N blowup matches the sampler's contract on the raw bytes
    payloads = {r["doc_id"]: r["payload"] for r in docs.select("doc_id", "payload").collect()}
    for d, idxs in by_doc.items():
        assert len(idxs) == len(fake_frame_sampler(payloads[d], 4))


def test_media_pipeline_end_to_end_real_decoder(spark, sf_dir):
    docs = attach_media_payload(load_table(spark, sf_dir, "documents").limit(20))
    feats = extract_media_features(docs).collect()
    assert len(feats) == 20
    for r in feats:
        assert r.feature_ok, r
        if r.doc_id % 2 == 0:
            assert r.media_kind == "pgm" and (r.width, r.height) == (16, 16)
            assert r.sample_rate is None
        else:
            assert r.media_kind == "wav" and r.sample_rate == 8000
            assert r.width is None and r.height is None
        assert r.n_units == 256 and r.unit_mean == r.unit_sum / 256


def test_extract_features_honors_custom_id_col(spark):
    # regression: output schema/columns previously hardcoded 'doc_id'
    df = spark.createDataFrame(
        [("k1", b"ab"), ("k2", b"xyz")], "item_key string, payload binary"
    )
    rows = {
        r.item_key: r.n_bytes
        for r in extract_features(df, decoder=fake_decoder, id_col="item_key").collect()
    }
    assert rows == {"k1": 2, "k2": 3}
    media = extract_media_features(
        df.withColumn("payload", F.lit(make_pgm(bytes(4), 2, 2))),
        id_col="item_key",
    ).collect()
    assert {r.item_key for r in media} == {"k1", "k2"}
    assert all(r.media_kind == "pgm" for r in media)
