"""Multimodal plumbing tests: real schema/batch shape, stubbed decode."""

from __future__ import annotations

import pytest

from cassandra_cql_streaming_db_migrator_spark.operators.multimodal import (
    attach_payload,
    decode_stub,
    extract_features,
    fake_decoder,
)
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table


def test_decode_stub_is_explicitly_unimplemented():
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG")


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


def test_decode_stub_refuses_loudly():
    import pytest

    from cassandra_cql_streaming_db_migrator_spark.operators.multimodal import decode_stub

    with pytest.raises(NotImplementedError, match="image/audio libraries"):
        decode_stub(b"xx")
