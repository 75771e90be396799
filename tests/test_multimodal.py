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
