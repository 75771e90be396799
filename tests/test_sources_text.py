"""JSONL/CSV sources (sources/text.py): explicit-schema reads, row-error
policy parity with the engine's quarantine/fail modes."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table
from cassandra_cql_streaming_db_migrator_spark.sources.text import (
    read_csv,
    read_jsonl,
    schema_for_table,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha beta", "lang": "en"}\n'
        '{"doc_id": 2, "text": "gamma", "lang": "de"}\n'
        "{not json at all}\n"
    )
    return str(p)


class TestJsonl:
    def test_quarantine_splits_bad_rows(self, spark, jsonl_path):
        df = read_jsonl(spark, jsonl_path, SCHEMA)
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2
        assert bad.count() == 1
        assert {r["doc_id"] for r in good.collect()} == {1, 2}

    def test_failfast_raises(self, spark, jsonl_path):
        with pytest.raises(Exception):
            read_jsonl(spark, jsonl_path, SCHEMA, errors="fail").collect()

    def test_drop_malformed(self, spark, jsonl_path):
        df = read_jsonl(spark, jsonl_path, SCHEMA, errors="drop")
        assert df.count() == 2

    def test_roundtrip_matches_parquet_fixture(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, sf_dir, "documents")
        out = str(tmp_path / "docs_jsonl")
        docs.coalesce(1).write.json(out)
        schema = schema_for_table(spark, sf_dir, "documents")
        back = read_jsonl(spark, out, schema).drop("_corrupt_record")
        assert back.count() == docs.count()
        a = docs.agg(F.sum("doc_id"), F.sum(F.length("text"))).collect()[0]
        b = back.agg(F.sum("doc_id"), F.sum(F.length("text"))).collect()[0]
        assert tuple(a) == tuple(b)


class TestCsv:
    def test_csv_read_and_quarantine(self, spark, tmp_path):
        p = tmp_path / "docs.csv"
        p.write_text(
            "doc_id,text,lang\n"
            "1,alpha beta,en\n"
            "not_a_number,gamma,de\n"
        )
        df = read_csv(spark, str(p), SCHEMA)
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert good.count() == 1
        assert bad.count() == 1

    def test_unknown_error_mode_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError):
            read_csv(spark, str(tmp_path), SCHEMA, errors="ignore")


class TestBlankLines:
    def test_blank_lines_do_not_fabricate_rows(self, spark, tmp_path):
        p = tmp_path / "gaps.jsonl"
        p.write_text(
            '{"doc_id": 1, "text": "alpha", "lang": "en"}\n'
            "\n"
            "   \n"
            "null\n"
            '{"doc_id": 2, "text": "beta", "lang": "de"}\n'
        )
        df = read_jsonl(spark, str(p), SCHEMA)
        assert df.count() == 2
        assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 0
        dropped = read_jsonl(spark, str(p), SCHEMA, errors="drop")
        assert dropped.count() == 2


class TestJsonlStream:
    def test_streaming_reader_matches_batch(self, spark, tmp_path):
        src = tmp_path / "drop"
        src.mkdir()
        (src / "a.jsonl").write_text(
            '{"doc_id": 1, "text": "alpha", "lang": "en"}\n'
            "{broken}\n"
            '{"doc_id": 2, "text": "beta", "lang": "de"}\n'
        )
        from cassandra_cql_streaming_db_migrator_spark.sources.text import (
            read_jsonl_stream,
        )

        stream = read_jsonl_stream(spark, str(src), SCHEMA)
        assert stream.isStreaming
        q = (
            stream.writeStream.format("memory")
            .queryName("jsonl_stream_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = spark.sql("SELECT * FROM jsonl_stream_test").collect()
        assert len(got) == 3
        good = [r for r in got if r["_corrupt_record"] is None]
        bad = [r for r in got if r["_corrupt_record"] is not None]
        assert {r["doc_id"] for r in good} == {1, 2}
        assert len(bad) == 1

    def test_csv_null_and_whitespace_values_survive(self, spark, tmp_path):
        one_col = T.StructType([T.StructField("text", T.StringType())])
        p = tmp_path / "vals.csv"
        p.write_text("text\nnull\n   \nalpha\n\n")
        df = read_csv(spark, str(p), one_col)
        got = sorted(r["text"] for r in df.collect())
        # 'null' and whitespace-only lines are DATA in CSV; only the truly
        # empty line is dropped
        assert got == ["   ", "alpha", "null"]
