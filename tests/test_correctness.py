"""Oracle-parity tests: every registry query vs its DuckDB oracle at
sf0.001 — the same comparison the driver's correctness gate performs
(row count + schema + order-insensitive exact values)."""

from __future__ import annotations

import duckdb
import pytest

from cassandra_cql_streaming_db_migrator_spark.queries import all_queries
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import TABLES
from tools.check_correctness import rowset

from conftest import SF_DIR

_QUERIES = all_queries()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    q = _QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = [[row[c] for c in scols] for row in sdf.collect()]

    if q.oracle is None:
        assert len(srows) >= 0  # rows-only contract: must run and be stable
        again = [[row[c] for c in scols] for row in q.fn(spark, sf_dir).collect()]
        assert rowset(srows) == rowset(again), "rows-only query must be deterministic"
        return

    cur = oracle.execute(q.oracle)
    ocols_raw = [d[0] for d in cur.description]
    orows_raw = cur.fetchall()
    order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
    ocols = [ocols_raw[i] for i in order]
    orows = [[r[i] for i in order] for r in orows_raw]

    assert scols == ocols
    assert len(srows) == len(orows)
    assert rowset(srows) == rowset(orows)


# Spark simple type each DuckDB type must map to.  timestamp is listed as
# both timestamp and timestamp_ntz: DuckDB TIMESTAMP is timezone-naive, and
# queries emitting Spark TIMESTAMP_NTZ against it have been driver-green
# since round 1 (filter_pushdown, join_asof, scd2_history) — the pairing is
# proven hash-compatible, unlike integer WIDTH mismatches.
_DUCK_TO_SPARK = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "SMALLINT": {"smallint"},
    "TINYINT": {"tinyint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "DATE": {"date"},
    "BLOB": {"binary"},
}


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_schema_widths_match_spark(name, spark, sf_dir, oracle):
    """Driver-hasher guard #2 (the round-2 HUGEINT lesson generalized):
    the driver hashes raw value REPRESENTATIONS, so an oracle column typed
    wider or narrower than Spark's (int32 vs BIGINT, float vs double) is a
    latent hash mismatch even when every value is equal.  Building the
    Spark schema is lazy — no execution — so this walks all queries
    cheaply."""
    q = _QUERIES[name]
    if q.oracle is None:
        pytest.skip("rows-only query, no oracle schema")
    rel = oracle.sql(q.oracle)
    otypes = dict(zip(rel.columns, (str(t).upper() for t in rel.types)))
    stypes = dict(q.fn(spark, sf_dir).dtypes)
    for col, ot in otypes.items():
        st = stypes.get(col)
        if ot.startswith("DECIMAL"):
            assert st is not None and st.startswith("decimal"), (name, col, ot, st)
            continue
        allowed = _DUCK_TO_SPARK.get(ot)
        assert allowed is not None, f"{name}.{col}: unmapped DuckDB type {ot}"
        assert st in allowed, (
            f"{name}.{col}: oracle {ot} vs spark {st} — align the widths "
            "on both sides (driver hash representation)"
        )


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_schema_has_no_hugeint(name, oracle):
    """Driver-hasher guard: DuckDB widens sum(BIGINT) to HUGEINT (int128),
    which the round driver's value hasher represents differently from
    Spark's int64 even when every value is identical (round-2 lesson:
    sequence_pack / pagerank_trade hash-fails).  Any oracle emitting an
    int128 column must CAST it to BIGINT explicitly."""
    q = _QUERIES[name]
    if q.oracle is None:
        pytest.skip("rows-only query, no oracle schema")
    types = [str(t).upper() for t in oracle.sql(q.oracle).types]
    banned = {"HUGEINT", "UHUGEINT", "INT128"}
    offending = [t for t in types if t in banned]
    assert not offending, (
        f"oracle for {name} emits int128 column(s) {offending}; "
        "CAST the aggregate to BIGINT in the oracle SQL"
    )
