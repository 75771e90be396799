"""Streaming bucketed CDC mirror (VERDICT r07 ask #5): the drained mirror
equals batch cdc_latest row-for-row, the maintained table is join-ready
with zero mirror-side exchanges, and the per-batch merge discipline keeps
out-of-order arrivals from overwriting newer rows."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _events(spark):
    from cassandra_cql_streaming_db_migrator_spark.sources.parquet import (
        load_table,
    )

    return load_table(spark, SF, "events")


def test_drained_mirror_equals_batch_cdc_latest(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.temporal import (
        latest_by_key,
    )
    from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
        streaming_cdc_mirror,
    )

    events = _events(spark)
    mirror = streaming_cdc_mirror(spark, events).collect()
    batch = latest_by_key(
        events, key_col="user_id", ts_col="ts", tiebreak_col="event_id",
        value_cols=["event_type", "value"],
    ).collect()
    assert sorted(map(tuple, mirror)) == sorted(map(tuple, batch))


def test_mirror_table_is_join_ready_without_exchange(spark):
    from cassandra_cql_streaming_db_migrator_spark.sinks.bucketing import (
        read_bucketed,
    )
    from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
        streaming_cdc_mirror,
    )

    streaming_cdc_mirror(spark, _events(spark))
    # the operator leaves the live mirror in one of the A/B tables
    live = [
        t.name
        for t in spark.catalog.listTables()
        if re.match(r"cdc_mirror_[ab]_\d+$", t.name)
    ]
    assert live, "no mirror table left in catalog"
    mirror = read_bucketed(spark, sorted(live)[-1])
    # an aggregate on the bucket key reuses the bucketing: NO exchange
    agg_plan = _plan_of(mirror.groupBy("user_id").agg(F.sum("n_versions")))
    assert not re.search(r"\n\(\d+\) Exchange", agg_plan), agg_plan
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = mirror.join(
            read_bucketed(spark, sorted(live)[-1]).select(
                "user_id", F.col("n_versions").alias("nv2")
            ),
            "user_id",
        )
        join_plan = _plan_of(joined)
        assert not re.search(r"\n\(\d+\) Exchange", join_plan), join_plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_out_of_order_batch_does_not_overwrite_newer_row(spark):
    # ADVICE r08 #4: hash-repartitioned chunks can't guarantee an
    # out-of-order arrival actually happens, so this fixture PINS the
    # ingest schedule via chunk_col — the NEWEST row for every user
    # arrives in chunk 0, strictly older updates arrive in chunks 1 and
    # 2.  Upsert semantics must keep the chunk-0 frontier: a merge that
    # trusted arrival order would report the chunk-2 (oldest) rows.
    import datetime as dt

    from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
        streaming_cdc_mirror,
    )

    def t(minute):
        return dt.datetime(2026, 1, 1, 12, minute, 0)

    rows = []
    for uid in range(1, 6):
        # chunk 0 carries the newest version (minute 50), later chunks
        # carry progressively older ones — deterministically out of order
        rows.append((uid, 300 + uid, t(50), "newest", float(uid), 0))
        rows.append((uid, 200 + uid, t(30), "middle", 10.0 + uid, 1))
        rows.append((uid, 100 + uid, t(10), "oldest", 20.0 + uid, 2))
    events = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp, event_type string, "
        "value double, chunk int",
    )

    mirror = streaming_cdc_mirror(
        spark, events, n_chunks=3, chunk_col="chunk"
    )
    got = {
        r["user_id"]: (r["n_versions"], r["last_ts"], r["last_event_type"])
        for r in mirror.collect()
    }
    assert got == {
        uid: (3, t(50), "newest") for uid in range(1, 6)
    }


def test_chunk_col_pins_microbatch_arrival_order(spark):
    # the deterministic-ingest knob itself: microbatch i must hold
    # exactly the rows of chunk value i (otherwise the out-of-order test
    # above proves nothing)
    import tempfile

    from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
        read_documents_stream_chunked,
    )

    rows = [(i, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, chunk int")
    scratch = tempfile.mkdtemp(prefix="chunk_order_test_")
    stream = read_documents_stream_chunked(
        spark, df, n_chunks=3, scratch_dir=scratch, chunk_col="chunk"
    )
    seen: list[set[int]] = []

    def grab(mb, epoch_id):
        ids = {r["id"] for r in mb.collect()}
        if ids:
            seen.append(ids)

    q = stream.writeStream.foreachBatch(grab).trigger(availableNow=True).start()
    q.awaitTermination()
    assert seen == [
        {i for i in range(30) if i % 3 == c} for c in range(3)
    ]


def test_untouched_bucket_files_are_carried_not_rewritten(spark):
    # VERDICT r08 ask #5: the per-batch write must be O(touched buckets).
    # Chunk 0 seeds 40 users; chunk 1 updates exactly 3 of them — so the
    # batch-2 write may only produce files for the buckets those 3 keys
    # hash to, and every other bucket file in the final table must be the
    # SAME INODE as the file batch 1 wrote (hardlink carry-forward).
    import datetime as dt
    import os

    from pyspark.sql import functions as F2

    from cassandra_cql_streaming_db_migrator_spark.sinks.bucketing import (
        bucket_files,
        table_location,
    )
    from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
        streaming_cdc_mirror,
    )

    n_buckets = 16
    updated = [1, 2, 3]

    def t(minute):
        return dt.datetime(2026, 2, 1, 9, minute, 0)

    rows = [
        (uid, uid, t(0), "seed", float(uid), 0) for uid in range(1, 41)
    ] + [
        (uid, 100 + uid, t(5), "update", 99.0, 1) for uid in updated
    ]
    events = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp, event_type string, "
        "value double, chunk int",
    )

    mirror = streaming_cdc_mirror(
        spark, events, n_chunks=2, n_buckets=n_buckets, chunk_col="chunk"
    )
    got = {r["user_id"]: (r["n_versions"], r["last_event_type"])
           for r in mirror.collect()}
    assert got == {
        uid: ((2, "update") if uid in updated else (1, "seed"))
        for uid in range(1, 41)
    }

    # batch 2 wrote table B carrying table A's untouched files
    import re
    tables = sorted(
        t2.name for t2 in spark.catalog.listTables()
        if re.match(r"cdc_mirror_[ab]_\d+$", t2.name)
    )
    assert len(tables) == 2
    files_a = bucket_files(table_location(spark, tables[0]))
    files_b = bucket_files(table_location(spark, tables[1]))

    touched = {
        r[0]
        for r in spark.createDataFrame([(u,) for u in updated], "user_id long")
        .select(F2.pmod(F2.hash("user_id"), F2.lit(n_buckets)))
        .collect()
    }
    untouched_with_data = set(files_a) - touched
    assert untouched_with_data, "fixture must leave some buckets untouched"
    for b in untouched_with_data:
        inodes_a = {os.stat(p).st_ino for p in files_a[b]}
        inodes_b = {os.stat(p).st_ino for p in files_b[b]}
        assert inodes_b == inodes_a, f"bucket {b} was rewritten"
    for b in touched & set(files_b):
        inodes_a = {os.stat(p).st_ino for p in files_a.get(b, [])}
        inodes_b = {os.stat(p).st_ino for p in files_b[b]}
        assert not (inodes_b & inodes_a), f"touched bucket {b} not rewritten"


def test_untouched_bucket_survives_multiple_carries(spark):
    # A bucket untouched by EVERY later batch must still be batch 1's
    # inode after two carry-forwards (the hardlink chain survives the
    # A/B flip overwriting its original table).
    import datetime as dt
    import os

    from pyspark.sql import functions as F2

    from cassandra_cql_streaming_db_migrator_spark.sinks.bucketing import (
        bucket_files,
        table_location,
    )
    from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
        streaming_cdc_mirror,
    )

    n_buckets = 16

    def t(minute):
        return dt.datetime(2026, 3, 1, 8, minute, 0)

    rows = [(uid, uid, t(0), "seed", 1.0, 0) for uid in range(1, 41)]
    rows += [(1, 101, t(5), "u1", 2.0, 1)]
    rows += [(2, 102, t(10), "u2", 3.0, 2)]
    events = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp, event_type string, "
        "value double, chunk int",
    )
    mirror = streaming_cdc_mirror(
        spark, events, n_chunks=3, n_buckets=n_buckets, chunk_col="chunk"
    )
    assert mirror.count() == 40

    import re
    tables = sorted(
        t2.name for t2 in spark.catalog.listTables()
        if re.match(r"cdc_mirror_[ab]_\d+$", t2.name)
    )
    # 3 batches over 2 alternating tables: batch 3 overwrote batch 1's
    # table, and the LIVE table is batch 3's
    live = bucket_files(table_location(spark, tables[0]))
    touched = {
        r[0]
        for r in spark.createDataFrame([(1,), (2,)], "user_id long")
        .select(F2.pmod(F2.hash("user_id"), F2.lit(n_buckets)))
        .collect()
    }
    # the carried inodes must be hardlinks with the original still linked
    # through the intermediate table (nlink >= 2) or sole survivors after
    # its overwrite (nlink >= 1) — and crucially, READABLE and consistent
    for b, paths in live.items():
        if b in touched:
            continue
        for p in paths:
            st = os.stat(p)
            assert st.st_nlink >= 1
    # consistency: the mirror equals the batch frontier
    got = {r["user_id"]: r["last_event_type"] for r in mirror.collect()}
    want = {uid: "seed" for uid in range(1, 41)}
    want[1], want[2] = "u1", "u2"
    assert got == want


def test_epoch_watermark_survives_restart(spark, tmp_path):
    # VERDICT r09 ask #4: replay idempotence across the PROCESS boundary.
    # Run the mirror with a persisted state dir, then rerun with the same
    # state dir — a restarted stream replays every epoch from zero, and
    # the persisted watermark must fence them all: the additive
    # n_versions merge cannot double-count and the mirror content is
    # byte-unchanged.
    import datetime as dt
    import json
    import os

    from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
        streaming_cdc_mirror,
    )

    def t(minute):
        return dt.datetime(2026, 3, 1, 8, minute, 0)

    rows = []
    for uid in range(1, 8):
        rows.append((uid, 300 + uid, t(50), "newest", float(uid), 0))
        rows.append((uid, 200 + uid, t(30), "middle", 10.0 + uid, 1))
        rows.append((uid, 100 + uid, t(10), "oldest", 20.0 + uid, 2))
    events = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp, event_type string, "
        "value double, chunk int",
    )
    sd = str(tmp_path / "cdc_state")

    first = sorted(
        map(
            tuple,
            streaming_cdc_mirror(
                spark, events, n_chunks=3, chunk_col="chunk", state_dir=sd
            ).collect(),
        )
    )
    wm_file = os.path.join(sd, "cdc_epoch_watermark.json")
    with open(wm_file) as f:
        wm = json.load(f)
    assert wm["last_epoch"] == 2  # three chunks -> epochs 0..2 merged
    assert wm["cur"].startswith("cdc_mirror_")
    wm_stat = os.stat(wm_file)

    # "restart": a fresh run against the same state dir replays epochs
    # 0..2; all are <= the watermark, so nothing merges and nothing moves
    second = sorted(
        map(
            tuple,
            streaming_cdc_mirror(
                spark, events, n_chunks=3, chunk_col="chunk", state_dir=sd
            ).collect(),
        )
    )
    assert second == first  # n_versions still 3 per key, frontier intact
    assert {r[1] for r in second} == {3}  # and NOT doubled to 6
    after = os.stat(wm_file)
    assert (after.st_mtime_ns, after.st_ino) == (
        wm_stat.st_mtime_ns,
        wm_stat.st_ino,
    )  # the watermark itself was not rewritten — zero replay work

    # stale watermark (its table is gone) must fall back to a fresh
    # build, not crash or serve nothing
    spark.sql(f"DROP TABLE IF EXISTS `{wm['cur']}`")
    third = sorted(
        map(
            tuple,
            streaming_cdc_mirror(
                spark, events, n_chunks=3, chunk_col="chunk", state_dir=sd
            ).collect(),
        )
    )
    assert third == first
