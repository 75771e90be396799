"""Join family (SURVEY §2.5 J2).

The reference has exactly one join shape — the PK left-anti of
IfNotExistFilter (operators.anti_join) — because its pipelines are
single-table.  But its calculated-column use case
(migration-config.example.yaml:97-120) is enrichment, which generalizes to
lookup joins; our engine exposes the full family.

Scale doctrine:
  * dimension tables (region/nation/...-sized) -> ``broadcast_dim_join``: no
    shuffle of the fact side at all; at 100 TB the fact table never moves.
  * fact-fact joins -> plain equi-join; AQE picks shuffled hash vs sort-merge
    and splits skewed partitions (skewJoin enabled in session.py).
  * pre-shuffling both sides on the key (``colocated``) reuses one exchange
    across several joins/aggs on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Equi-join with an explicit broadcast hint on the dimension side.
    AQE usually gets this right from size stats; the hint makes it a
    guarantee (a 100 TB fact shuffle by accident is unrecoverable)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — returns left rows with a match, never duplicates them."""
    return left.join(right, on=on, how="left_semi")


def colocated(df: DataFrame, key_columns: list[str], partitions: int | None = None) -> DataFrame:
    """Hash-partition on the join/agg key so several downstream wide ops on
    the same key share one exchange (bucketing's runtime cousin)."""
    return df.repartition(partitions, *key_columns) if partitions else df.repartition(*key_columns)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` on the same keys (``backward``; ``forward``
    flips to earliest with ``right_ts >= left_ts``).  Ties at equal
    timestamps are inclusive (the right row at exactly left_ts matches).

    Implemented as union + ordered window, NOT join-then-rank: tag both
    sides, sort each key group by event time with right rows first at ties,
    and carry the last non-null right payload forward.  One shuffle on
    ``keys``, zero candidate-pair blow-up — a join+filter+row_number plan
    materializes |left|x|right-per-key| intermediate pairs, which at 100 TB
    is the difference between a linear pass and an explosion.

    Left rows with no matching right row get NULL payload (left-outer
    semantics).  The fill unit is the right ROW, not individual payload
    values: payload columns ride inside one struct that is non-null for
    every right row, so a matching right row whose payload value is
    legitimately NULL yields NULL — not an older row's value carried
    forward.  If several right rows share (keys, right_ts), which one
    wins is tie-ambiguous — pass payload columns that are themselves
    ordered (e.g. the right timestamp) or pre-dedup the right side.
    """
    left_extra = [c for c in left.columns if c not in keys and c != left_ts]
    payload_struct = F.struct(*[F.col(c) for c in payload_cols])
    payload_type = right.select(payload_struct.alias("__p")).schema["__p"].dataType
    l = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_extra],
        F.lit(None).cast(payload_type).alias("__p"),
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extra],
        payload_struct.alias("__p"),
    )
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc()]
    elif direction == "forward":
        order = [F.col("__t").desc(), F.col("__side").asc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *keys,
        "__t",
        "__side",
        *left_extra,
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *keys,
        F.col("__t").alias(left_ts),
        *left_extra,
        *[F.col("__p").getField(c).alias(c) for c in payload_cols],
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key_columns: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-splitting equi-join: hot keys on the skewed side are spread
    over ``salt`` sub-keys; the other side is replicated ``salt`` times so
    every sub-key still finds its matches.  Result is row-identical to the
    plain join (a unit test asserts it) — only the shuffle distribution
    changes: a key holding 30% of the table becomes ``salt`` partitions of
    3.75% each.

    AQE's skew-join handles sort-merge skew automatically; explicit
    salting remains the tool when AQE can't help (skewed hash aggregates
    feeding a join, skew in a bucketed/colocated plan, or a replicated
    dimension too big to broadcast but cheap to duplicate ``salt`` times).

    Only join types where the replicated side never emits unmatched rows
    are allowed (inner/left/left_semi/left_anti): a right/full outer join
    would emit each unmatched ``other`` row once PER REPLICA.

    The salt derives from the skewed side's input partition (not rand():
    retried tasks re-derive the same salt from the same split; not a
    content hash: a hot key with IDENTICAL rows — the canonical skew —
    would hash to one sub-key and defeat the spread)."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched rows of "
            "the replicated side; use the plain join for right/full outer"
        )
    salted_l = skewed.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(salt))
    )
    salted_r = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_l.join(salted_r, on=[*key_columns, "__salt"], how=how)
    return out.drop("__salt")


def interval_join_broadcast(
    fact: DataFrame,
    intervals: DataFrame,
    point,
    lo,
    hi,
    how: str = "inner",
) -> DataFrame:
    """Containment join ``lo <= point < hi`` with a broadcast small side.
    Spark plans non-equi joins as nested-loop; broadcasting the interval
    table makes that a per-row scan of an in-memory list — the right call
    whenever the interval set fits in an executor (tiers, calendars,
    buckets).  For interval tables too big to broadcast use
    ``interval_join_bucketed``."""
    cond = (fact[point] >= intervals[lo]) & (fact[point] < intervals[hi])
    return fact.join(F.broadcast(intervals), on=cond, how=how)


def interval_join_bucketed(
    fact: DataFrame,
    intervals: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bucket_width: float,
) -> DataFrame:
    """Containment join for LARGE interval tables: explode each interval
    into the coarse buckets it covers, equi-join fact rows on their single
    bucket, then apply the exact range predicate.  Turns the nested-loop
    into a hash join whose cost is |fact| + sum(interval spans / width);
    a point matches an interval in exactly one bucket (its own), so no
    post-join dedup is needed.  Choose ``bucket_width`` ~ median interval
    length: too small explodes the interval side, too large degrades the
    bucket-local filter toward brute force."""
    fb = fact.withColumn("__bucket", F.floor(F.col(point) / F.lit(bucket_width)))
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(bucket_width)),
                F.floor(F.col(hi) / F.lit(bucket_width)),
            )
        ),
    )
    joined = fb.join(ib, on="__bucket")
    return joined.filter(
        (F.col(point) >= F.col(lo)) & (F.col(point) < F.col(hi))
    ).drop("__bucket")


def _deletion_variants(key: str) -> str:
    """SQL expr: the string plus every single-character deletion of it,
    deduped — the FastSS / symmetric-delete neighborhood for edit
    distance 1."""
    return (
        f"array_distinct(concat(array({key}), "
        f"transform(sequence(1, length({key})), "
        f"i -> concat(substring({key}, 1, i - 1), "
        f"substring({key}, i + 1, length({key}))))))"
    )


def fuzzy_key_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Edit-distance-1 key join via symmetric-deletion blocking (FastSS):
    each side expands to its deletion neighborhood (the key plus every
    single-char deletion — L+1 block keys per row), candidates meet on a
    plain hash equi-join of neighborhoods, and an exact ``levenshtein``
    check rejects the false positives the blocking admits (two strings can
    share a deletion while being 2 edits apart, e.g. "ab"/"ba").

    The migration use case: re-keying a table whose source keys picked up
    typos/truncations in flight — the reference engine's anti-join filter
    (IfNotExistFilter.java:56-94) answers "is this exact key present?",
    this answers "which almost-identical key is present?".

    Scale shape: never quadratic — candidate volume is bounded by block-key
    collisions, not |L|·|R|; both neighborhoods shuffle once on the block
    key (standard hash join), and the ``distinct`` that collapses multi-
    variant matches runs on the candidate pairs only.  Keys are short
    strings, so the L+1 expansion is a small constant factor of the key
    column, not of the row.

    Join multiplicity is exact even for non-row-distinct inputs: each side
    is collapsed to (distinct row, multiplicity) BEFORE blocking, so the
    cross-block ``distinct`` dedupes only the variant dimension (a matched
    pair of keys can share up to L+1 deletion blocks), and every verified
    pair re-expands to ``l_mult * r_mult`` output rows — exactly the
    instance-pair count a true edit-distance join produces.  The pre-
    collapse groupBy also shrinks the neighborhood explode when duplicates
    exist.

    Pass ``extra_on`` (equality columns present under the same name on
    both sides, e.g. a blocking attribute like nation) to fold them into
    the hash-join key — candidates must then agree on them too, shrinking
    block buckets at no semantic cost.
    """
    lg = left.groupBy(left.columns).agg(F.count(F.lit(1)).alias("__lmult"))
    rg = right.groupBy(right.columns).agg(F.count(F.lit(1)).alias("__rmult"))
    lv = lg.withColumn(
        "__block", F.explode(F.expr(_deletion_variants(left_key)))
    )
    rv = rg.withColumn(
        "__block", F.explode(F.expr(_deletion_variants(right_key)))
    )
    # distinct over distinct-row pairs (+ their multiplicity columns,
    # functionally determined by the rows) — collapses multi-block matches
    # without touching genuine input duplicates, which ride the counts.
    cand = (
        lv.join(rv, on=["__block", *(extra_on or [])])
        .drop("__block")
        .distinct()
    )
    verified = cand.filter(
        F.levenshtein(F.col(left_key), F.col(right_key)) <= 1
    )
    # the multiplicity product stays LONG end-to-end (ADVICE r04 #5):
    # sequence() accepts long bounds, so an absurd duplicate product fails
    # loudly at Spark's array-length ceiling instead of silently wrapping
    # through a long->int cast into a wrong (or negative-bound) expansion.
    return (
        verified.withColumn(
            "__copy",
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"),
                    F.col("__lmult") * F.col("__rmult"),
                )
            ),
        )
        .drop("__lmult", "__rmult", "__copy")
    )
