"""Distinct-count sketches (KMV) — approximate analytics the reference's
single-pass migrator shape cannot express (its only aggregate is the counter
merge, DefaultMigratorPlugin.java:309-311); first-class here because corpus
governance at 100 TB needs cardinality estimates without a full distinct.

Why KMV (k-minimum-values) and not HyperLogLog: engine built-ins
(``approx_count_distinct``, DuckDB's HLL) are implementation-defined and can
never hash-match across engines.  KMV with an explicit affine hash is fully
deterministic: the estimate is a pure function of the k smallest hash values,
so the Spark plan and the ANSI-SQL oracle agree bit-for-bit while still being
a genuine sublinear-memory sketch (state per group = k int64s, vs the full
key set for exact distinct).

Scale shape: one distinct on (group, key) — the same shuffle exact distinct
would pay — then a per-group top-k window over the *distinct* keys.  The win
at 100 TB is the output/state side: a group with 10^9 distinct keys carries
64 values, not 10^9, into the final aggregate, and the sketch is mergeable
(union of k-min sets -> k-min of union), which is what lets per-partition /
per-day sketches roll up without re-scanning the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import MINHASH_P
from .caching import materialized

# Frozen affine-hash parameters (same family as MINHASH_PERMS; a < 2^31 so
# a*key' stays under 2^62 for the narrowed key' < 2^31).  key' -> (a*key'
# + b) mod (2^31-1) is a bijection on [0, 2^31-1), so hashing distinct
# in-range keys yields distinct hashes — the k-th minimum is collision-free
# by construction.
#
# DOMAIN: any int64 key.  The hash narrows first — key' = pmod(key, P) —
# which is the identity on [0, 2^31-1) (the fixture id spaces) and gives
# negative or >= 2^31 keys one well-defined value that all three
# implementations agree on: Spark pmod, DuckDB's (k % P + P) % P, and
# numpy's divisor-sign %.  Without the narrowing the three diverge (int64
# products wrap at different points; bare %'s sign follows the dividend in
# Spark/DuckDB but the divisor in numpy) — see kmv_hash_sql for the oracle
# expression.  NULL keys hash to NULL and are filtered before any top-k
# window (Spark orders NULLS FIRST, DuckDB NULLS LAST — a NULL that
# reached the window would silently shift the k-th minimum on one side
# only).
KMV_A = 1103515245
KMV_B = 12345


def kmv_hash(col) -> "F.Column":
    """Affine int64 hash to (0, 1]-normalizable range [0, MINHASH_P);
    total on int64 via the narrowing pmod (see module constants)."""
    narrowed = F.pmod(F.col(col).cast("long"), F.lit(MINHASH_P))
    return (narrowed * F.lit(KMV_A) + F.lit(KMV_B)) % F.lit(MINHASH_P)


def kmv_hash_sql(key_expr: str) -> str:
    """The identical total hash as ANSI SQL (DuckDB oracle twin)."""
    p = MINHASH_P
    return (
        f"(((CAST({key_expr} AS BIGINT) % {p} + {p}) % {p})"
        f" * {KMV_A} + {KMV_B}) % {p}"
    )


def kmv_distinct(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    Estimator: with u_k = (k-th smallest hash)/P the k-th order statistic of
    uniform draws, D ≈ (k-1)/u_k.  Groups with fewer than k distinct keys
    are exact (the sketch saw every key).  Emits the exact count too so the
    estimate's error is inspectable; both are deterministic cross-engine
    (integer hash; one double division per group).

    The distinct is on the HASH, not the key: KMV state is a set of hash
    values, which is what makes the batch sketch, the streaming GroupState
    kernel (a hash set by construction), and the SQL oracle agree on ANY
    key space.  On the injective domain (keys in [0, 2^31-1), the fixture
    id spaces) hash-distinct == key-distinct exactly; out-of-domain keys
    that collide through the narrowing pmod count once — the sketch
    cannot distinguish hash-colliding keys anyway, so ``exact_distinct``
    is the distinct-HASH count by definition.
    """
    distinct = (
        df.where(F.col(key_col).isNotNull())
        .select(group_col, kmv_hash(key_col).alias("__h"))
        .distinct()
    )
    w_topk = Window.partitionBy(group_col).orderBy("__h")
    w_all = Window.partitionBy(group_col)
    ranked = distinct.withColumn("__rn", F.row_number().over(w_topk)).withColumn(
        "__exact", F.count(F.lit(1)).over(w_all)
    )
    return (
        ranked.where(F.col("__rn") <= k)
        .groupBy(group_col)
        .agg(
            F.max("__exact").alias("exact_distinct"),
            F.count(F.lit(1)).alias("__n_min"),
            F.max("__h").alias("__kth"),
        )
        .select(
            group_col,
            "exact_distinct",
            F.when(F.col("__n_min") < k, F.col("__n_min").cast("double"))
            .otherwise(
                F.round(
                    F.lit(float(k - 1)) / (F.col("__kth").cast("double") / F.lit(float(MINHASH_P))),
                    4,
                )
            )
            .alias("est_distinct"),
        )
    )


def sampled_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    rate: float = 0.1,
) -> DataFrame:
    """Approximate per-group quantiles from a DETERMINISTIC hash sample.

    Exact percentiles cost a per-group sort of every row — the thing that
    does not survive 100 TB.  The scale path: keep rows whose hashed id
    falls under ``rate`` (a pure function of the data — no RNG, stable
    under repartitioning, pushes down as a narrow filter before any
    shuffle), then take EXACT interpolated percentiles of the sample.
    Unlike t-digest/KLL built-ins the result is reproducible cross-engine,
    which is what lets the oracle hash it.  Sample row count is emitted so
    consumers can judge the estimate (error ~ O(1/sqrt(n_sample)) per
    quantile).
    """
    thresh = int(rate * MINHASH_P)
    sampled = df.where(kmv_hash(id_col) < F.lit(thresh))
    aggs = [F.count(F.lit(1)).alias("n_sample")]
    for q in quantiles:
        tag = str(q).replace("0.", "p")
        aggs.append(
            F.round(F.expr(f"percentile({value_col}, {q!r})"), 6).alias(tag)
        )
    return sampled.groupBy(group_col).agg(*aggs)


def sampled_quantiles_sql(
    table: str,
    group_col: str,
    value_col: str,
    id_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    rate: float = 0.1,
) -> str:
    """Oracle twin: DuckDB quantile_cont uses the same (n-1)p linear
    interpolation as Spark's percentile()."""
    thresh = int(rate * MINHASH_P)
    cols = ", ".join(
        f"round(quantile_cont({value_col}, {q}), 6) AS {str(q).replace('0.', 'p')}"
        for q in quantiles
    )
    return f"""
SELECT {group_col}, count(*) AS n_sample, {cols}
FROM {table}
WHERE {kmv_hash_sql(id_col)} < {thresh}
GROUP BY {group_col}
"""


def kmv_distinct_sql(
    table: str, group_col: str, key_col: str, k: int = 64
) -> str:
    """The identical estimator as DuckDB SQL (oracle twin) — distinct on
    the hash, matching the batch/streaming set-of-hashes state."""
    return f"""
WITH h AS (
  SELECT DISTINCT {group_col}, {kmv_hash_sql(key_col)} AS hh
  FROM {table}
  WHERE {key_col} IS NOT NULL
),
r AS (
  SELECT {group_col}, hh,
         row_number() OVER (PARTITION BY {group_col} ORDER BY hh) AS rn,
         count(*) OVER (PARTITION BY {group_col}) AS exact_cnt
  FROM h
)
SELECT {group_col},
       max(exact_cnt) AS exact_distinct,
       CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
            ELSE round({float(k - 1)} / (CAST(max(hh) AS DOUBLE) / {float(MINHASH_P)}), 4)
       END AS est_distinct
FROM r
WHERE rn <= {k}
GROUP BY {group_col}
"""


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    rate: float = 0.1,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Robust per-group statistics: clip values into the [p_lo, p_hi]
    interval estimated from the deterministic hash sample, then count the
    clips and take the exact decimal sum of the winsorized values — the
    outlier-robust aggregate a metrics/feature pipeline runs instead of a
    raw mean.

    Scale shape: the percentile bounds come from :func:`sampled_quantiles`
    (narrow filter -> small exact percentile, no full-data sort); the
    bounds table is one row per group, broadcast back onto the feed — the
    big side never shuffles for the join and aggregates with map-side
    partials.  Deterministic end to end: hash sample + decimal sum.

    NULL values are EXCLUDED up front: greatest/least skip NULLs on both
    engines, so a NULL row would otherwise silently clip to the lower
    bound and inflate the sum with no audit trace.

    A group with NO rows in the hash sample has no bounds row; it is kept
    UNCLIPPED (bounds default to +/-inf via the left join, clip counts 0)
    rather than silently dropped — losing small groups with no audit
    trace is exactly what the n_clipped counters exist to prevent.
    """
    from .aggregates import decimal_sum

    df = df.where(F.col(value_col).isNotNull())
    tag_lo, tag_hi = (str(q).replace("0.", "p") for q in (lo, hi))
    bounds = sampled_quantiles(
        df, group_col, value_col, id_col, quantiles=(lo, hi), rate=rate
    ).select(group_col, tag_lo, tag_hi)
    v = F.col(value_col)
    blo = F.coalesce(F.col(tag_lo), F.lit(float("-inf")))
    bhi = F.coalesce(F.col(tag_hi), F.lit(float("inf")))
    clipped = F.least(F.greatest(v, blo), bhi)
    return (
        df.join(F.broadcast(bounds), group_col, "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((v < blo).cast("long")).alias("n_clipped_low"),
            F.sum((v > bhi).cast("long")).alias("n_clipped_high"),
            decimal_sum(clipped, "winsorized_sum"),
        )
    )


def winsorized_stats_sql(
    table: str,
    group_col: str,
    value_col: str,
    id_col: str,
    rate: float = 0.1,
    lo: float = 0.01,
    hi: float = 0.99,
) -> str:
    """The identical winsorization as DuckDB SQL (oracle twin)."""
    tag_lo, tag_hi = (str(q).replace("0.", "p") for q in (lo, hi))
    nn = f"(SELECT * FROM {table} WHERE {value_col} IS NOT NULL)"
    bounds = sampled_quantiles_sql(
        nn, group_col, value_col, id_col, quantiles=(lo, hi), rate=rate
    )
    return f"""
WITH s AS ({bounds}),
j AS (
  SELECT t.{group_col} AS g, t.{value_col} AS v,
         COALESCE(s.{tag_lo}, CAST('-infinity' AS DOUBLE)) AS blo,
         COALESCE(s.{tag_hi}, CAST('infinity' AS DOUBLE)) AS bhi
  FROM {nn} t LEFT JOIN s ON t.{group_col} = s.{group_col}
)
SELECT g AS {group_col}, count(*) AS n,
       CAST(sum(CASE WHEN v < blo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(sum(CASE WHEN v > bhi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high,
       CAST(round(sum(CAST(least(greatest(v, blo), bhi)
                           AS DECIMAL(28,10))), 2) AS DOUBLE) AS winsorized_sum
FROM j
GROUP BY g
"""


# ---------------------------------------------------------------------------
# Count-min sketch: fixed-size additive frequency summary
# ---------------------------------------------------------------------------
#
# The frequency-sketch sibling of KMV: d hash rows x w cells of counters,
# cell[j][h_j(key)] += count.  Additive and therefore ORDER-INDEPENDENT —
# unlike Misra-Gries/space-saving (whose state depends on arrival order),
# a CMS built by any partitioning, merge order, or streaming chunking is
# bit-identical, which is what lets a SQL oracle hash-check it.  Estimates
# are min over the d cells: always >= the true count (one-sided error),
# within eps*N with probability 1-delta for w = e/eps, d = ln(1/delta).
#
# Scale story: the sketch is d*w int64s REGARDLESS of corpus size —
# map-side partial aggregation reduces each partition to at most d*w
# cells, the shuffle moves only those, and sketches merge by cell-wise
# addition (day-over-day rollups never re-scan).  The candidate set for
# the heavy-hitter REPORT below comes from the exact census (which this
# fixture-scale query computes anyway as ground truth for the
# overestimate audit); a pure-sketch deployment keeps per-partition
# local-top-k candidates instead.

CMS_PERMS: list[tuple[int, int]] = [
    (1103515245, 12345),
    (1229782938, 2749),
    (1588635695, 98765),
    (784588716, 1013904223),
]


def _cms_cell(ph, a: int, b: int, width: int):
    """Cell index for one hash row: affine over the already-narrowed
    polynomial hash (ph < 1e9+7, a < 2^31 -> a*ph < 2^62, int64-safe)."""
    return ((ph * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)) % F.lit(width)


def cms_rows(key, width: int):
    """``array<struct<j, cell>>`` of a key's d cell coordinates — the shared
    cell addressing of the batch sketch builder, the streaming builder, and
    every probe (one definition so they can never drift)."""
    from ..functions.hashing import poly_hash

    ph = poly_hash(key)
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                _cms_cell(ph, a, b, width).alias("cell"),
            )
            for j, (a, b) in enumerate(CMS_PERMS)
        ]
    )


def cms_probe(
    cand: DataFrame, sketch: DataFrame, key_col: str, width: int
) -> DataFrame:
    """Estimate each candidate's count from a built sketch: min over its d
    cells.  ``cand`` must carry (key_col, exact_n); output adds ``cms_n``
    and the ``overestimate`` audit column."""
    cand_cells = cand.select(
        F.col(key_col), F.col("exact_n"),
        F.explode(cms_rows(F.col(key_col), width)).alias("__jc"),
    ).select(
        key_col, "exact_n",
        F.col("__jc.j").alias("j"), F.col("__jc.cell").alias("cell"),
    )
    return (
        cand_cells.join(F.broadcast(sketch), ["j", "cell"])
        .groupBy(key_col, "exact_n")
        .agg(F.min("cms_cell").alias("cms_n"))
        .select(
            F.col(key_col),
            F.col("exact_n"),
            F.col("cms_n"),
            (F.col("cms_n") - F.col("exact_n")).alias("overestimate"),
        )
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    width: int = 64,
    k: int = 40,
) -> DataFrame:
    """Build a depth-``len(CMS_PERMS)`` x ``width`` count-min sketch over
    ``key_col`` (string) and report the top-``k`` keys by exact count with
    their sketch estimates: ``key, exact_n, cms_n, overestimate``.

    ``cms_n >= exact_n`` always (one-sided error); ``overestimate`` is the
    collision mass the width choice admitted — the sizing feedback a
    deployment reads before trusting the sketch alone.
    """
    census = (
        df.groupBy(key_col)
        .agg(
            (
                F.count(F.lit(1))
                if weight_col is None
                else F.sum(F.col(weight_col))
            ).alias("exact_n")
        )
    )
    census = materialized(census)
    rows = cms_rows(F.col(key_col), width)
    cells = census.select(
        F.col("exact_n"), F.explode(rows).alias("__jc")
    ).select(F.col("__jc.j").alias("j"), F.col("__jc.cell").alias("cell"), "exact_n")
    sketch = cells.groupBy("j", "cell").agg(F.sum("exact_n").alias("cms_cell"))
    cand = census.orderBy(F.col("exact_n").desc(), F.col(key_col).asc()).limit(k)
    return cms_probe(cand, sketch, key_col, width)


def cms_heavy_hitters_sql(
    source_sql: str, key_col: str, width: int = 64, k: int = 40
) -> str:
    """Oracle twin: same census -> same cells -> same min-over-rows.
    ``source_sql`` must yield one row per observation with ``{key_col}``."""
    from ..functions.hashing import poly_hash_sql

    perms = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(CMS_PERMS))
    return f"""
WITH census AS (
  SELECT {key_col}, count(*) AS exact_n FROM ({source_sql}) GROUP BY {key_col}
),
h AS (
  SELECT {key_col}, exact_n, {poly_hash_sql(key_col)} AS ph FROM census
),
cells AS (
  SELECT p.j, ((h.ph * p.a + p.b) % {MINHASH_P}) % {width} AS cell,
         h.{key_col}, h.exact_n
  FROM h, (VALUES {perms}) AS p(j, a, b)
),
sketch AS (
  SELECT j, cell, CAST(sum(exact_n) AS BIGINT) AS cms_cell
  FROM cells GROUP BY j, cell
),
cand AS (
  SELECT {key_col}, exact_n FROM census
  ORDER BY exact_n DESC, {key_col} ASC LIMIT {k}
)
SELECT c.{key_col}, c.exact_n, min(s.cms_cell) AS cms_n,
       min(s.cms_cell) - c.exact_n AS overestimate
FROM cand c
JOIN cells x ON x.{key_col} = c.{key_col}
JOIN sketch s ON s.j = x.j AND s.cell = x.cell
GROUP BY c.{key_col}, c.exact_n
"""


def kmv_set_estimate(
    df: DataFrame,
    label_col: str,
    key_col: str,
    label_a: str,
    label_b: str,
    k: int = 8,
) -> DataFrame:
    """KMV sketch ALGEBRA (the Theta-sketch trick): estimate |A∪B| and
    |A∩B| for two labeled key sets from their mergeable min-hash sketches.

    * union: the k minimum hashes of the MERGED sketch are exactly the
      merged top-k of the two sketches (mergeability), so
      |A∪B| ≈ (k-1)/u_k as usual;
    * intersection: among the union's k minima, the fraction ρ also
      present in BOTH sets is an unbiased sample of the overlap —
      |A∩B| ≈ ρ·|A∪B|.

    Everything is the frozen affine hash + joins on hash values, so the
    ESTIMATES (not just the exact controls) are deterministic and
    hash-checkable cross-engine.  Under-k sets short-circuit to exact.
    Emits exact counts alongside for error inspection.  One row out.
    """
    sides = {}
    for name, label in (("a", label_a), ("b", label_b)):
        sides[name] = (
            df.where(
                F.col(key_col).isNotNull() & (F.col(label_col) == label)
            )
            .select(kmv_hash(key_col).alias("__h"))
            .distinct()
        )
    ha, hb = materialized(sides["a"]), materialized(sides["b"])
    union = ha.unionAll(hb).distinct()
    # orderBy+limit = distributed TakeOrdered (per-partition k minima,
    # driver merges k) — never a global single-partition sort
    topk = materialized(union.orderBy("__h").limit(k))
    in_both = (
        topk.join(ha, "__h")
        .join(hb, "__h")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    counts = (
        ha.agg(F.count(F.lit(1)).alias("exact_a"))
        .crossJoin(hb.agg(F.count(F.lit(1)).alias("exact_b")))
        .crossJoin(union.agg(F.count(F.lit(1)).alias("exact_union")))
        .crossJoin(
            ha.join(hb, "__h").agg(F.count(F.lit(1)).alias("exact_inter"))
        )
        .crossJoin(
            topk.agg(
                F.count(F.lit(1)).alias("__nk"), F.max("__h").alias("__kth")
            )
        )
        .crossJoin(in_both)
    )
    union_est = F.when(
        F.col("__nk") < k, F.col("exact_union").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1))
            / (F.col("__kth").cast("double") / F.lit(float(MINHASH_P))),
            4,
        )
    )
    return counts.select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_inter",
        union_est.alias("union_est"),
        F.when(F.col("__nk") < k, F.col("exact_inter").cast("double"))
        .otherwise(
            F.round(
                F.col("n_both").cast("double") / F.lit(float(k)) * union_est,
                4,
            )
        )
        .alias("inter_est"),
    )


def kmv_set_estimate_sql(
    table: str,
    label_col: str,
    key_col: str,
    label_a: str,
    label_b: str,
    k: int = 8,
) -> str:
    """Oracle twin of :func:`kmv_set_estimate`."""
    h = kmv_hash_sql(key_col)
    p = MINHASH_P
    return f"""
WITH ha AS (
  SELECT DISTINCT {h} AS h FROM {table}
  WHERE {key_col} IS NOT NULL AND {label_col} = '{label_a}'
),
hb AS (
  SELECT DISTINCT {h} AS h FROM {table}
  WHERE {key_col} IS NOT NULL AND {label_col} = '{label_b}'
),
u AS (SELECT h FROM ha UNION SELECT h FROM hb),
topk AS (SELECT h FROM u ORDER BY h LIMIT {k}),
stats AS (
  SELECT
    (SELECT count(*) FROM ha) AS exact_a,
    (SELECT count(*) FROM hb) AS exact_b,
    (SELECT count(*) FROM u) AS exact_union,
    (SELECT count(*) FROM ha JOIN hb USING (h)) AS exact_inter,
    (SELECT count(*) FROM topk) AS nk,
    (SELECT max(h) FROM topk) AS kth,
    (SELECT count(*) FROM topk t JOIN ha USING (h) JOIN hb USING (h))
      AS n_both
)
SELECT CAST(exact_a AS BIGINT) AS exact_a,
       CAST(exact_b AS BIGINT) AS exact_b,
       CAST(exact_union AS BIGINT) AS exact_union,
       CAST(exact_inter AS BIGINT) AS exact_inter,
       CASE WHEN nk < {k} THEN CAST(exact_union AS DOUBLE)
            ELSE round({float(k - 1)} / (CAST(kth AS DOUBLE) / {float(p)}), 4)
       END AS union_est,
       CASE WHEN nk < {k} THEN CAST(exact_inter AS DOUBLE)
            ELSE round(CAST(n_both AS DOUBLE) / {float(k)}
                       * (CASE WHEN nk < {k} THEN CAST(exact_union AS DOUBLE)
                               ELSE round({float(k - 1)} / (CAST(kth AS DOUBLE) / {float(p)}), 4)
                          END), 4)
       END AS inter_est
FROM stats
"""


# ---------------------------------------------------------------------------
# Bitmap audience index: the roaring-bitmap-lite audience-overlap engine.


def bitmap_audience_overlap(
    df: DataFrame,
    label_col: str = "event_type",
    key_col: str = "user_id",
) -> DataFrame:
    """Pairwise audience overlap (exact distinct-key intersection) for
    every label pair, via 64-bit BITMAP WORDS instead of a key-pair join —
    the bitmap-index technique (roaring-lite) behind audience/segment
    intersection at warehouse scale.

    Each distinct (label, key) sets bit ``key mod 64`` of word
    ``key div 64``; per-(label, word) ``bit_or`` folds the audience into
    words, and the pair intersection is ``sum(bit_count(word_a & word_b))``
    over the word join.  Output: (type_a, type_b, n_a, n_b, n_both,
    jaccard_ppm) for pairs with n_both > 0, type_a < type_b.

    Scale shape: the key-distinct is the one data-scale shuffle; after it
    the frame is words (64x smaller than keys, denser for clustered key
    spaces).  The pair join runs on the WORD key — each word carries at
    most |labels| rows per side, so the join is |labels|^2-bounded per
    word, never |keys|^2.  Totals are label-cardinality metadata,
    broadcast back.  The word table is mergeable state: daily audiences
    OR together without rescanning events — the same contract as the KMV
    and CMS sketches.  Keys must be non-negative int64 (fixture ids);
    negative keys are filtered with NULLs.
    """
    au = (
        df.filter(F.col(key_col).isNotNull() & (F.col(key_col) >= 0)
                  & F.col(label_col).isNotNull())
        .select(F.col(label_col).alias("t"), F.col(key_col).alias("u"))
        .distinct()
    )
    words = au.groupBy(
        "t", F.expr("u DIV 64").alias("w")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(u % 64 AS INT))")
        ).alias("m")
    )
    words = materialized(words)
    totals = words.groupBy("t").agg(
        F.sum(F.bit_count("m")).alias("n")
    )
    wa = words.select(F.col("t").alias("type_a"), "w", F.col("m").alias("ma"))
    wb = words.select(F.col("t").alias("type_b"), "w", F.col("m").alias("mb"))
    both = (
        wa.join(wb, "w")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.sum(F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))).alias("n_both"))
        .where(F.col("n_both") > 0)
    )
    na = totals.select(F.col("t").alias("type_a"), F.col("n").alias("n_a"))
    nb = totals.select(F.col("t").alias("type_b"), F.col("n").alias("n_b"))
    return (
        both.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr("1000000 * n_both DIV (n_a + n_b - n_both)").alias(
                "jaccard_ppm"
            ),
        )
    )


def bitmap_audience_overlap_sql(
    table: str = "events",
    label_col: str = "event_type",
    key_col: str = "user_id",
) -> str:
    """Oracle twin: the quadratic set-intersection DEFINITION — a driver
    pass proves the bitmap-word algebra loses no key and double-counts
    none."""
    return f"""
WITH au AS (
  SELECT DISTINCT {label_col} AS t, {key_col} AS u FROM {table}
  WHERE {key_col} IS NOT NULL AND {key_col} >= 0
    AND {label_col} IS NOT NULL
),
n AS (SELECT t, count(*) AS n FROM au GROUP BY 1),
ov AS (
  SELECT a.t AS type_a, b.t AS type_b, count(*) AS n_both
  FROM au a JOIN au b ON a.u = b.u AND a.t < b.t
  GROUP BY 1, 2
)
SELECT type_a, type_b,
       CAST(na.n AS BIGINT) AS n_a,
       CAST(nb.n AS BIGINT) AS n_b,
       CAST(n_both AS BIGINT) AS n_both,
       1000000 * n_both // (na.n + nb.n - n_both) AS jaccard_ppm
FROM ov
JOIN n na ON na.t = type_a
JOIN n nb ON nb.t = type_b
"""


# ---------------------------------------------------------------------------
# HyperLogLog-shaped register sketch (deterministic, hash-checkable).

# alpha_512 = 0.7213 / (1 + 1.079/512), floored to ppm — pinned as an
# integer so both engines compute the identical estimate.
HLL_ALPHA_PPM = 719_783
HLL_P_BITS = 9  # 512 registers
HLL_SUF_BITS = 22  # kmv_hash yields 31 bits; 9 go to the register index
HLL_RHO_EMPTY = HLL_SUF_BITS + 1  # all-zero suffix
HLL_POWB = HLL_RHO_EMPTY  # 2^(POWB - rho) stays integral for every rho


def _hll_rho() -> "F.Column":
    """rho from a ``suf`` column — the ONE definition both sketch shapes
    (and their tests) share; the streaming kernel mirrors it in numpy."""
    return (
        F.when(F.col("suf") == 0, F.lit(HLL_RHO_EMPTY))
        .otherwise(F.expr("bit_count((suf & -suf) - 1) + 1"))
    )


def _hll_est_expr(n_hit: str, s_hit: str) -> str:
    """Spark SQL fragment for the raw integer estimator over (n_hit,
    s_hit) columns — shared by the grouped and ungrouped sketches."""
    m = 1 << HLL_P_BITS
    pow_full = 1 << HLL_POWB
    return (
        f"CAST({HLL_ALPHA_PPM} AS BIGINT) * {m} * {m} * {pow_full}"
        f" DIV (coalesce({s_hit}, 0)"
        f"      + ({m} - {n_hit}) * CAST({pow_full} AS BIGINT))"
    )


_HLL_RHO_SQL = (
    f"CASE WHEN suf = 0 THEN {HLL_RHO_EMPTY} "
    "ELSE bit_count((suf & (-suf)) - 1) + 1 END"
)


def _hll_est_sql(n_hit: str, s_hit: str) -> str:
    m = 1 << HLL_P_BITS
    pow_full = 1 << HLL_POWB
    return (
        f"CAST(CAST({HLL_ALPHA_PPM} AS BIGINT) * {m} * {m} * {pow_full}"
        f" // (coalesce({s_hit}, 0) + ({m} - {n_hit}) * {pow_full})"
        " AS BIGINT)"
    )


def hll_register_sketch(df: DataFrame, key_col: str) -> DataFrame:
    """HyperLogLog-shaped distinct-count sketch with a fully DETERMINISTIC
    estimate: 512 registers, register = h mod 512, rho = trailing-zero
    count of the remaining 22 hash bits + 1 (the Flajolet least-significant
    -1-bit observable — same geometric law as HLL's leading-zero rank, and
    computable exactly in int64: ``bit_count((suf & -suf) - 1) + 1``).

    The register table M_j = max(rho) is THE sketch: 512 int64s, additive
    under max — per-partition / per-day sketches merge without rescanning,
    the same mergeable-state contract as KMV/CMS.  The raw HLL estimator
    alpha_m * m^2 / sum_j 2^(-M_j) is evaluated in pure integer arithmetic
    (numerator alpha_ppm * m^2 * 2^POWB ~ 1.6e18 fits int64), so even the
    ESTIMATE hash-checks across engines.  No small-range/large-range
    correction is applied (raw estimator; the exact control column
    quantifies the error), and the 31-bit frozen hash caps usable
    cardinality around 1e8 — at true 100 TB scale swap in a 64-bit frozen
    hash, same algebra.

    Output (1 row): n_registers_hit, max_rho, est_distinct_x1e6 (the raw
    estimate in millionths), exact_distinct (control).

    Scale shape: one narrow projection + a 512-group aggregate + 1-row
    folds; the exact control's distinct is the only data-scale shuffle —
    drop it in production and the sketch never shuffles more than 512 rows.
    """
    m = 1 << HLL_P_BITS
    base = df.filter(F.col(key_col).isNotNull()).select(
        kmv_hash(key_col).alias("h")
    )
    regs = base.select(
        F.expr(f"h % {m}").alias("reg"),
        F.expr(f"h DIV {m}").alias("suf"),
    )
    mtab = regs.select("reg", _hll_rho().alias("rho")).groupBy("reg").agg(
        F.max("rho").alias("M")
    )
    stats = mtab.agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.max("M").alias("max_rho"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_POWB} - M)")).alias(
            "__s_hit"
        ),
    )
    exact = df.filter(F.col(key_col).isNotNull()).agg(
        F.countDistinct(key_col).alias("exact_distinct")
    )
    pow_full = 1 << HLL_POWB
    return (
        stats.crossJoin(F.broadcast(exact))
        .select(
            F.col("n_hit").cast("long").alias("n_registers_hit"),
            F.col("max_rho").cast("long").alias("max_rho"),
            F.expr(_hll_est_expr("n_hit", "__s_hit")).alias(
                "est_distinct_x1e6"
            ),
            F.col("exact_distinct").cast("long"),
        )
    )


def hll_register_sketch_sql(table: str, key_col: str) -> str:
    """Oracle twin: identical registers, rho, and integer estimator."""
    m = 1 << HLL_P_BITS
    pow_full = 1 << HLL_POWB
    h = kmv_hash_sql(key_col)
    return f"""
WITH base AS (
  SELECT {h} AS h FROM {table} WHERE {key_col} IS NOT NULL
),
regs AS (SELECT h % {m} AS reg, h // {m} AS suf FROM base),
mtab AS (
  SELECT reg, max({_HLL_RHO_SQL}) AS M
  FROM regs GROUP BY 1
),
stats AS (
  SELECT count(*) AS n_hit, max(M) AS max_rho,
         sum(({pow_full} // (CAST(1 AS BIGINT) << M))) AS s_hit
  FROM mtab
),
ex AS (
  SELECT count(DISTINCT {key_col}) AS exact_distinct FROM {table}
  WHERE {key_col} IS NOT NULL
)
SELECT CAST(n_hit AS BIGINT) AS n_registers_hit,
       CAST(max_rho AS BIGINT) AS max_rho,
       {_hll_est_sql("n_hit", "s_hit")} AS est_distinct_x1e6,
       CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM stats, ex
"""


def hll_register_sketch_grouped(
    df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Per-GROUP HLL registers — the form the sketch ships in production
    (distinct users per event type / per day): each group carries AT MOST
    512 register rows of state, mergeable under max across partitions,
    days, or sources.  Same frozen hash, rho, and integer estimator as
    :func:`hll_register_sketch`; the exact control is emitted per group.
    Output: (group, n_registers_hit, est_distinct_x1e6, exact_distinct).
    """
    m = 1 << HLL_P_BITS
    pow_full = 1 << HLL_POWB
    base = df.filter(
        F.col(key_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("g"), kmv_hash(key_col).alias("h"))
    regs = base.select(
        "g",
        F.expr(f"h % {m}").alias("reg"),
        F.expr(f"h DIV {m}").alias("suf"),
    )
    mtab = (
        regs.select("g", "reg", _hll_rho().alias("rho"))
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("M"))
    )
    stats = mtab.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_POWB} - M)")).alias(
            "__s_hit"
        ),
    )
    # control column counts distinct KEYS, same meaning as the ungrouped
    # variant's control (ADVICE r05: counting distinct hashes here would
    # silently diverge from it past MINHASH_P-collision scale)
    exact = (
        df.filter(F.col(key_col).isNotNull() & F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("g"))
        .agg(F.countDistinct(key_col).alias("exact_distinct"))
    )
    return stats.join(exact, "g").select(
        F.col("g").alias(group_col),
        F.col("n_hit").cast("long").alias("n_registers_hit"),
        F.expr(_hll_est_expr("n_hit", "__s_hit")).alias(
            "est_distinct_x1e6"
        ),
        F.col("exact_distinct").cast("long"),
    )


def hll_register_sketch_grouped_sql(
    table: str, group_col: str, key_col: str, include_exact: bool = True
) -> str:
    """``include_exact=False`` drops the exact-control column — the
    streaming twin's fixed-size state cannot carry an exact distinct."""
    m = 1 << HLL_P_BITS
    pow_full = 1 << HLL_POWB
    h = kmv_hash_sql(key_col)
    exact_col = (
        ",\n       CAST(exact_distinct AS BIGINT) AS exact_distinct"
        if include_exact
        else ""
    )
    exact_join = " JOIN ex USING (g)" if include_exact else ""
    return f"""
WITH base AS (
  SELECT {group_col} AS g, {h} AS h FROM {table}
  WHERE {key_col} IS NOT NULL AND {group_col} IS NOT NULL
),
regs AS (SELECT g, h % {m} AS reg, h // {m} AS suf FROM base),
mtab AS (
  SELECT g, reg, max({_HLL_RHO_SQL}) AS M
  FROM regs GROUP BY 1, 2
),
stats AS (
  SELECT g, count(*) AS n_hit,
         sum(({pow_full} // (CAST(1 AS BIGINT) << M))) AS s_hit
  FROM mtab GROUP BY 1
),
ex AS (
  SELECT {group_col} AS g, count(DISTINCT {key_col}) AS exact_distinct
  FROM {table}
  WHERE {key_col} IS NOT NULL AND {group_col} IS NOT NULL GROUP BY 1
)
SELECT stats.g AS {group_col},
       CAST(n_hit AS BIGINT) AS n_registers_hit,
       {_hll_est_sql("n_hit", "s_hit")} AS est_distinct_x1e6{exact_col}
FROM stats{exact_join}
"""


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantiles: the mergeable-state quantile sketch.

HIST_BIN_CENTS = 12_800  # 128.00 currency units per bin


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    percentiles: tuple[int, ...] = (50, 90, 99),
    bin_cents: int = HIST_BIN_CENTS,
) -> DataFrame:
    """Quantiles from a FIXED-WIDTH-BIN histogram — the mergeable-state
    member of the quantile family (exact_quantiles is the exact
    distributed-selection path; quantiles_sampled the sampling path).
    State is the sparse (bin, count) table: fixed-width integer bins over
    exact cents, so histograms merge under plain count addition across
    partitions, days, or sources — the property a 100 TB rollup or a
    streaming twin leans on — and the answer degrades gracefully to bin
    resolution instead of failing.

    Per requested percentile p the report gives the bin containing the
    lower-nearest-rank order statistic (rank = ceil(n * p / 100), the
    exact_quantiles convention): (pct, bin_id, bin_lo_cents,
    bin_hi_cents, cum_count) — all exact integers, hash-checkable.

    Plan shape: one hash aggregate to the sparse bin table (map-side
    combine does the heavy lifting), then the cumulative window runs on
    bin-count rows — metadata-scale by construction (value range /
    bin width), the centroid/offset-table contract.
    """
    return histogram_quantile_finish(
        value_histogram(df, value_col, bin_cents), percentiles, bin_cents
    )


def value_histogram(
    df: DataFrame, value_col: str, bin_cents: int = HIST_BIN_CENTS
) -> DataFrame:
    """The sparse (bin_id, n) state: one hash aggregate, mergeable under
    count addition — usable as a batch aggregate or a streaming one (the
    stream twin runs exactly this groupBy in complete mode)."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    # non-negative domain ONLY: Spark's DIV truncates toward zero while
    # SQL's // floors, so negative cents would bin differently per engine;
    # the guard makes the contract total (negative values are excluded on
    # both sides, not mis-binned on one)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(cents.alias("__c"))
        .where(F.col("__c") >= 0)
        .select(F.expr(f"__c DIV {bin_cents}").alias("bin_id"))
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_quantile_finish(
    hist: DataFrame,
    percentiles: tuple[int, ...] = (50, 90, 99),
    bin_cents: int = HIST_BIN_CENTS,
) -> DataFrame:
    """Quantile selection over a (bin_id, n) histogram: cumulative counts
    run on bin-count rows (metadata-scale single-partition window, the
    centroid/offset contract), lower-nearest-rank bin per percentile."""
    from pyspark.sql import Window

    w = Window.orderBy("bin_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy())
    )
    pcts = hist.sparkSession.createDataFrame(
        [(p,) for p in percentiles], "pct int"
    )
    hits = (
        cum.crossJoin(F.broadcast(pcts))
        .where(
            F.col("cum")
            >= F.expr("CAST((total * pct + 99) DIV 100 AS LONG)")
        )
        .groupBy("pct")
        .agg(F.min("bin_id").alias("bin_id"))
    )
    return (
        hits.join(cum.select("bin_id", "cum"), "bin_id")
        .select(
            F.col("pct").cast("long").alias("pct"),
            F.col("bin_id"),
            (F.col("bin_id") * bin_cents).alias("bin_lo_cents"),
            ((F.col("bin_id") + 1) * bin_cents).alias("bin_hi_cents"),
            F.col("cum").alias("cum_count"),
        )
    )


def histogram_quantiles_sql(
    table: str,
    value_col: str,
    percentiles: tuple[int, ...] = (50, 90, 99),
    bin_cents: int = HIST_BIN_CENTS,
) -> str:
    """Oracle twin: identical bins, cumulative counts, and
    lower-nearest-rank bin selection."""
    pct_rows = ", ".join(f"({p})" for p in percentiles)
    return f"""
WITH hist AS (
  SELECT CAST(floor({value_col} * 100 + 0.5) AS BIGINT) // {bin_cents}
           AS bin_id,
         count(*) AS n
  FROM {table}
  WHERE {value_col} IS NOT NULL
    AND CAST(floor({value_col} * 100 + 0.5) AS BIGINT) >= 0
  GROUP BY 1
),
cum AS (
  SELECT bin_id, n,
         sum(n) OVER (ORDER BY bin_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(n) OVER () AS total
  FROM hist
),
pcts(pct) AS (VALUES {pct_rows}),
hits AS (
  SELECT pct, min(bin_id) AS bin_id
  FROM cum, pcts
  WHERE cum >= (total * pct + 99) // 100
  GROUP BY pct
)
SELECT CAST(h.pct AS BIGINT) AS pct, CAST(c.bin_id AS BIGINT) AS bin_id,
       CAST(c.bin_id * {bin_cents} AS BIGINT) AS bin_lo_cents,
       CAST((c.bin_id + 1) * {bin_cents} AS BIGINT) AS bin_hi_cents,
       CAST(c.cum AS BIGINT) AS cum_count
FROM hits h JOIN cum c USING (bin_id)
"""


def grouped_histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: tuple[int, ...] = (50, 90, 99),
    bin_cents: int = HIST_BIN_CENTS,
) -> DataFrame:
    """Per-GROUP fixed-bin histogram quantiles — the form the mergeable
    quantile sketch ships in production (per-segment price/latency
    percentiles): state is the sparse (group, bin, count) table, still
    count-additive under merge; the cumulative window partitions by
    group (never a single-partition sort), and each group reports its
    lower-nearest-rank bin per percentile.  Output: (group, pct, bin_id,
    bin_lo_cents, bin_hi_cents, cum_count) — exact integers throughout.
    """
    from pyspark.sql import Window

    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    hist = (
        df.where(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("__g"), cents.alias("__c"))
        .where(F.col("__c") >= 0)
        .select("__g", F.expr(f"__c DIV {bin_cents}").alias("bin_id"))
        .groupBy("__g", "bin_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("bin_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy("__g"))
    )
    pcts = df.sparkSession.createDataFrame(
        [(p,) for p in percentiles], "pct int"
    )
    hits = (
        cum.crossJoin(F.broadcast(pcts))
        .where(
            F.col("cum")
            >= F.expr("CAST((total * pct + 99) DIV 100 AS LONG)")
        )
        .groupBy("__g", "pct")
        .agg(F.min("bin_id").alias("bin_id"))
    )
    return (
        hits.join(cum.select("__g", "bin_id", "cum"), ["__g", "bin_id"])
        .select(
            F.col("__g").alias(group_col),
            F.col("pct").cast("long").alias("pct"),
            F.col("bin_id"),
            (F.col("bin_id") * bin_cents).alias("bin_lo_cents"),
            ((F.col("bin_id") + 1) * bin_cents).alias("bin_hi_cents"),
            F.col("cum").alias("cum_count"),
        )
    )


def grouped_histogram_quantiles_sql(
    table: str,
    group_col: str,
    value_col: str,
    percentiles: tuple[int, ...] = (50, 90, 99),
    bin_cents: int = HIST_BIN_CENTS,
) -> str:
    """Oracle twin: identical per-group bins, cumulative counts, and
    lower-nearest-rank selection (every output CAST to BIGINT — the
    windowed-sum HUGEINT guard)."""
    pct_rows = ", ".join(f"({p})" for p in percentiles)
    return f"""
WITH hist AS (
  SELECT {group_col} AS g,
         CAST(floor({value_col} * 100 + 0.5) AS BIGINT) // {bin_cents}
           AS bin_id,
         count(*) AS n
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {group_col} IS NOT NULL
    AND CAST(floor({value_col} * 100 + 0.5) AS BIGINT) >= 0
  GROUP BY 1, 2
),
cum AS (
  SELECT g, bin_id, n,
         sum(n) OVER (PARTITION BY g ORDER BY bin_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(n) OVER (PARTITION BY g) AS total
  FROM hist
),
pcts(pct) AS (VALUES {pct_rows}),
hits AS (
  SELECT g, pct, min(bin_id) AS bin_id
  FROM cum, pcts
  WHERE cum >= (total * pct + 99) // 100
  GROUP BY g, pct
)
SELECT h.g AS {group_col}, CAST(h.pct AS BIGINT) AS pct,
       CAST(c.bin_id AS BIGINT) AS bin_id,
       CAST(c.bin_id * {bin_cents} AS BIGINT) AS bin_lo_cents,
       CAST((c.bin_id + 1) * {bin_cents} AS BIGINT) AS bin_hi_cents,
       CAST(c.cum AS BIGINT) AS cum_count
FROM hits h JOIN cum c ON h.g = c.g AND h.bin_id = c.bin_id
"""
