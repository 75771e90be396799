"""Data-contract expectations: declarative row-level validation rules.

The reference validates SCHEMA compatibility at plan time
(DefaultMigratorPlugin.java:227-269: PK presence, column drops, type
checks); migrating 100 TB also needs DATA validation — the dbt/
Great-Expectations-shaped contract surface.  Each rule compiles to a
declarative Spark aggregate or anti-join (never a row loop), and the
report is one small (rule, n_violations) frame:

  * ``not_null(col)``        — count of NULLs;
  * ``unique(cols)``         — rows in excess of one per key
                               (count(*) - count(distinct key));
  * ``in_range(col, lo, hi)``— count outside [lo, hi] (NULLs are not
                               range violations — they are not_null's
                               job);
  * ``accepted_values``      — count outside the allow-list;
  * ``foreign_key``          — fact keys absent from the dimension
                               (left-anti count — the read twin of the
                               reference's IfNotExistFilter);
  * ``min_rows(n)``          — shortfall below a floor.

Scale: every same-table aggregate rule folds into ONE pass over that
table (a single hash aggregate computes all counts); each foreign_key
adds one anti-join whose dimension side broadcasts when small.  The
report is rule-count rows — metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    table: str
    kind: str  # not_null | unique | in_range | accepted_values | foreign_key | min_rows
    params: dict = field(default_factory=dict)


def _agg_expr(rule: Rule):
    p = rule.params
    if rule.kind == "not_null":
        return F.sum(
            F.when(F.col(p["col"]).isNull(), 1).otherwise(0)
        ).cast("long")
    if rule.kind == "unique":
        key = F.concat_ws(" ", *[F.col(c).cast("string") for c in p["cols"]])
        return (F.count(F.lit(1)) - F.countDistinct(key)).cast("long")
    if rule.kind == "in_range":
        c = F.col(p["col"])
        return F.sum(
            F.when(
                c.isNotNull() & ((c < F.lit(p["lo"])) | (c > F.lit(p["hi"]))),
                1,
            ).otherwise(0)
        ).cast("long")
    if rule.kind == "accepted_values":
        c = F.col(p["col"])
        return F.sum(
            F.when(c.isNotNull() & ~c.isin(*p["values"]), 1).otherwise(0)
        ).cast("long")
    if rule.kind == "min_rows":
        return F.greatest(
            F.lit(0).cast("long"),
            F.lit(p["n"]).cast("long") - F.count(F.lit(1)),
        )
    raise ValueError(f"unknown aggregate rule kind {rule.kind}")


def check_expectations(
    tables: dict[str, DataFrame], rules: list[Rule]
) -> DataFrame:
    """Run all rules; returns (rule, n_violations) — one aggregate pass
    per distinct table plus one anti-join per foreign_key rule."""
    frames: list[DataFrame] = []
    by_table: dict[str, list[Rule]] = {}
    for r in rules:
        if r.kind == "foreign_key":
            p = r.params
            fact, dim = tables[r.table], tables[p["ref_table"]]
            missing = (
                fact.where(F.col(p["col"]).isNotNull())
                .join(
                    dim.select(F.col(p["ref_col"]).alias(p["col"])),
                    on=p["col"],
                    how="left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            frames.append(missing)
        else:
            by_table.setdefault(r.table, []).append(r)
    for table, table_rules in by_table.items():
        wide = tables[table].agg(
            *[_agg_expr(r).alias(r.name) for r in table_rules]
        )
        frames.append(
            wide.select(
                F.expr(
                    "stack({n}, {cols}) AS (rule, n_violations)".format(
                        n=len(table_rules),
                        cols=", ".join(
                            f"'{r.name}', {r.name}" for r in table_rules
                        ),
                    )
                )
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out
