"""Named query registry backing ``__spark_entry__.py``.

Each ``QueryDef`` pairs a PySpark implementation (built from the operator
library) with an equivalent ANSI-SQL oracle for DuckDB.  Numeric discipline
for oracle parity (values must hash-match bit-for-bit):

  * SUMs over doubles are order-dependent across engines -> cast the per-row
    value to DECIMAL (exact, associative) before summing, in BOTH the Spark
    code and the oracle SQL;
  * per-row double arithmetic (products, divisions) is deterministic given
    identical operands -> safe un-rounded;
  * averages = decimal sum cast to double / count, rounded;
  * every LIMIT carries a total ORDER with tiebreaker;
  * aggregate/computed columns aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> driver records a rows-only check
    description: str = ""
    bench: bool = True  # include in bench.py headline set


def all_queries() -> dict[str, QueryDef]:
    from . import llm, reference, relational, streaming

    out: dict[str, QueryDef] = {}
    for mod in (reference, relational, llm, streaming):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name {q.name}")
            out[q.name] = q
    return out
