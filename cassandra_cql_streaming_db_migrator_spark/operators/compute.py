"""Computed ("calculated") columns (SURVEY §2.3 P3).

The reference compiles one MVEL expression per target column
(DefaultMigratorPlugin.java:137-173) and evaluates it per row against the
referenced source columns (DMP:367-387).  The canonical shipped example is a
string -> hash-bucket SMALLINT (migration-config.example.yaml:105-120):

    int hash = row.my_col.hashCode();
    if (hash < 0) { hash = hash * -1; }
    hash = hash % 32;
    return (short) hash;

Spark-first translation: SQL-expressible rules go through ``F.expr`` (stay in
whole-stage codegen); procedural rules register as named Python transforms
(pandas_udf territory).  The hashCode example itself is expressible with
higher-order functions — see ``java_string_hashcode``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.mvel import translate_mvel

# registry for procedural rules — the engine's analog of the reference's
# reflective plugin loading (TableDataMigratorPluginDefinition.java:32-53)
_TRANSFORM_REGISTRY: dict[str, Callable[[DataFrame], Column]] = {}


def register_transform(name: str, fn: Callable[[DataFrame], Column]) -> None:
    _TRANSFORM_REGISTRY[name] = fn


def java_string_hashcode(col: Column | str) -> Column:
    """Java ``String.hashCode`` semantics, JVM-side and vectorized.

    hashCode folds ``h = 31*h + unit`` over UTF-16 CODE UNITS in wrapping
    int32 arithmetic.  ``split('')`` yields code POINTS, so supplementary-
    plane characters (emoji etc.) must fold as their surrogate PAIR —
    hi = 0xD800 + ((cp-0x10000) >> 10), lo = 0xDC00 + ((cp-0x10000) & 0x3FF)
    — two fold steps, exactly what the JVM sees.  We fold in int64 and
    reduce mod 2^32 each step (bounded accumulator, no ANSI overflow), then
    map into signed int32 range — bit-identical to the JVM result for ANY
    string (property-tested over ASCII/BMP/supplementary inputs).

    Runs entirely in Catalyst higher-order functions (aggregate over the
    char array) — no Python, scales with codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.filter(F.split(c, ""), lambda x: x != F.lit(""))

    def step(acc: Column, ch: Column) -> Column:
        cp = F.ascii(ch).cast("long")
        one = (acc * F.lit(31) + cp) % F.lit(4294967296)
        off = cp - F.lit(0x10000)
        hi = F.lit(0xD800) + F.shiftright(off, 10)
        lo = F.lit(0xDC00) + off.bitwiseAND(F.lit(0x3FF))
        # (acc*31 + hi)*31 + lo <= 2^32*31*31 + small — well inside int64
        two = ((acc * F.lit(31) + hi) * F.lit(31) + lo) % F.lit(4294967296)
        return F.when(cp > F.lit(0xFFFF), two).otherwise(one)

    folded = F.aggregate(chars, F.lit(0).cast("long"), step)
    # map [0, 2^32) -> signed int32 two's-complement value, branch-free so
    # the interpreted fold is evaluated exactly once
    return (folded + F.lit(2147483648)) % F.lit(4294967296) - F.lit(2147483648)


def hash_bucket_column(col: Column | str, buckets: int = 32) -> Column:
    """The migration-config.example.yaml:112-120 rule: abs(hashCode) % N as a
    small int.  (Note: Java's ``hash * -1`` overflows for Integer.MIN_VALUE;
    we reproduce the *intended* abs-then-mod semantics in 64-bit, which
    agrees with the reference for every non-pathological hash.)"""
    h = java_string_hashcode(col)
    return (F.abs(h) % F.lit(buckets)).cast("int")


def with_computed_columns(df: DataFrame, calculated: dict[str, str]) -> DataFrame:
    """Apply the spec's calculated-column map.  Values are MVEL/SQL
    expression text, or ``python:<name>`` referencing a registered
    transform."""
    for name, rule in calculated.items():
        if rule.startswith("python:"):
            fn = _TRANSFORM_REGISTRY[rule[len("python:"):]]
            df = df.withColumn(name, fn(df))
        else:
            df = df.withColumn(name, F.expr(translate_mvel(rule)))
    return df
