"""Single-parse SQL text builders for driver-held vector math.

Optimization-round finding (OPTIMIZATION_r12.md, guide §3.3/§7.3 "planning
time itself can become the bottleneck"): building centroid/codebook
expressions with the PySpark column DSL pays one py4j round trip per node —
``F.lit`` of an 8x64 nested list alone costs ~0.45 s, and every
``F.transform``/``F.aggregate`` lambda ~60 ms, all of it serial driver time
repeated per query build (bench reps, microbatch plan rebuilds, every
consumer of a shared operator).  Measured on this box: the
``distortion_frame`` tree took 2.0-2.3 s of pure Python/py4j construction
against 0.1 s of JVM analysis and 0.01 s of physical planning.

The same trees rendered as ONE SQL string and parsed JVM-side via a single
``F.expr`` call build in ~2 ms (parse is C-speed ANTLR work), a ~250x
reduction of driver plan-construction time.  The strings below render the
IDENTICAL Catalyst expressions the DSL builders produced — same fold
structure, same left-associative addition order, same casts — so every
double operation executes on the same operands in the same order and
results stay bit-identical (asserted by tests/test_sqlexpr_parity.py).

Only double literals need care: a bare ``0.0`` parses as DECIMAL in Spark
SQL, so every literal carries the ``D`` suffix (``repr(float)`` round-trips
the exact IEEE value through the parser).
"""

from __future__ import annotations

import math

__all__ = [
    "dlit",
    "arr_d",
    "arr_arr_d",
    "arr_l",
    "to_double_arr",
    "sq_dist",
    "ident",
]


def ident(name: str) -> str:
    """Backtick-quote a column identifier."""
    return "`" + name.replace("`", "``") + "`"


def dlit(v: float) -> str:
    """Exact double literal: ``repr`` round-trips the IEEE value and the
    ``D`` suffix keeps the parser from reading it as DECIMAL."""
    v = float(v)
    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(v):
        return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
    return repr(v) + "D"


def arr_d(vals) -> str:
    """``array<double>`` literal."""
    return "array(" + ",".join(dlit(v) for v in vals) + ")"


def arr_arr_d(vv) -> str:
    """``array<array<double>>`` literal (codebooks, centroid lists)."""
    return "array(" + ",".join(arr_d(v) for v in vv) + ")"


def arr_l(vals) -> str:
    """``array<bigint>`` literal."""
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def to_double_arr(col_sql: str) -> str:
    """``transform(col, x -> CAST(x AS DOUBLE))`` — the engine's standard
    float->double promotion of a vector column."""
    return f"transform({col_sql}, x -> CAST(x AS DOUBLE))"


def sq_dist(vec_sql: str, cent_sql: str) -> str:
    """Sequential-fold squared L2 distance — the exact tree
    ``operators.clustering._sq_dist`` builds: elementwise (a-b)*(a-b) then a
    left fold ``acc + x`` from 0.0D, so the addition order (and therefore
    every rounding step) matches the DSL builder and the DuckDB oracles."""
    return (
        f"aggregate(zip_with({vec_sql}, {cent_sql}, "
        f"(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x)"
    )
