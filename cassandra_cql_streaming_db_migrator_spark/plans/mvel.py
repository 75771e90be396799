"""MVEL -> Spark SQL expression translation.

The reference embeds MVEL twice with a shared convention — filter predicates
(FieldValueFilter.java:52-64) and calculated columns
(DefaultMigratorPlugin.java:137-173) — where ``row.<col>`` references name
source columns (CassandraSchemaUtil.java:26-28,58-65).

Our engine's expression language is Spark SQL (``F.expr``), a strict superset
of what the reference's shipped examples use.  This module translates the
*declarative subset* of MVEL that appears in reference configs
(config/migration-config.example.yaml:78,95) into Spark SQL text:

    row.clust_key_col_2 >= 3000 && row.clust_key_col_2 < 10000
        -> clust_key_col_2 >= 3000 AND clust_key_col_2 < 10000

Procedural MVEL (multi-statement blocks, e.g. the hashCode bucket example at
migration-config.example.yaml:112-120) is out of scope for textual
translation — those rules are registered as named Python transforms
(see plans.spec: ``computed_columns`` accepts either an expression string or
a ``python:<registry-name>`` reference), mirroring the reference's plugin
escape hatch (IMigratorPlugin / reflective class loading,
TableDataMigratorPluginDefinition.java:32-53).
"""

from __future__ import annotations

import re

_ROW_REF = re.compile(r"\brow\.([A-Za-z_][A-Za-z0-9_]*)")

_REPLACEMENTS = [
    (re.compile(r"&&"), " AND "),
    (re.compile(r"\|\|"), " OR "),
    (re.compile(r"(?<![<>=!])!(?!=)"), " NOT "),  # unary ! but not !=
    (re.compile(r"\bnull\b"), "NULL"),
    (re.compile(r"\btrue\b"), "TRUE"),
    (re.compile(r"\bfalse\b"), "FALSE"),
]

# MVEL exposes the JVM String API on values; map the methods seen in the
# wild to Spark SQL functions.  ``x.method(args)`` -> ``fn(x, args)``.
_METHOD_MAP = {
    "toLowerCase": "lower",
    "toUpperCase": "upper",
    "trim": "trim",
    "length": "length",
    "contains": "contains",
    "startsWith": "startswith",
    "endsWith": "endswith",
    "replace": "replace",  # Java String.replace is literal, like SQL replace
}

# Methods whose JVM semantics need more than a function rename: Java
# substring/indexOf are 0-based (SQL is 1-based, instr returns 0 when
# absent == Java's -1 after the shift) and equalsIgnoreCase folds case on
# both sides.  Each formatter receives (receiver, [args]).
_METHOD_SPECIAL = {
    "substring": lambda r, a: (
        f"substring({r}, ({a[0]}) + 1)"
        if len(a) == 1
        else f"substring({r}, ({a[0]}) + 1, ({a[1]}) - ({a[0]}))"
    ),
    "indexOf": lambda r, a: f"(instr({r}, {a[0]}) - 1)",
    "equalsIgnoreCase": lambda r, a: f"(lower({r}) = lower({a[0]}))",
}

# receiver is an identifier or an already-translated call like lower(s) /
# upper(trim(s)) — parens nested up to two levels (deeper chains belong in a
# registered Python transform, like the reference's procedural MVEL blocks)
_RECV = r"[A-Za-z_][A-Za-z0-9_]*(?:\((?:[^()]|\([^()]*\))*\))?"
_METHOD_RE = re.compile(
    rf"({_RECV})\.("
    + "|".join(list(_METHOD_MAP) + list(_METHOD_SPECIAL))
    + r")\(([^()]*)\)"
)


def referenced_columns(mvel: str) -> list[str]:
    """Columns referenced as ``row.X`` — the reference finds these by regex
    (CassandraSchemaUtil.java:58-65) to marshal only needed columns; Catalyst
    derives the same set from expression references, so this is used only for
    plan-time validation messages."""
    seen: list[str] = []
    for m in _ROW_REF.finditer(mvel):
        if m.group(1) not in seen:
            seen.append(m.group(1))
    return seen


def translate_mvel(mvel: str) -> str:
    """Translate declarative MVEL (comparisons, boolean ops, arithmetic,
    string methods) into an equivalent Spark SQL expression string."""
    out = _ROW_REF.sub(r"\1", mvel)

    def method_sub(m: re.Match) -> str:
        recv, meth, args = m.group(1), m.group(2), m.group(3)
        if meth in _METHOD_SPECIAL:
            arg_list = [a.strip() for a in args.split(",") if a.strip()]
            return _METHOD_SPECIAL[meth](recv, arg_list)
        fn = _METHOD_MAP[meth]
        return f"{fn}({recv}, {args})" if args.strip() else f"{fn}({recv})"

    prev = None
    while prev != out:  # fixpoint, one innermost call at a time so chains
        prev = out      # like s.trim().toUpperCase() nest correctly
        out = _METHOD_RE.sub(method_sub, out, count=1)

    for pat, repl in _REPLACEMENTS:
        out = pat.sub(repl, out)
    return re.sub(r"\s+", " ", out).strip()
