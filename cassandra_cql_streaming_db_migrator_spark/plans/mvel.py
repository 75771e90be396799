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
migration-config.example.yaml:112-120) is translated by
``translate_mvel_block``: local variable declarations, (compound)
assignments, ``if``/``else`` blocks over assignments, and a final
``return`` fold into ONE Spark SQL expression by sequential substitution —
each variable reference is replaced by the SQL text that currently defines
it, and an ``if`` merges its branch environments with a conditional.  The
result stays declarative (whole-stage codegen), which is the Spark-first
answer to the reference's row-at-a-time MVEL interpreter.

Blocks beyond this subset (loops, method calls with side effects, early
returns) still go through the registry escape hatch (see plans.spec:
``computed_columns`` accepts ``python:<registry-name>``), mirroring the
reference's plugin loading (TableDataMigratorPluginDefinition.java:32-53).
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
def _java_hashcode_sql(recv: str) -> str:
    """``String.hashCode`` as Spark SQL text — the same UTF-16 code-unit
    fold as :func:`operators.compute.java_string_hashcode` (31*h + unit in
    wrapping int32, supplementary codepoints folded as their surrogate
    pair), expressed with SQL higher-order functions so procedural MVEL
    blocks stay inside whole-stage codegen."""
    unit = "CAST(ascii(ch) AS BIGINT)"
    folded = (
        f"aggregate(filter(split({recv}, ''), x -> x != ''), CAST(0 AS BIGINT), "
        f"(acc, ch) -> IF(ascii(ch) > 65535, "
        f"((acc * 31 + (55296 + shiftright({unit} - 65536, 10))) * 31"
        f" + (56320 + (({unit} - 65536) & 1023))) % 4294967296, "
        f"(acc * 31 + {unit}) % 4294967296))"
    )
    # branch-free signed-int32 mapping so the interpreted fold is written
    # (and evaluated) exactly once
    return f"(({folded} + 2147483648) % 4294967296 - 2147483648)"


_METHOD_SPECIAL = {
    "substring": lambda r, a: (
        f"substring({r}, ({a[0]}) + 1)"
        if len(a) == 1
        else f"substring({r}, ({a[0]}) + 1, ({a[1]}) - ({a[0]}))"
    ),
    "indexOf": lambda r, a: f"(instr({r}, {a[0]}) - 1)",
    "equalsIgnoreCase": lambda r, a: f"(lower({r}) = lower({a[0]}))",
    "hashCode": lambda r, a: _java_hashcode_sql(r),
}

# java.lang.Math statics seen in MVEL expressions -> SQL functions.  Plain
# textual call-site rewrites (``Math`` is not a value receiver).
_MATH_STATICS = [
    ("Math.abs(", "abs("),
    ("Math.max(", "greatest("),
    ("Math.min(", "least("),
    ("Math.floor(", "floor("),
    ("Math.ceil(", "ceil("),
    ("Math.pow(", "power("),
    ("Math.sqrt(", "sqrt("),
]

# receiver is an identifier or an already-translated call like lower(s) /
# upper(trim(s)) — parens nested up to two levels (deeper chains belong in a
# registered Python transform, like the reference's procedural MVEL blocks)
_RECV = r"[A-Za-z_][A-Za-z0-9_]*(?:\((?:[^()]|\([^()]*\))*\))?"
# args may contain calls with parens nested up to two levels (a rewritten
# ternary like IF(a, b, c) appears here); the fixpoint loop in
# _translate_expr re-scans, so an inner untranslated chain inside the args
# still resolves on a later pass
_ARGS = r"(?:[^()]|\((?:[^()]|\([^()]*\))*\))*"
_METHOD_RE = re.compile(
    rf"({_RECV})\.("
    + "|".join(list(_METHOD_MAP) + list(_METHOD_SPECIAL))
    + rf")\(({_ARGS})\)"
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


# String literals are masked to opaque tokens before ANY parsing or
# rewriting (statement splitting, keyword replacement, variable
# substitution), then restored at the very end — so a ';' or 'true' or a
# variable-looking word inside a quoted string is never touched.
# backslash escapes ('it\'s', "a\"b") stay inside the literal
_LITERAL_RE = re.compile(r"'(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"")


def _mask_literals(s: str) -> tuple[str, list[str]]:
    lits: list[str] = []

    def repl(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"__lit{len(lits) - 1}__"

    return _LITERAL_RE.sub(repl, s), lits


def _restore_literals(s: str, lits: list[str]) -> str:
    # single regex pass: re.sub never re-scans replacement text, so a
    # literal whose CONTENT looks like a later placeholder is left alone
    return re.sub(r"__lit(\d+)__", lambda m: lits[int(m.group(1))], s)


def translate_mvel(mvel: str) -> str:
    """Translate MVEL into an equivalent Spark SQL expression string.

    Declarative expressions (comparisons, boolean ops, arithmetic, string
    methods) translate token-wise; multi-statement procedural blocks are
    dispatched to :func:`translate_mvel_block`.
    """
    masked, lits = _mask_literals(mvel)
    if _looks_procedural(masked):
        return _restore_literals(_translate_block_masked(masked), lits)
    return _restore_literals(_translate_expr(masked), lits)


def _rewrite_in_groups(s: str, fn) -> str:
    """Apply ``fn`` to the contents of every parenthesized and bracketed
    group (the callers then rewrite the depth-0 text themselves).  Raises
    on an unclosed group instead of silently truncating/fabricating."""
    pairs = {"(": ")", "[": "]"}
    parts: list[str] = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch in pairs:
            close = pairs[ch]
            depth, j = 1, i + 1
            while j < len(s) and depth:
                if s[j] == ch:
                    depth += 1
                elif s[j] == close:
                    depth -= 1
                j += 1
            if depth:
                raise MvelTranslationError(
                    f"unbalanced {ch!r} in MVEL expression: {s!r}"
                )
            parts.append(ch + fn(s[i + 1 : j - 1]) + close)
            i = j
        else:
            parts.append(ch)
            i += 1
    return "".join(parts)


def _split_commas(s: str) -> list[str]:
    """Split on ',' at paren/bracket depth 0."""
    out: list[str] = []
    depth = 0
    last = 0
    for i, ch in enumerate(s):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[last:i])
            last = i + 1
    out.append(s[last:])
    return out


def _rewrite_ternaries(s: str) -> str:
    """MVEL/Java ``cond ? a : b`` -> ``IF(cond, a, b)``, right-associative,
    nesting via recursion (including inside parenthesized and bracketed
    groups).  Runs on literal-masked text, so '?'/':' inside strings are
    never seen.  A ternary never crosses a top-level ',' — each function
    argument rewrites independently."""
    s = _rewrite_in_groups(s, _rewrite_ternaries)
    segs = _split_commas(s)
    if len(segs) > 1:
        return ",".join(_rewrite_ternary_segment(seg) for seg in segs)
    return _rewrite_ternary_segment(s)


def _rewrite_ternary_segment(s: str) -> str:
    depth = 0
    for i, ch in enumerate(s):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "?" and depth == 0:
            nest = 0
            d2 = 0
            for j in range(i + 1, len(s)):
                c2 = s[j]
                if c2 in "([":
                    d2 += 1
                elif c2 in ")]":
                    d2 -= 1
                elif c2 == "?" and d2 == 0:
                    nest += 1
                elif c2 == ":" and d2 == 0:
                    if nest == 0:
                        cond = s[:i].strip()
                        then = _rewrite_ternaries(s[i + 1 : j].strip())
                        other = _rewrite_ternaries(s[j + 1 :].strip())
                        return f"IF({cond}, {then}, {other})"
                    nest -= 1
            raise MvelTranslationError(f"ternary '?' without matching ':': {s!r}")
    return s


# boundaries with lower precedence than '+': a +-chain never crosses these
_SEGMENT_RE = re.compile(r"(==|!=|<=|>=|<(?!=)|>(?!=)|&&|\|\||,)")


# method chains whose result is a string — evidence that a '+'-chain
# containing them concatenates (length()/indexOf()/hashCode() return ints,
# so a chain over those stays arithmetic)
_STRING_RETURNING = {
    "trim",
    "toUpperCase",
    "toLowerCase",
    "substring",
    "replace",
    "concat",
    "toString",
}


def _is_stringy(op: str) -> bool:
    """Stringness of a ``+`` operand is textually evident: a masked string
    literal, the same wrapped in parens, a string-returning method chain on
    a literal, or an already-rewritten ``concat(...)`` group."""
    t = op.strip()
    while t.startswith("(") and t.endswith(")"):
        depth = 0
        whole = True
        for i, ch in enumerate(t):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i < len(t) - 1:
                    whole = False
                    break
        if not whole:
            break
        t = t[1:-1].strip()
    if re.fullmatch(r"__lit\d+__", t):
        return True
    if re.fullmatch(r"concat\s*\(.*\)", t, flags=re.S):
        return True
    if re.fullmatch(r"CAST\s*\(.*\bAS\s+STRING\s*\)", t, flags=re.S | re.I):
        return True
    # a string-returning JVM method chain is evidence regardless of the
    # receiver (trim/toUpperCase/... only exist on strings)
    m = re.fullmatch(
        r"(?:__lit\d+__|[A-Za-z_]\w*)"
        r"((?:\s*\.\s*[A-Za-z_]\w*\s*\((?:[^()]|\([^()]*\))*\))+)",
        t,
    )
    if m:
        meths = re.findall(r"\.\s*([A-Za-z_]\w*)\s*\(", m.group(1))
        return all(name in _STRING_RETURNING for name in meths)
    return False


def _rewrite_string_concat(s: str) -> str:
    """Java's ``+`` CONCATENATES when an operand is a string — rewrite a
    top-level ``+``-chain to ``concat(...)`` when at least one operand's
    stringness is textually evident (see :func:`_is_stringy`).
    Purely-numeric chains and chains whose stringness is not evident from
    the text (two column refs) stay arithmetic — that case needs an
    explicit ``concat`` in the config."""
    s = _rewrite_in_groups(s, _rewrite_string_concat)

    # split into segments at comparison/boolean/comma boundaries; the
    # depth-0 guard in _split_depth0 keeps delimiters inside already
    # rewritten groups (e.g. 'IF(a, b, c) && d') from splitting
    out_segments: list[str] = []
    for segment in _split_depth0(s):
        if segment in ("==", "!=", "<=", ">=", "<", ">", "&&", "||", ","):
            out_segments.append(segment)
            continue
        ops = _split_plus_chain(segment)
        if len(ops) > 1 and any(_is_stringy(o) for o in ops):
            out_segments.append("concat(" + ", ".join(o.strip() for o in ops) + ")")
        else:
            out_segments.append(segment)
    return "".join(out_segments)


def _split_depth0(s: str) -> list[str]:
    """Split on _SEGMENT_RE matches at paren depth 0, keeping delimiters."""
    out: list[str] = []
    depth = 0
    last = 0
    i = 0
    while i < len(s):
        if s[i] in "([":
            depth += 1
        elif s[i] in ")]":
            depth -= 1
        elif depth == 0:
            m = _SEGMENT_RE.match(s, i)
            if m:
                out.append(s[last : i])
                out.append(m.group(0))
                i = m.end()
                last = i
                continue
        i += 1
    out.append(s[last:])
    return out


# a number ending in e/E right before a sign: the '+' is a scientific
# exponent (1e+6), not an operator.  The lookbehind keeps identifiers that
# merely END in a digit+e (x1e) from matching.
_EXPONENT_TAIL_RE = re.compile(r"(?<![\w.])\d+(?:\.\d+)?[eE]$")


def _split_plus_chain(segment: str) -> list[str]:
    """Split a segment on top-level binary '+' (not '+=', unary, or the
    sign of a scientific-notation exponent)."""
    ops: list[str] = []
    depth = 0
    last = 0
    for i, ch in enumerate(segment):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "+" and depth == 0:
            prev = segment[:i].rstrip()
            nxt = segment[i + 1 : i + 2]
            # binary only: something non-operator before, and not '+='
            if not prev or prev[-1] in "+-*/%=<>&|," or nxt == "=":
                continue
            if _EXPONENT_TAIL_RE.search(prev) and re.match(
                r"\s*\d", segment[i + 1 :]
            ):
                continue
            ops.append(segment[last:i])
            last = i + 1
    ops.append(segment[last:])
    return ops


def _rewrite_casts(s: str) -> str:
    """Java ``(type) primary`` -> ``CAST(primary AS T)`` anywhere in the
    expression.  Type names are Java keywords, so a parenthesized type
    token is unambiguous.  Rewrites the tail first so stacked casts
    (``(int)(long) x``) bind inside-out."""
    m = _ANY_CAST_RE.search(s)
    if not m:
        return s
    tail = _rewrite_casts(s[m.end() :])
    primary, rest = _split_primary(tail)
    if not primary:
        raise MvelTranslationError(f"cast with no operand: {s!r}")
    return f"{s[:m.start()]}CAST({primary} AS {_JAVA_TYPES[m.group(1)]}){rest}"


def _translate_expr(mvel: str) -> str:
    out = _rewrite_ternaries(_rewrite_casts(_ROW_REF.sub(r"\1", mvel)))
    out = _rewrite_string_concat(out)
    for java, sql in _MATH_STATICS:
        out = out.replace(java, sql)

    def method_sub(m: re.Match) -> str:
        recv, meth, args = m.group(1), m.group(2), m.group(3)
        if meth in _METHOD_SPECIAL:
            arg_list = [a.strip() for a in _split_commas(args) if a.strip()]
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


# ---------------------------------------------------------------------------
# Procedural blocks (migration-config.example.yaml:112-120 shape)
# ---------------------------------------------------------------------------

_JAVA_TYPES = {
    "short": "SMALLINT",
    "int": "INT",
    "long": "BIGINT",
    "byte": "TINYINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
    "String": "STRING",
}
_TYPE_ALT = "|".join(_JAVA_TYPES)
_INTEGRAL_TYPES = {"int", "long", "short", "byte"}
_DECL_RE = re.compile(
    rf"^({_TYPE_ALT}|var)\s+([A-Za-z_]\w*)\s*=\s*(.+)$", re.S
)
_COMPOUND_RE = re.compile(r"^([A-Za-z_]\w*)\s*([+\-*/%])=\s*(.+)$", re.S)
_ASSIGN_RE = re.compile(r"^([A-Za-z_]\w*)\s*=\s*(.+)$", re.S)
_RETURN_RE = re.compile(r"^return\s+(.+)$", re.S)
_ANY_CAST_RE = re.compile(rf"\(\s*({_TYPE_ALT})\s*\)\s*")


def _split_primary(s: str) -> tuple[str, str]:
    """Split ``s`` into its leading primary expression (what a Java cast
    binds to: optional unary minus + identifier with call/method chains, a
    parenthesized group, or a numeric literal) and the remainder."""
    i, n = 0, len(s)
    while i < n and s[i].isspace():
        i += 1
    start = i
    if i < n and s[i] == "-":
        i += 1
        while i < n and s[i].isspace():
            i += 1
    if i < n and s[i] == "(":
        depth = 1
        i += 1
        while i < n and depth:
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                depth -= 1
            i += 1
    elif i < n and (s[i].isalpha() or s[i] == "_"):
        while i < n and (s[i].isalnum() or s[i] == "_"):
            i += 1
        while i < n:
            if s[i] == ".":
                j = i + 1
                while j < n and (s[j].isalnum() or s[j] == "_"):
                    j += 1
                if j == i + 1:
                    break
                i = j
            elif s[i] == "(":
                depth = 1
                i += 1
                while i < n and depth:
                    if s[i] == "(":
                        depth += 1
                    elif s[i] == ")":
                        depth -= 1
                    i += 1
            else:
                break
    elif i < n and s[i].isdigit():
        m = re.match(r"0[xX][0-9a-fA-F]+|\d+(?:\.\d+)?(?:[eE][+-]?\d+)?", s[i:])
        i += m.end()
    return s[start:i], s[i:]


def _looks_procedural(mvel: str) -> bool:
    return ";" in mvel


class MvelTranslationError(ValueError):
    """Block uses MVEL outside the translated subset — register the rule as a
    ``python:<name>`` transform instead (the reference's plugin escape
    hatch)."""


def _parse_block(s: str, i: int) -> tuple[list, int]:
    """Parse statements until end-of-string or ``}``.  Nodes are
    ``("stmt", text)`` or ``("if", cond, then_nodes, else_nodes)``."""
    nodes: list = []
    n = len(s)
    while i < n:
        while i < n and s[i].isspace():
            i += 1
        if i >= n or s[i] == "}":
            break
        if re.match(r"if\s*\(", s[i:]):
            node, i = _parse_if(s, i)
            nodes.append(node)
        else:
            k, depth = i, 0
            while k < n and (s[k] != ";" or depth):
                if s[k] in "([{":
                    depth += 1
                elif s[k] in ")]}":
                    depth -= 1
                k += 1
            stmt = s[i:k].strip()
            if stmt:
                nodes.append(("stmt", stmt))
            i = k + 1
    return nodes, i


def _parse_body(s: str, i: int) -> tuple[list, int]:
    """A braced block, a nested ``if``, or one braceless statement."""
    n = len(s)
    while i < n and s[i].isspace():
        i += 1
    if i < n and s[i] == "{":
        nodes, j = _parse_block(s, i + 1)
        if j >= n or s[j] != "}":
            raise MvelTranslationError("unbalanced '{' in MVEL block")
        return nodes, j + 1
    if re.match(r"if\s*\(", s[i:]):
        node, j = _parse_if(s, i)
        return [node], j
    k, depth = i, 0
    while k < n and (s[k] != ";" or depth):
        if s[k] in "([{":
            depth += 1
        elif s[k] in ")]}":
            depth -= 1
        k += 1
    return [("stmt", s[i:k].strip())], k + 1


def _parse_if(s: str, i: int) -> tuple[tuple, int]:
    n = len(s)
    j = s.index("(", i)
    depth, k = 1, j + 1
    while k < n and depth:
        if s[k] == "(":
            depth += 1
        elif s[k] == ")":
            depth -= 1
        k += 1
    if depth:
        raise MvelTranslationError("unbalanced '(' in if condition")
    cond = s[j + 1 : k - 1]
    then_nodes, m = _parse_body(s, k)
    mm = m
    while mm < n and s[mm].isspace():
        mm += 1
    else_nodes: list = []
    if re.match(r"else\b", s[mm:] if mm < n else ""):
        else_nodes, m = _parse_body(s, mm + len("else"))
    return ("if", cond, then_nodes, else_nodes), m


def _eval_expr(expr: str, env: dict[str, str]) -> str:
    """Translate one (literal-masked) expression against the variable
    environment.  Variable references are swapped for opaque placeholder
    tokens BEFORE translation and expanded to their defining SQL AFTER it,
    so a definition's text (which may contain lambdas, literals, or words
    that look like other variables) is never re-scanned by any rewrite."""
    # casts (leading or embedded) are handled inside _translate_expr's
    # _rewrite_casts pass — a Java cast binds to the adjacent primary:
    # (int) d + 1  ==  CAST(d AS INT) + 1
    return _eval_translated(expr.strip(), env)


def _eval_translated(expr: str, env: dict[str, str]) -> str:
    if env:
        pat = re.compile(r"\b(" + "|".join(map(re.escape, env)) + r")\b")
        expr = pat.sub(lambda mm: f"__var_{mm.group(1)}__", expr)
    out = _translate_expr(expr)
    for name, text in env.items():
        out = out.replace(f"__var_{name}__", f"({text})")
    return out


def _typed(sql: str, java_type: str) -> str:
    """Enforce an INTEGRAL declared type on a declaration/assignment value
    — Java's ``int x = a / 2`` truncates, SQL's ``/`` is double division,
    so the stored value is cast back to the declared type.  This matches
    Java for direct quotients; a division buried in a LARGER int
    expression (e.g. ``(a/2)*2``) still follows SQL double semantics
    inside — that nesting belongs in a ``python:<name>`` transform."""
    if java_type in _INTEGRAL_TYPES:
        return f"CAST({sql} AS {_JAVA_TYPES[java_type]})"
    return sql


def _exec_nodes(
    nodes: list, env: dict[str, str], types: dict[str, str]
) -> str | None:
    """Fold statements into ``env``; return the SQL of a ``return`` if one is
    reached on every path through ``nodes``, else None.  ``types`` tracks
    declared Java types so integral ``/=`` translates to SQL ``div``
    (truncating integer division, Java semantics) instead of ``/``."""
    for idx, node in enumerate(nodes):
        if node[0] == "stmt":
            text = node[1]
            m = _RETURN_RE.match(text)
            if m:
                return _eval_expr(m.group(1), env)
            m = _DECL_RE.match(text)
            if m:
                types[m.group(2)] = m.group(1)
                env[m.group(2)] = _typed(_eval_expr(m.group(3), env), m.group(1))
                continue
            m = _COMPOUND_RE.match(text)
            if m:
                var, op, rhs = m.groups()
                if var not in env:
                    raise MvelTranslationError(f"assignment to undeclared variable {var!r}")
                if op == "/" and types.get(var) in _INTEGRAL_TYPES:
                    op = "div"
                env[var] = f"({env[var]}) {op} ({_eval_expr(rhs, env)})"
                continue
            m = _ASSIGN_RE.match(text)
            if m:
                if m.group(1) not in env:
                    raise MvelTranslationError(
                        f"assignment to undeclared variable {m.group(1)!r}"
                    )
                env[m.group(1)] = _typed(
                    _eval_expr(m.group(2), env), types.get(m.group(1), "var")
                )
                continue
            raise MvelTranslationError(f"unsupported MVEL statement: {text!r}")
        _, cond, then_nodes, else_nodes = node
        cond_sql = _eval_expr(cond, env)
        env_t, env_e = dict(env), dict(env)
        types_t, types_e = dict(types), dict(types)
        ret_t = _exec_nodes(then_nodes, env_t, types_t)
        ret_e = _exec_nodes(else_nodes, env_e, types_e) if else_nodes else None
        if ret_t is not None and ret_e is not None:
            return f"IF({cond_sql}, {ret_t}, {ret_e})"
        if ret_t is not None or ret_e is not None:
            # guard style: one branch returns, the other path falls through to
            # the remaining statements
            fall_env = env_e if ret_t is not None else env_t
            fall_types = types_e if ret_t is not None else types_t
            rest = _exec_nodes(nodes[idx + 1 :], fall_env, fall_types)
            if rest is None:
                raise MvelTranslationError(
                    "branch returns but fall-through path never does"
                )
            if ret_t is not None:
                return f"IF({cond_sql}, {ret_t}, {rest})"
            return f"IF({cond_sql}, {rest}, {ret_e})"
        # pure-assignment branches: merge with a conditional per changed var
        for var in set(env_t) | set(env_e):
            t, e = env_t.get(var), env_e.get(var)
            if t is None or e is None:
                continue  # declared inside one branch only — scope ends there
            if t != e:
                env[var] = f"IF({cond_sql}, {t}, {e})"
    return None


def _translate_block_masked(masked: str) -> str:
    nodes, _ = _parse_block(masked, 0)
    result = _exec_nodes(nodes, {}, {})
    if result is None:
        raise MvelTranslationError("procedural MVEL block has no return on every path")
    return result


def translate_mvel_block(mvel: str) -> str:
    """Translate a procedural MVEL block (declarations, assignments,
    ``if``/``else``, trailing ``return``) into one Spark SQL expression by
    sequential substitution.  The shipped hashCode-bucket example
    (migration-config.example.yaml:112-120) translates to a pure Catalyst
    higher-order-function expression — no Python in the row path.

    Substitution duplicates a variable's defining text at every reference, so
    deeply chained blocks grow the expression; blocks past this subset
    (loops, side effects) raise :class:`MvelTranslationError` and belong in
    the ``python:<name>`` registry."""
    masked, lits = _mask_literals(mvel)
    return _restore_literals(_translate_block_masked(masked), lits)
