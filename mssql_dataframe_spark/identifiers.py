"""Identifier escaping and the restricted ``where`` grammar.

The reference escapes every dynamic table/column name through SQL
Server's ``QUOTENAME`` (reference: mssql_dataframe/core/dynamic.py:11-58)
and parses a free-text ``where=`` string into a parameterized predicate
(reference: dynamic.py:61-137). We reproduce both contract-for-contract,
but emit Spark SQL: backtick-quoted identifiers and a validated
condition string fed to ``DataFrame.filter``.

Catalyst's SQL parser is a strict superset of the reference's
mini-grammar; validating the same subset keeps API compatibility (the
same inputs raise ``SQLInvalidSyntax``) while blocking injection-style
strings from reaching ``spark.sql`` (reference test corpus includes
``"'; select true; --"`` — tests/test_core/test_dynamic.py:22-93).
"""

from __future__ import annotations

import re

from .errors import SQLInvalidLengthObjectName, SQLInvalidSyntax

_MAX_NAME_LEN = 128


def escape(name: str) -> str:
    """Backtick-quote one identifier, validating length like the
    reference's QUOTENAME round trip (reference: dynamic.py:29-47).

    >>> escape("ColumnA")
    '`ColumnA`'
    >>> escape("weird`name")
    '`weird``name`'
    >>> escape("x" * 129)  # doctest: +IGNORE_EXCEPTION_DETAIL
    Traceback (most recent call last):
        ...
    SQLInvalidLengthObjectName: object name must be 1..128 chars
    """
    if name is None or len(name) == 0 or len(str(name)) > _MAX_NAME_LEN:
        raise SQLInvalidLengthObjectName(
            f"object name must be 1..{_MAX_NAME_LEN} chars: {name!r}"
        )
    name = str(name)
    return "`" + name.replace("`", "``") + "`"


def escape_table(table_name: str) -> str:
    """Escape a possibly dotted ``schema.table`` name part-by-part
    (reference: dynamic.py:49-58).

    >>> escape_table("dbo.orders")
    '`dbo`.`orders`'
    >>> escape_table("orders")
    '`orders`'
    """
    parts = str(table_name).split(".")
    return ".".join(escape(p) for p in parts)


# operator list mirrors reference dynamic.py:75-89 (longest first so the
# regex is greedy on >=, <=, <>, !=, !>, !<)
_COMPARISON_OPS = [">=", "<=", "<>", "!=", "!>", "!<", "=", ">", "<"]
_OP_TRANSLATE = {"!>": "<=", "!<": ">=", "<>": "!=", "=": "="}
_NULL_RE = re.compile(r"^(?P<col>.+?)\s+IS\s+(?P<not>NOT\s+)?NULL\s*$",
                      re.IGNORECASE)
_LOGIC_SPLIT = re.compile(r"\s+(AND|OR)\s+", re.IGNORECASE)


def _compile_condition(cond: str) -> str:
    """One ``col op literal`` / ``col IS [NOT] NULL`` condition
    (reference: dynamic.py:91-127)."""
    cond = cond.strip()
    m = _NULL_RE.match(cond)
    if m:
        neg = "NOT " if m.group("not") else ""
        return f"{escape(m.group('col').strip())} IS {neg}NULL"
    for op in _COMPARISON_OPS:
        idx = cond.find(op)
        if idx > 0:
            col = cond[:idx].strip()
            value = cond[idx + len(op):].strip()
            if not col or not value:
                break
            sql_op = _OP_TRANSLATE.get(op, op)
            return f"{escape(col)} {sql_op} {_render_literal(value)}"
    raise SQLInvalidSyntax(f"could not parse condition: {cond!r}")


_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def unquote_literal(value: str) -> str:
    """Strip ONE level of outer quotes from a raw where-grammar
    literal — the single normalization step shared by the filter
    renderer (``_render_literal``) and the bloom-probe extractor
    (``equality_conjuncts``). Keeping it in one place is load-bearing:
    if the two sides ever normalized differently, a probe would hash a
    value the compiled filter doesn't compare, and a desynced probe
    PRUNES files that contain matching rows. A 1-char quote is not a
    wrapped literal."""
    value = value.strip()
    if len(value) >= 2 and (
        (value.startswith("'") and value.endswith("'"))
        or (value.startswith('"') and value.endswith('"'))
    ):
        return value[1:-1]
    return value


def renders_bare(value: str) -> bool:
    """True when ``_render_literal`` renders this (already-unquoted)
    literal BARE — numeric-shaped or a TRUE/FALSE/NULL keyword — so
    Spark compares it numerically / as a keyword rather than as a
    string. Bloom probes on STRING columns must skip such literals
    ('05' = 5 is TRUE under numeric comparison but b'05' != b'5' under
    an exact-bytes bloom probe)."""
    return bool(_NUM_RE.match(value)) or value.upper() in (
        "TRUE", "FALSE", "NULL"
    )


def _render_literal(value: str) -> str:
    """Render the extracted literal as a safe Spark SQL literal.

    The reference ships literals as ODBC parameters (dynamic.py:129-136);
    we inline them with single-quote escaping, which is equivalent under
    the restricted grammar (no nesting, no subqueries).
    """
    value = unquote_literal(value)
    if _NUM_RE.match(value):
        return value
    if value.upper() in ("TRUE", "FALSE", "NULL"):
        return value.upper()
    return "'" + value.replace("'", "''") + "'"


def compile_where(where: str) -> str:
    """Compile the reference's restricted where-grammar into a Spark SQL
    condition string.

    Grammar (reference: dynamic.py:61-137): conditions joined by AND/OR,
    comparison ops ``>= <= <> != !> !< = > <`` plus ``IS [NOT] NULL``,
    with at most one level of parentheses (reference: dynamic.py:95-97).

    >>> compile_where("ColumnA > 5 and ColumnB is not null")
    '`ColumnA` > 5 AND `ColumnB` IS NOT NULL'
    >>> compile_where("name = O'Brien")
    "`name` = 'O''Brien'"
    >>> compile_where("(a = 1 or b = 2) and c <> 3")
    '(`a` = 1 OR `b` = 2) AND `c` != 3'
    >>> compile_where("'; select true; --")  # doctest: +IGNORE_EXCEPTION_DETAIL
    Traceback (most recent call last):
        ...
    SQLInvalidSyntax: could not parse condition
    """
    if not where or not where.strip():
        raise SQLInvalidSyntax("empty where string")
    out: list[str] = []
    depth = 0
    buf = ""
    # walk the string tracking parens so AND/OR inside groups stay scoped
    tokens = re.split(r"(\(|\))", where)
    for tok in tokens:
        if tok == "(":
            depth += 1
            if depth > 1:
                raise SQLInvalidSyntax(
                    "only one level of parentheses is supported "
                    "(reference dynamic.py:95-97)"
                )
            out.append(_flush(buf))
            buf = ""
            out.append("(")
        elif tok == ")":
            depth -= 1
            if depth < 0:
                raise SQLInvalidSyntax("unbalanced parentheses")
            out.append(_flush(buf))
            buf = ""
            out.append(")")
        else:
            buf += tok
    if depth != 0:
        raise SQLInvalidSyntax("unbalanced parentheses")
    out.append(_flush(buf))
    compiled = " ".join(p for p in out if p)
    compiled = re.sub(r"\(\s+", "(", compiled)
    compiled = re.sub(r"\s+\)", ")", compiled)
    return compiled


def equality_conjuncts(where: str) -> list[tuple[str, str]]:
    """``(column, raw literal)`` pairs for every top-level ``col =
    value`` condition when the WHOLE where-string is a pure AND of
    conditions — the shape file-level point-lookup pruning (bloom
    sidecars) can use. Any OR or parenthesized group returns [] (a
    disjunction can match rows a single conjunct's pruning would
    drop); non-equality conditions are simply skipped. Literals are
    unquoted like the compiler's renderer; the caller types them
    against the column's declared type."""
    if not where or "(" in where or ")" in where:
        return []
    if re.search(r"\s+OR\s+", where, re.IGNORECASE):
        return []
    out: list[tuple[str, str]] = []
    for part in _LOGIC_SPLIT.split(where):
        p = part.strip()
        if not p or p.upper() in ("AND", "OR"):
            continue
        if _NULL_RE.match(p):
            continue
        for op in _COMPARISON_OPS:
            idx = p.find(op)
            if idx > 0:
                if op != "=":
                    break  # a real non-equality comparison — skip it
                col = p[:idx].strip()
                value = p[idx + 1:].strip()
                if not col or not value:
                    break
                out.append((col, unquote_literal(value)))
                break
    return out


def _flush(fragment: str) -> str:
    """Compile a paren-free fragment: conditions joined by AND/OR.

    A fragment may legitimately start or end with a dangling AND/OR
    when it abuts a parenthesized group — peel those explicitly."""
    s = fragment.strip()
    if not s:
        return ""
    out: list[str] = []
    m = re.match(r"^(AND|OR)\b\s*(.*)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        out.append(m.group(1).upper())
        s = m.group(2).strip()
    trailing = None
    m2 = re.match(r"^(.*?)\s*\b(AND|OR)$", s, re.IGNORECASE | re.DOTALL)
    if m2:
        trailing = m2.group(2).upper()
        s = m2.group(1).strip()
    for p in _LOGIC_SPLIT.split(s):
        up = p.strip().upper()
        if up in ("AND", "OR"):
            out.append(up)
        elif p.strip():
            out.append(_compile_condition(p))
    if trailing:
        out.append(trailing)
    return " ".join(out)
