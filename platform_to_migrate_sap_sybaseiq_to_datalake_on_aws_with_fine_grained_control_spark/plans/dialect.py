"""Sybase/T-SQL → Spark SQL dialect rewriting.

The reference ships the plan's ``Query`` verbatim to the source engine
(Sybase IQ / Postgres) as a JDBC derived table, so plans use source
dialect: bracket-quoted identifiers (``[Row ID]``,
``example1-sybase.json:10``) and three-part table names
(``iqdemo.dba.tb_tableau_superstore``, reference ``README.md:31``).

The new engine executes queries natively with ``spark.sql``, so we
rewrite:

* ``[Identifier]``  →  `` `Identifier` ``  (outside string literals)
* ``db.schema.table`` →  a registered view name (via a caller-supplied
  mapping, falling back to the bare table name)
* trailing ``;`` stripped (plans must not carry one — README.md:101 —
  but be forgiving)

The rewriter is deliberately token-level, not a full SQL parser: plan
queries in the reference are plain SELECT/WHERE slices (README.md:31,58,74).
"""

from __future__ import annotations

import re

_STRING_OR_BRACKET = re.compile(
    r"""
    (?P<str>'(?:[^']|'')*')          # single-quoted string (w/ '' escapes)
  | \[(?P<ident>[^\]]+)\]            # [bracket identifier]
    """,
    re.VERBOSE,
)


def rewrite_bracket_identifiers(sql: str) -> str:
    """``[Row ID]`` → `` `Row ID` `` outside string literals."""

    def repl(m: re.Match) -> str:
        if m.group("str") is not None:
            return m.group("str")
        return f"`{m.group('ident')}`"

    return _STRING_OR_BRACKET.sub(repl, sql)


def rewrite_three_part_names(
    sql: str, table_map: dict[str, str] | None = None
) -> str:
    """Map ``db.schema.table`` (outside strings/backticks) to view names.

    ``table_map`` keys may be the full lowercase three-part name or the
    bare table name; by default the bare table name is used, which is
    how the source registry registers views.
    """
    table_map = {k.lower(): v for k, v in (table_map or {}).items()}

    parts = re.split(r"('(?:[^']|'')*'|`[^`]*`)", sql)
    three_part = re.compile(r"\b([A-Za-z_][\w$]*)\.([A-Za-z_][\w$]*)\.([A-Za-z_][\w$]*)\b")

    def repl(m: re.Match) -> str:
        full = m.group(0).lower()
        bare = m.group(3)
        return table_map.get(full, table_map.get(bare.lower(), bare))

    for i in range(0, len(parts), 2):  # even indices are outside quotes
        parts[i] = three_part.sub(repl, parts[i])
    return "".join(parts)


def to_spark_sql(sql: str, table_map: dict[str, str] | None = None) -> str:
    """Full rewrite pipeline for a plan ``Query``."""
    out = sql.strip()
    while out.endswith(";"):
        out = out[:-1].rstrip()
    out = rewrite_bracket_identifiers(out)
    out = rewrite_three_part_names(out, table_map)
    return out
