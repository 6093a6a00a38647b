"""The fixed cleaning/normalizing pipeline (SURVEY.md §2.2, P2-P6).

Behavioral parity with the reference, implemented as single-pass
``select`` projections instead of N chained ``withColumn`` /
``withColumnRenamed`` calls (each chained call adds a Project node;
one select keeps the plan flat and Catalyst-friendly — matters when a
table has hundreds of columns at 100 TB).

Reference semantics preserved exactly:

* ``fix_col_names``: ``lower().strip()`` then every char outside
  ``[A-Za-z0-9_]`` → ``_``  (``sybaseiq_extractor.py:114-115``).
* trim: ltrim+rtrim (ASCII space) on every string column EXCEPT
  ``migration_ExecutionHashId``  (``sybaseiq_extractor.py:97-111``).
* audit columns: ``migration_tp_utc`` = job-start UTC timestamp,
  ``migration_ExecutionHashId`` = plan hash, as literals on every row
  (``sybaseiq_extractor.py:42,124-125,175-176,206-207``).
* date parts: ``year``/``month``/``day`` STRING columns via
  ``date_format(col, "y"/"M"/"d")`` — deliberately UNPADDED
  (``month=3`` not ``03``) when the storage-partition column is
  Date/Timestamp  (``sybaseiq_extractor.py:168-174``).
* order of operations: rename → audit (+date parts) → trim
  (``save_to_s3``, ``sybaseiq_extractor.py:118-131``).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

AUDIT_HASH_COL = "migration_ExecutionHashId"
AUDIT_TS_COL = "migration_tp_utc"

# The reference uses r"[^A-Za-z\d_]" (sybaseiq_extractor.py:115); in
# Python \d also matches non-ASCII Unicode digits (e.g. '\u0b66'),
# which are NOT valid in Athena/Glue identifiers — a latent bug we fix
# rather than reproduce (ASCII class), per SURVEY.md §7 M3 policy.
_FIX_RE = re.compile(r"[^A-Za-z0-9_]")


def fix_col_name(name: str) -> str:
    """Catalog/Athena-safe identifier (``sybaseiq_extractor.py:114-115``)."""
    return _FIX_RE.sub("_", name.lower().strip())


def normalize_column_names(df: DataFrame) -> DataFrame:
    """P2 — rename every column via :func:`fix_col_name` in ONE pass.

    The reference loops ``withColumnRenamed`` per column
    (``sybaseiq_extractor.py:119-120``); ``toDF`` produces the same
    result with a single Project node.
    """
    new_names = [fix_col_name(c) for c in df.columns]
    if len(set(new_names)) != len(new_names):
        dupes = sorted({n for n in new_names if new_names.count(n) > 1})
        raise ValueError(
            f"normalize_column_names: source columns collide after "
            f"normalization ({dupes}); a duplicate-named frame would "
            "only fail later as an ambiguous-reference error far from "
            "the cause — rename the source columns apart first"
        )
    if new_names == list(df.columns):
        return df
    return df.toDF(*new_names)


def trim_string_columns(df: DataFrame, exclude: tuple[str, ...] = (AUDIT_HASH_COL,)) -> DataFrame:
    """P3 — ltrim+rtrim every StringType column except ``exclude``
    (``sybaseiq_extractor.py:97-111``), one projection pass."""
    excl = {e.lower() for e in exclude}
    cols: list[Column] = []
    trimmed = False
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, StringType) and f_.name.lower() not in excl:
            cols.append(F.rtrim(F.ltrim(F.col(f_.name))).alias(f_.name))
            trimmed = True
        else:
            cols.append(F.col(f_.name))
    return df.select(*cols) if trimmed else df


def add_audit_columns(
    df: DataFrame,
    execution_hash_id: str,
    load_timestamp: datetime | None = None,
) -> DataFrame:
    """P4 — constant lineage columns (``sybaseiq_extractor.py:124-125``)."""
    ts = load_timestamp or datetime.now(timezone.utc).replace(tzinfo=None)
    return df.withColumns(
        {
            AUDIT_TS_COL: F.lit(ts),
            AUDIT_HASH_COL: F.lit(execution_hash_id),
        }
    )


def is_temporal(df: DataFrame, column: str) -> bool:
    """P6 — type-introspection dispatch (``sybaseiq_extractor.py:168-171``).

    The reference checks ``str(dataType) in {"DateType","TimestampType"}``;
    Spark 4 additionally reads non-UTC-adjusted parquet timestamps as
    ``TimestampNTZType``, which we treat as temporal too.
    """
    return isinstance(
        df.schema[column].dataType, (DateType, TimestampType, TimestampNTZType)
    )


def add_date_parts(df: DataFrame, column: str) -> DataFrame:
    """P5 — unpadded ``year``/``month``/``day`` strings
    (``sybaseiq_extractor.py:171-174``)."""
    c = F.col(column)
    return df.withColumns(
        {
            "year": F.date_format(c, "y"),
            "month": F.date_format(c, "M"),
            "day": F.date_format(c, "d"),
        }
    )


def clean_pipeline(
    df: DataFrame,
    execution_hash_id: str,
    load_timestamp: datetime | None = None,
    partition_column: str | None = None,
) -> tuple[DataFrame, list[str]]:
    """The full fixed pipeline in reference order
    (``save_to_s3``, ``sybaseiq_extractor.py:118-231``).

    Returns ``(cleaned_df, partition_keys)`` where ``partition_keys`` is
    ``["year","month","day"]`` for a temporal partition column, the
    normalized column name for a categorical one, or ``[]``.
    """
    out = normalize_column_names(df)
    partition_keys: list[str] = []
    if partition_column:
        pcol = fix_col_name(partition_column)
        if pcol not in out.columns:
            raise KeyError(
                f"ColumnForPartitioningOnS3 {partition_column!r} (normalized {pcol!r}) "
                f"not in columns {out.columns}"
            )
        if is_temporal(out, pcol):
            out = add_date_parts(out, pcol)
            partition_keys = ["year", "month", "day"]
        else:
            partition_keys = [pcol]
    out = add_audit_columns(out, execution_hash_id, load_timestamp)
    out = trim_string_columns(out)
    return out, partition_keys


def schema_tree_string(df: DataFrame) -> str:
    """Schema capture for the ledger (``sybaseiq_extractor.py:129,180,211``)."""
    return df._jdf.schema().treeString()


def normalize_text_nfc(df: DataFrame, cols: list[str]) -> DataFrame:
    """Unicode NFC normalization + control-char strip + whitespace
    collapse on ``cols`` — the standard corpus-cleaning first pass
    (composing é from e+combining-acute, dropping C0/C1 noise,
    canonical single-space separation).

    Spark has no NFC builtin, so this is the legitimate use of the
    Arrow batch path: ``mapInPandas`` with python ``unicodedata``,
    cost per BATCH not per row, schema unchanged (narrow — no
    shuffle).  The DuckDB oracle twin is ``nfc_normalize`` + the same
    two regexes, which agree with python's NFC (both implement
    Unicode canonical composition).
    """
    import re as _re
    import unicodedata

    ctrl = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    ws = _re.compile(r"\s+")
    schema = df.schema

    def _norm(s):
        if s is None:
            return None
        return ws.sub(" ", ctrl.sub("", unicodedata.normalize("NFC", s))).strip()

    def batches(it):
        for pdf in it:
            for c in cols:
                pdf[c] = pdf[c].map(_norm)
            yield pdf

    return df.mapInPandas(batches, schema)
