"""Type-drift-safe temporal helpers.

Parquet written with naive ``timestamp[us]`` (no timezone) is inferred
by Spark 4 as ``TIMESTAMP_NTZ``, and several builtins are
TIMESTAMP-only: ``unix_micros``/``unix_millis``/``unix_seconds`` raise
``DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE`` on NTZ input, and
``CAST(ntz AS DOUBLE)`` is an illegal cast.  Every epoch computation in
this repo goes through :func:`epoch_us` so the operators work
identically on ``TIMESTAMP``, ``TIMESTAMP_NTZ``, and ``DATE`` columns.

The session timezone is pinned to UTC (``session.py``), which makes
``NTZ -> TIMESTAMP`` and ``DATE -> TIMESTAMP`` casts value-preserving:
the wall-clock instant is reinterpreted as the same UTC instant, so
epoch arithmetic (gaps, buckets, sessions) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["epoch_us", "epoch_s", "EPOCH_US_SQL", "EPOCH_S_SQL"]

# SQL-text forms of the same idiom, for catalog queries written as raw
# Spark SQL strings.
EPOCH_US_SQL = "unix_micros(CAST({col} AS TIMESTAMP))"
EPOCH_S_SQL = "(unix_micros(CAST({col} AS TIMESTAMP)) / 1000000.0)"


def _as_col(col: Column | str) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def epoch_us(col: Column | str) -> Column:
    """Microseconds since the epoch as BIGINT, for TIMESTAMP,
    TIMESTAMP_NTZ, or DATE input (UTC session TZ makes the cast
    value-preserving)."""
    return F.unix_micros(_as_col(col).cast("timestamp"))


def epoch_s(col: Column | str) -> Column:
    """Fractional seconds since the epoch as DOUBLE (microsecond
    precision kept — matches DuckDB's ``epoch(ts)``)."""
    return epoch_us(col) / F.lit(1_000_000.0)
