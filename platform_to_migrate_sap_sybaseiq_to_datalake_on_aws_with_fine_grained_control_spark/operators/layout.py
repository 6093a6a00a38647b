"""Physical-layout control (SURVEY.md §2.4).

R1 — size-tiered output-file-count control, same thresholds as the
reference (``sybaseiq_extractor.py:149-154``): 8 files below 50M rows,
16 between 50M and 100M, 24 at or above 100M.

At 100 TB the static tiers are too coarse (24 files of multi-TB each),
so :func:`apply_output_sizing` also offers the idiomatic scale path:
AQE-coalesced write bounded by ``maxRecordsPerFile`` — kept opt-in to
preserve behavioral parity by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

COALESCE_TIERS: list[tuple[int, int]] = [
    (50_000_000, 8),
    (100_000_000, 16),
]
COALESCE_MAX_TIER = 24


def coalesce_tier(num_records: int) -> int:
    """Tier function (``sybaseiq_extractor.py:149-154``)."""
    for upper, files in COALESCE_TIERS:
        if num_records < upper:
            return files
    return COALESCE_MAX_TIER


def apply_output_sizing(
    df: DataFrame,
    num_records: int,
    mode: str = "tiered",
    max_records_per_file: int = 5_000_000,
) -> DataFrame:
    """Shape the output file count.

    ``tiered``  — reference parity: ``coalesce(coalesce_tier(n))``.
    ``adaptive`` — scale path: let AQE pick partition count; the
    per-file row bound travels as a WRITER option
    (``maxRecordsPerFile``, applied by the sink — see
    ``write_partitioned_parquet``), NEVER as a session conf: a session-
    wide setting leaks into every later write, splitting a tiered job's
    coalesce(8) into 12+ files and breaking the reference-parity file
    counts this module exists to preserve.
    """
    if mode == "tiered":
        return df.coalesce(coalesce_tier(num_records))
    if mode == "adaptive":
        return df
    raise ValueError(f"unknown output sizing mode: {mode!r}")


def zorder_key(x: "Column", y: "Column", bits: int = 16) -> "Column":
    """Morton/Z-order key: bit-interleave the low ``bits`` bits of two
    non-negative integer dimensions (x gets the even bit positions).

    The lakehouse multi-dimensional clustering primitive (Delta
    ``OPTIMIZE ZORDER BY``, Hudi/Iceberg z-ordering): range-partitioning
    and sorting by this key co-locates rows that are close in BOTH
    dimensions, so per-file min/max column stats prune scans filtered on
    either one.  Pure bit arithmetic on Columns — whole-stage codegen,
    no UDF, no shuffle of its own.
    """
    from pyspark.sql import functions as F

    if not 1 <= bits <= 31:
        # 2*bits-1 must stay below the long sign bit; with an INT input
        # Spark's shiftleft would wrap y's top bit into the sign bit
        # and negative keys silently break the range-clustering order
        raise ValueError(f"zorder_key: bits must be in [1, 31], got {bits}")
    x = x.cast("long")
    y = y.cast("long")
    parts = []
    for b in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b))
        parts.append(F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The same interleave as :func:`zorder_key`, as an engine-neutral SQL
    expression (``>> & <<`` operators — DuckDB dialect, used by the
    catalog oracle)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"zorder_key_sql: bits must be in [1, 31], got {bits}")
    parts = []
    for b in range(bits):
        parts.append(f"((({x_expr} >> {b}) & 1) << {2 * b})")
        parts.append(f"((({y_expr} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(parts) + ")"


def zorder_layout(df: DataFrame, zkey_col: str, num_partitions: int) -> DataFrame:
    """Cluster a frame for write: range-partition on the z-key (contiguous
    key ranges per output file → tight min/max stats on both interleaved
    dimensions) and sort within partitions so row groups stay clustered."""
    return df.repartitionByRange(num_partitions, zkey_col).sortWithinPartitions(zkey_col)
