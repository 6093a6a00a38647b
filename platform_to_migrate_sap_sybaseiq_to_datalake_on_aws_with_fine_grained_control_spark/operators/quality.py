"""Declarative data-quality checks (extraction-platform extension).

The reference's only quality gate is the expected-vs-actual row count
(A3).  This operator generalizes it to a declarative check spec the
plan can carry — the checks every extraction platform ends up needing:

* ``not_null``   — null count per column
* ``unique``     — duplicate-key count over a column set
* ``ranges``     — out-of-range count per numeric/temporal column
* ``allowed``    — out-of-vocabulary count per categorical column

All checks run in ONE aggregation pass over the data (a single
``select`` of conditional sums + one optional distinct-count subplan),
so the cost at 100 TB is one scan — never a scan per check.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckSpec:
    not_null: list[str] = field(default_factory=list)
    unique: list[str] = field(default_factory=list)  # one composite key
    ranges: dict[str, tuple[Any, Any]] = field(default_factory=dict)
    allowed: dict[str, list[Any]] = field(default_factory=dict)


def run_checks(df: DataFrame, spec: CheckSpec) -> DataFrame:
    """Evaluate the spec; returns one row per check:
    ``(check, column, n_violations, passed)``, ordered by (check, column).
    """
    aggs = []
    labels: list[tuple[str, str]] = []
    for c in spec.not_null:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint"))
        labels.append(("not_null", c))
    for c, (lo, hi) in spec.ranges.items():
        cond = F.col(c).isNotNull() & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)))
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("bigint"))
        labels.append(("range", c))
    for c, vals in spec.allowed.items():
        cond = F.col(c).isNotNull() & ~F.col(c).isin(vals)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("bigint"))
        labels.append(("allowed", c))
    if spec.unique:
        # count_distinct over a STRUCT of the key columns: a bare
        # count_distinct(cols) skips rows where ANY key is NULL, so a
        # clean table with one NULL-keyed row would read as a
        # uniqueness violation; struct(NULLs) is a non-null value that
        # groups null keys together (null-safe semantics, matching the
        # not_null check's separate responsibility for NULL keys).
        aggs.append(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(c) for c in spec.unique]))
            ).cast("bigint")
        )
        labels.append(("unique", ",".join(spec.unique)))

    if not aggs:
        raise ValueError("empty CheckSpec")

    row = df.agg(*[a.alias(f"v{i}") for i, a in enumerate(aggs)])
    spark = df.sparkSession
    label_df = spark.createDataFrame(
        [(i, chk, col) for i, (chk, col) in enumerate(labels)],
        "idx INT, check STRING, column STRING",
    )
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("idx"), F.col(f"v{i}").alias("n_violations"))
                    for i in range(len(labels))
                ]
            )
        ).alias("s")
    ).select("s.idx", "s.n_violations")
    return (
        stacked.join(label_df, "idx")
        .select(
            "check",
            "column",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("check", "column")
    )
