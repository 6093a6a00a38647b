"""Partitioned Parquet + catalog sink (SURVEY.md §2.5 K1/K2).

Reference behavior (``sybaseiq_extractor.py:118-257``): write
glueparquet to ``{root}/{SourceName}/{SourceSchema}/{SourceTable}/``,
Hive partition keys ``["year","month","day"]`` (temporal) or
``[column]`` (categorical) or none, append-only, and register/update
the catalog table ``{TargetDatabase}.{SourceName}_{SourceTable}``.

Spark-native mapping: ``df.write.partitionBy(keys).parquet(path)`` plus
Spark-catalog registration of an external table over that path.  The
append-only contract is preserved by default (``mode="append"``); the
safer dynamic-partition-overwrite the reference left commented out
(``sybaseiq_extractor.py:132-147``) is available via
``mode="overwrite"`` with ``partitionOverwriteMode=dynamic`` (set in
the session factory).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SinkResult:
    path: str
    table: str | None
    partition_keys: list[str]
    mode: str


def _safe_table_name(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", name)


def write_partitioned_parquet(
    df: DataFrame,
    root: str,
    path_suffix: str,
    partition_keys: list[str] | None = None,
    target_database: str | None = None,
    table_name: str | None = None,
    mode: str = "append",
) -> SinkResult:
    """K1/K2 — partitioned parquet write + catalog registration."""
    path = str(Path(root) / path_suffix)
    writer = df.write.mode(mode).format("parquet")
    keys = partition_keys or []
    if keys:
        writer = writer.partitionBy(*keys)
    writer.save(path)

    qualified = None
    if table_name:
        spark = df.sparkSession
        qualified = register_external_table(
            spark, path, table_name, target_database, partition_keys=keys
        )
    return SinkResult(path=path, table=qualified, partition_keys=keys, mode=mode)


def register_external_table(
    spark: SparkSession,
    path: str,
    table_name: str,
    database: str | None = None,
    partition_keys: list[str] | None = None,
) -> str:
    """Catalog registration analog of ``enableUpdateCatalog``
    (``sybaseiq_extractor.py:158-163``).

    Uses an external (path-based) table so re-registration after an
    append is a metadata-only refresh.  Partition discovery is handled
    by ``MSCK``-equivalent recover.
    """
    if database:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {_safe_table_name(database)}")
        qualified = f"{_safe_table_name(database)}.{_safe_table_name(table_name)}"
    else:
        qualified = _safe_table_name(table_name)

    spark.sql(f"DROP TABLE IF EXISTS {qualified}")
    df = spark.read.parquet(path)
    keys = [k.lower() for k in (partition_keys or [])]
    data_cols = [f for f in df.schema.fields if f.name.lower() not in keys]
    part_cols = [f for f in df.schema.fields if f.name.lower() in keys]
    ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in data_cols + part_cols
    )
    stmt = f"CREATE TABLE {qualified} ({ddl}) USING PARQUET"
    if part_cols:
        stmt += " PARTITIONED BY (" + ", ".join(f"`{f.name}`" for f in part_cols) + ")"
    stmt += f" LOCATION '{path}'"
    spark.sql(stmt)
    if part_cols:
        spark.sql(f"MSCK REPAIR TABLE {qualified}")
    return qualified
