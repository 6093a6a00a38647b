"""Skew- and layout-aware join utilities (100 TB scale toolkit).

AQE's skew-join splitting (enabled in the session factory) handles
most skew transparently; these helpers cover the cases it can't:

* :func:`salted_join` — explicit key salting for aggregations/joins
  where one hot key swamps a task even after AQE splitting (AQE splits
  *partitions*, not *keys*: a single key larger than a split still
  lands in one task for sort-merge-join row alignment).  The small
  side is replicated ``salt`` times via an explode, the big side gets
  a deterministic per-row salt, and the join key becomes
  ``(key, salt)`` — each hot key fans out across ``salt`` tasks.
* :func:`write_bucketed` / :func:`bucketed_join_ready` — bucketed
  table layout so repeated big-big joins on the same key skip the
  shuffle entirely (both sides cluster-distributed identically at
  write time; Catalyst elides the Exchange when bucket specs match).

Salting uses ``pmod(hash(...), salt)`` on stable row attributes — no
``rand()``, so plans stay deterministic and retry-safe (a retried task
re-salts identically; ``rand()`` salting breaks exactly-once writes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    big_salt_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``big ⋈ small`` on column ``on`` with ``salt``-way key
    fan-out.

    ``big`` rows get ``salt_id = pmod(hash(stable cols), salt)``;
    ``small`` is exploded ``salt``× (one replica per salt value) —
    correct for joins where ``small`` is the dimension side (every big
    row still matches exactly its one logical partner).  Output drops
    the salt column.
    """
    salt_src = [F.col(c) for c in (big_salt_cols or big.columns)]
    big_s = big.withColumn("_salt", F.pmod(F.hash(*salt_src), F.lit(salt)))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Two tables bucketed identically on the join key join WITHOUT a
    shuffle — the write pays the clustering once, every subsequent
    join reads it back for free.  This is the Spark-native equivalent
    of co-located storage layouts.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join_ready(spark, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-spec bucketed tables on their bucket column; the
    physical plan contains no Exchange on either side (asserted in
    tests via the explain string)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, on)
