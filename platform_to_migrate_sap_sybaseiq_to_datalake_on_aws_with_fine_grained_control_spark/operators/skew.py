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

    Only join types that preserve the BIG side's row semantics are
    accepted: for right/full outer joins an unmatched small row would
    surface once per salt replica — ``salt`` duplicate null-extended
    rows instead of one.  (An unmatched BIG row appears exactly once
    under ``left``, so inner/left/semi/anti are all safe.)
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "cross",
               "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched small-side "
            f"rows {salt}x (one per salt replica); use a plain join or an "
            "AQE skew-split for right/full outer semantics"
        )
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


def _bloom_pos(key_col, i: int, num_bits: int):
    """Deterministic md5 hash position i for ``key_col`` in [0, num_bits)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", key_col.cast("string"), F.lit(str(i)))),
            1,
            6,
        ),
        16,
        10,
    ).cast("bigint")
    return (h % num_bits).cast("int")


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """Join ``big`` to ``small`` on ``on``, pre-filtering ``big``
    through a Bloom filter of ``small``'s join keys so that rows that
    cannot match never enter the shuffle.

    This is the semi-join-pushdown pattern Spark's AQE runtime bloom
    filter applies automatically when thresholds allow — expressed
    explicitly so it works on any join and any threshold:

    1. the bit set is ``DISTINCT`` md5 positions of the small side's
       keys (``<= min(|small| * k, num_bits)`` rows — bounded by the
       filter size, NEVER by data volume);
    2. membership ("all k bits set") is k chained **broadcast
       left-semi joins** on the position — each is map-side, so the
       big side is filtered in place with ZERO added shuffles and no
       row duplication (an exploded probe would ship k x |big| rows);
    3. the surviving rows (true matches + bloom false positives,
       ~0.1 % at the 64 K / k=3 default for 10 K keys) flow into the
       ordinary equi-join, whose shuffle now carries only them.

    For a 100 TB fact table joining a selective dimension this turns
    the dominant cost — shuffling the fact side — into a scan +
    broadcast filter. No false negatives: md5 positions are
    deterministic, so every true match survives (asserted in tests
    against the plain join).

    Only meaningful for ``how`` in ('inner', 'left_semi', 'right')
    where big-side non-matches are dropped anyway; for outer joins
    that keep big-side rows the prefilter would change results, so
    callers get the plain join.
    """
    if how not in ("inner", "left_semi", "right"):
        return big.join(small, on, how)
    bits = None
    for i in range(num_hashes):
        b = small.select(_bloom_pos(F.col(on), i, num_bits).alias("_pos"))
        bits = b if bits is None else bits.unionAll(b)
    bits = bits.distinct()
    filtered = big
    for i in range(num_hashes):
        filtered = filtered.join(
            F.broadcast(bits),
            _bloom_pos(F.col(on), i, num_bits) == bits["_pos"],
            "left_semi",
        )
    return filtered.join(small, on, how)
