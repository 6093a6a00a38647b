"""Corpus chunking and deterministic stratified sampling.

Two curation stages every large-scale training-data pipeline needs
between raw documents and tokenization:

* ``chunk_documents`` — split each document into fixed-size,
  overlapping character windows (the unit a context-bounded trainer
  consumes).  Pure Catalyst: ``explode(sequence(...))`` fans a row
  out to its chunk indices, ``substring`` slices — linear work, fan-out
  proportional to document length, no shuffle at all (narrow
  transformation; chunks inherit the parent's partition).
* ``stratified_sample`` — per-stratum downsampling with deterministic
  hash buckets instead of RNG: a document's fate depends only on its
  id, so the sample is reproducible across engines, runs, retries and
  cluster sizes, and never double-counts under speculative execution.
  ``df.sampleBy`` cannot promise any of that (seeded per-partition
  RNG changes with the split layout).

Both are narrow (shuffle-free) operators: at 100 TB they scale with
the scan alone.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents", "stratified_sample", "hash_bucket_256"]

_HEX = "0123456789abcdef"


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_chars: int,
    overlap: int,
) -> DataFrame:
    """Fixed-size overlapping character chunks of ``text_col``.

    Chunk ``i`` covers characters ``[i*stride, i*stride + chunk_chars)``
    with ``stride = chunk_chars - overlap``; every document yields at
    least one chunk (possibly short), and the last chunk may be
    shorter than ``chunk_chars``.  Character (not byte) semantics, so
    multi-byte scripts slice identically everywhere.

    Output: all input columns except ``text_col``, plus ``chunk_id``
    (bigint, 0-based), ``chunk_text`` and ``chunk_chars``.
    """
    if not 0 <= overlap < chunk_chars:
        raise ValueError("require 0 <= overlap < chunk_chars")
    stride = chunk_chars - overlap
    n_chunks = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil((F.length(F.col(text_col)) - F.lit(overlap)) / F.lit(float(stride))),
    )
    keep = [c for c in df.columns if c != text_col]
    return (
        df.withColumn(
            "chunk_id",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)),
        )
        .withColumn(
            "chunk_text",
            F.expr(f"substring({text_col}, cast(chunk_id * {stride} + 1 as int), {chunk_chars})"),
        )
        .select(
            *keep,
            "chunk_id",
            "chunk_text",
            F.length("chunk_text").alias("chunk_chars"),
        )
    )


def hash_bucket_256(id_col: Column) -> Column:
    """Deterministic bucket in [0, 256) from the first two md5 nibbles
    of the stringified id — the same engine-portable idiom as the
    train/holdout split (md5 hex is identical in Spark, DuckDB, and
    every other engine; no RNG, no seed, no partition dependence)."""
    h = F.md5(id_col.cast("string"))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float,
) -> DataFrame:
    """Keep each row iff its deterministic hash bucket falls under the
    stratum's rate (quantized to /256).  Rows whose stratum is not in
    ``rates`` use ``default_rate``.  A rate of 1.0 keeps everything,
    0.0 drops the stratum entirely."""

    def threshold(rate: float) -> int:
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate {rate} outside [0, 1]")
        return int(round(rate * 256))

    bucket = hash_bucket_256(F.col(id_col))
    cutoff = reduce(
        lambda acc, kv: acc.when(F.col(strata_col) == kv[0], F.lit(threshold(kv[1]))),
        rates.items(),
        F.when(F.lit(False), F.lit(0)),
    ).otherwise(F.lit(threshold(default_rate)))
    return df.filter(bucket < cutoff)


def weighted_sample(df: DataFrame, id_col: str, rate_col: Column) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep a row iff its
    md5 hash bucket falls under ``floor(256 * rate)`` where ``rate_col``
    is a per-row inclusion probability in [0, 1] (quantized to /256,
    like :func:`stratified_sample` — same reproducibility contract:
    no RNG, no seed, no partition dependence, safe under speculative
    re-execution).  The per-row rate is what distinguishes it from the
    per-stratum form — e.g. quality-weighted corpus downsampling where
    better documents survive with higher probability."""
    bucket = hash_bucket_256(F.col(id_col))
    return df.filter(bucket < F.floor(F.lit(256.0) * rate_col).cast("int"))
