"""Schema-drift alignment for evolving sources.

The reference's extraction loop re-reads the same source table for
months (sybaseiq_extractor.py's scheduled plans); source schemas drift
— columns appear, integer widths grow — and an append-only lake must
absorb that without rewriting history.  Spark's ``mergeSchema`` read
option solves the READ side for parquet; these helpers solve the
WRITE/UNION side: align any frame to a target schema (or N frames to
their merged schema) with typed-null backfill and safe numeric
widening, refusing lossy narrowing instead of silently truncating.

Widening lattice (safe, value-preserving):

* integers: byte → short → int → long
* floats: float → double; any integer → double (documented lossy for
  >2^53 longs, matching Spark's own implicit cast policy)
* date → timestamp / timestamp_ntz; timestamp_ntz ↔ timestamp is
  value-preserving ONLY under a pinned UTC session timezone (this
  repo pins it — session.py), mirroring the ``epoch_us`` NTZ idiom.

Everything here is plan-level (``select`` + ``cast`` + ``unionByName``)
— zero extra shuffles, zero data movement beyond the union itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

__all__ = ["widen_type", "merge_schemas", "align_to_schema", "union_with_evolution"]

_INT_ORDER = [ByteType(), ShortType(), IntegerType(), LongType()]
_FLOAT_ORDER = [FloatType(), DoubleType()]
_TEMPORAL = (DateType(), TimestampNTZType(), TimestampType())


class SchemaEvolutionError(ValueError):
    """Raised when two field types cannot be safely reconciled."""


def _rank(t: DataType, order: list[DataType]) -> int | None:
    for i, o in enumerate(order):
        if t == o:
            return i
    return None


def widen_type(a: DataType, b: DataType) -> DataType:
    """The narrowest type both ``a`` and ``b`` cast to losslessly
    (per the module lattice); raises :class:`SchemaEvolutionError`
    when no such type exists (e.g. string vs long)."""
    if a == b:
        return a
    ia, ib = _rank(a, _INT_ORDER), _rank(b, _INT_ORDER)
    if ia is not None and ib is not None:
        return _INT_ORDER[max(ia, ib)]
    fa, fb = _rank(a, _FLOAT_ORDER), _rank(b, _FLOAT_ORDER)
    if fa is not None and fb is not None:
        return _FLOAT_ORDER[max(fa, fb)]
    # integer + float -> double (Spark's implicit promotion)
    if (ia is not None and fb is not None) or (fa is not None and ib is not None):
        return DoubleType()
    if a in _TEMPORAL and b in _TEMPORAL:
        # date widens to either timestamp flavor; NTZ/TS reconcile to
        # TIMESTAMP (value-preserving under the pinned UTC session TZ)
        if DateType() in (a, b):
            other = b if a == DateType() else a
            return other
        return TimestampType()
    raise SchemaEvolutionError(f"cannot reconcile {a.simpleString()} and {b.simpleString()}")


def merge_schemas(schemas: list[StructType]) -> StructType:
    """Union of fields across ``schemas`` in first-seen order, each
    field at the widened type; a field is nullable if it is nullable
    anywhere or missing from any input."""
    order: list[str] = []
    types: dict[str, DataType] = {}
    nullable: dict[str, bool] = {}
    seen_in: dict[str, int] = {}
    for sch in schemas:
        for f in sch.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.dataType
                nullable[f.name] = f.nullable
            else:
                types[f.name] = widen_type(types[f.name], f.dataType)
                nullable[f.name] = nullable[f.name] or f.nullable
            seen_in[f.name] = seen_in.get(f.name, 0) + 1
    # A field absent from ANY input — including inputs processed
    # BEFORE the field was first seen — is null-backfilled there, so
    # appearance count < len(schemas) forces nullable.
    for n in order:
        if seen_in[n] < len(schemas):
            nullable[n] = True
    return StructType(
        [StructField(n, types[n], nullable[n]) for n in order]
    )


def align_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` onto ``target``: missing columns become typed
    nulls, present columns cast ONLY along the widening lattice
    (narrowing or incompatible casts raise — no silent truncation),
    column order normalized to the target's.  Extra columns in ``df``
    that the target lacks raise (merge the schemas first if they
    should survive)."""
    have = {f.name: f.dataType for f in df.schema.fields}
    extra = [n for n in have if n not in {f.name for f in target.fields}]
    if extra:
        raise SchemaEvolutionError(
            f"columns {extra} not in target schema — use merge_schemas/"
            "union_with_evolution to keep them"
        )
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name] == f.dataType:
            cols.append(F.col(f.name))
        else:
            # validate the cast is a widening (raises otherwise)
            if widen_type(have[f.name], f.dataType) != f.dataType:
                raise SchemaEvolutionError(
                    f"column {f.name}: {have[f.name].simpleString()} -> "
                    f"{f.dataType.simpleString()} is not a safe widening"
                )
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def union_with_evolution(dfs: list[DataFrame]) -> DataFrame:
    """Union frames whose schemas drifted: merge to the widened
    superset schema, align every input, ``unionByName``.  The result
    is what ``mergeSchema`` gives a reader, produced writer-side."""
    if not dfs:
        raise ValueError("union_with_evolution needs at least one frame")
    merged = merge_schemas([d.schema for d in dfs])
    out = align_to_schema(dfs[0], merged)
    for d in dfs[1:]:
        out = out.unionByName(align_to_schema(d, merged))
    return out
