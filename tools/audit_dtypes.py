#!/usr/bin/env python
"""Cross-engine dtype audit for every catalog entry.

The driver's canonicalizer (and the local harness) renders values after
a pandas round trip; a column that is int64/double on one engine but
object (Spark DECIMAL) or a different numeric class on the other can
hash-mismatch even when the values are equal (pandas ``iterrows``
upcasts mixed rows; ``Decimal`` reprs differ from floats).  This tool
runs every oracle-backed entry at sf0.001 and flags any column whose
pandas dtype *class* (int / float / object / bool / datetime) differs
between the Spark result and the DuckDB oracle result.

Run:  python tools/audit_dtypes.py      (exit 1 if any mismatch)
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _dtype_class(dtype) -> str:
    s = str(dtype)
    if s.startswith("int") or s.startswith("uint"):
        return "int"
    if s.startswith("float"):
        return "float"
    if s.startswith("datetime"):
        return "datetime"
    if s == "bool":
        return "bool"
    return "object"


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (
        get_spark,
    )

    spark = get_spark(app_name="dtype_audit")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad: list[str] = []
    for name, fn in queries.items():
        if name not in oracles:
            continue
        try:
            spdf = fn(spark, SF_DIR).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # surface, keep auditing
            bad.append(f"{name}: ERROR {exc}")
            continue
        for col in spdf.columns:
            if col not in odf.columns:
                bad.append(f"{name}.{col}: missing on oracle side")
                continue
            a, b = _dtype_class(spdf[col].dtype), _dtype_class(odf[col].dtype)
            # empty object columns are indistinguishable; int-vs-float on a
            # column is exactly the iterrows-upcast hazard -> flag it
            if a != b:
                bad.append(f"{name}.{col}: spark={spdf[col].dtype} duck={odf[col].dtype}")
            # container-valued cells (list/ndarray/dict) are unhashable in
            # the driver's pandas canonicalizer (`TypeError: unhashable
            # type: 'list'` killed array_functions_sampler in round 3) —
            # any top-level ARRAY/MAP output must be serialized
            # (array_join / to_json) in BOTH dialects before emission.
            for frame, eng in ((spdf, "spark"), (odf, "duck")):
                s = frame[col].dropna()
                if len(s) and (
                    isinstance(s.iloc[0], (list, tuple, dict, set))
                    or type(s.iloc[0]).__name__ == "ndarray"
                ):
                    bad.append(
                        f"{name}.{col}: {eng} emits container values "
                        f"({type(s.iloc[0]).__name__}) — unhashable in the "
                        "driver canonicalizer"
                    )
    if bad:
        print("DTYPE MISMATCHES:")
        for line in bad:
            print(" ", line)
        return 1
    print(f"OK: {sum(1 for n in queries if n in oracles)} entries dtype-consistent")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
