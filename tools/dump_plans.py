#!/usr/bin/env python
"""Dump FULL ``explain("formatted")`` output for named catalog entries.

Usage::

    python tools/dump_plans.py <outdir> <suffix> <query> [<query> ...]

Writes ``<outdir>/<query>_<suffix>.txt`` per query — the optimization-round
evidence files (plans/r11/<query>_before.txt / _after.txt).
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark import (  # noqa: E402
    get_spark,
)


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    qs = entry_mod.queries()
    sf = "/root/testdata/sf0.1"
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"# {name}: not in catalog, skipped", file=sys.stderr)
            continue
        df = fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{name}_{suffix}.txt").write_text(plan)
        print(f"# wrote {name}_{suffix}.txt ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
