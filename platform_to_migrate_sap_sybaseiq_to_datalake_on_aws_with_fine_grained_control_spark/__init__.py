"""PySpark-native analytics/ETL engine with the capabilities of the
``aws-samples/platform-to-migrate-sap-sybaseiq-to-datalake-on-aws-with-fine-grained-control``
reference platform, re-expressed Spark-first.

The reference (see SURVEY.md) is a JSON-plan-driven extraction platform:
a plan carries a free-form SQL ``Query`` plus parallelism/partitioning
parameters; the engine executes the query with partitioned parallel
reads, runs a fixed cleaning pipeline (identifier normalization, string
trim, audit columns, date-part derivation), writes Hive-partitioned
Parquet registered in a catalog, and records lineage + row-count
reconciliation in a ledger.

This package implements that surface natively on Spark
(DataFrame/SQL/Catalyst/Structured Streaming) plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) described in SURVEY.md §7 M4.

Layout:
    plans/      plan language (JSON schema <-> dataclass), SQL dialect rewrite
    sources/    source registry (parquet/JDBC), plan queue
    operators/  cleaning pipeline, layout control, dedup, similarity, text
    functions/  portable column-expression builders (Spark + DuckDB oracle)
    sinks/      partitioned parquet + catalog sink, ledger, notification log
    streaming/  structured-streaming analogs (queue drain, windowed aggs)
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
