"""Source registry + scan operators (SURVEY.md §2.1, S1-S3).

The reference reads from a remote RDBMS over partitioned JDBC
(``sybaseiq_extractor.py:283-293``).  The new engine treats sources as
named tables resolved by a registry:

* ``parquet`` sources (the test/bench path, and the data-lake path at
  scale): directory of parquet per table, registered as temp views so
  plan queries run with ``spark.sql`` and Catalyst pushes
  filters/column pruning into the scan.
* ``jdbc`` sources: same plan fields mapped onto Spark's built-in JDBC
  partitioned reader, with a per-engine adapter registry mirroring
  ``adapt_postgre.json`` (S3).

S1's *compute-partition spec* (NumPartitions range splits on an
integer/date column) maps to the JDBC reader's
``partitionColumn/lowerBound/upperBound/numPartitions`` for real JDBC
sources; for parquet sources parallelism comes from the file scan, and
``ranged_scan`` exposes the same semantics (bounded slice, optional
range repartition) natively.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: canonical test/bench tables (TESTDATA.md)
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: per-engine JDBC adapter config, shape-compatible with the reference's
#: ``adapt_postgre.json`` (keys JDBC_URL / SUFIX_JDBC_URL / DRIVER).
JDBC_ADAPTERS: dict[str, dict[str, str]] = {
    "postgres": {
        "JDBC_URL": "jdbc:postgresql://",
        "SUFIX_JDBC_URL": "",
        "DRIVER": "org.postgresql.Driver",
    },
    "sybaseiq": {
        "JDBC_URL": "jdbc:sybase:Tds:",
        "SUFIX_JDBC_URL": "",
        "DRIVER": "com.sybase.jdbc4.jdbc.SybDriver",
    },
    # Embedded in-process engine shipped with Spark itself; used by the
    # test suite to exercise the real JDBC codepath without a server.
    "derby": {
        "JDBC_URL": "jdbc:derby:",
        "SUFIX_JDBC_URL": "",
        "DRIVER": "org.apache.derby.jdbc.EmbeddedDriver",
    },
}


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark 4 cannot read
    them natively (PARQUET_TYPE_ILLEGAL); detected from the footer."""
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as pat

        p = Path(path)
        f = p if p.is_file() else next(p.rglob("*.parquet"), None)
        if f is None:
            return []
        schema = pq.read_schema(str(f))
        return [
            fld.name
            for fld in schema
            if pat.is_timestamp(fld.type) and fld.type.unit == "ns"
        ]
    except Exception:
        return []


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` tolerant of nanosecond timestamps.

    TIMESTAMP(NANOS) columns are read via the ``nanosAsLong`` legacy
    mode and converted to microsecond timestamps (``ns DIV 1000`` —
    same floor-truncation DuckDB applies when reading ns parquet), so
    downstream semantics match the oracle.
    """
    ns_cols = _nanos_timestamp_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    return df.withColumns(
        {c: F.timestamp_micros(F.expr(f"`{c}` div 1000")) for c in ns_cols}
    )


#: formats the file-source path supports beyond parquet.  CSV/JSON get
#: schema inference ONLY when no explicit schema is passed — at real
#: scale always pass one (inference is a full extra pass over the data).
FILE_FORMATS = ("parquet", "csv", "json", "orc")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Format-dispatching file read (S1's non-JDBC side).

    Parquet goes through :func:`read_parquet` (ns-timestamp tolerant);
    CSV defaults to ``header=true`` and both CSV/JSON infer the schema
    only when none is given.  All formats are splittable sources here
    (CSV/JSON uncompressed, ORC/parquet natively), so partitioned scans
    and predicate pushdown behave the same way downstream.
    """
    if fmt not in FILE_FORMATS:
        raise ValueError(f"unsupported source format: {fmt!r} (one of {FILE_FORMATS})")
    if fmt == "parquet" and schema is None:
        if not options:
            return read_parquet(spark, path)
        # options present: still refuse to silently bypass the
        # ns-timestamp handling — a TIMESTAMP(NANOS) file would either
        # crash (PARQUET_TYPE_ILLEGAL) or, if a prior read already set
        # the session-wide nanosAsLong conf, come back as raw BIGINT
        # nanoseconds with a silently different schema.
        if _nanos_timestamp_columns(path):
            raise ValueError(
                f"read_source: {path} holds TIMESTAMP(NANOS) columns; "
                "reader options are not supported on the ns-tolerant "
                "parquet path — read without options or normalize the "
                "file to microsecond timestamps first"
            )
    reader = spark.read.format(fmt)
    if fmt == "csv":
        options = {"header": "true", **options}
        if schema is None:
            options.setdefault("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).load(path)


#: (session id, view name) -> sf_dir already registered; avoids paying
#: footer reads + view DDL on every catalog query in the same session.
_VIEW_CACHE: dict[tuple[int, str], str] = {}


def register_parquet_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register ``{sf_dir}/{table}.parquet`` as temp views named ``table``.

    Missing files are skipped so the registry works for partial layouts.
    Idempotent per (session, dir): re-registration is skipped unless the
    same view name was last bound to a different directory.
    """
    registered = []
    sid = id(spark)
    for t in tables or TESTDATA_TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        # cache key is the FULL bound path (shared with
        # register_views_for_query) so a rebind to another dataset is
        # never mistaken for "already registered"
        if _VIEW_CACHE.get((sid, t)) == str(p):
            registered.append(t)
            continue
        if p.exists():
            read_parquet(spark, str(p)).createOrReplaceTempView(t)
            _VIEW_CACHE[(sid, t)] = str(p)
            registered.append(t)
    return registered


def load_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return read_parquet(spark, str(Path(sf_dir) / f"{table}.parquet"))


def table_row_count(sf_dir: str, table: str) -> int:
    """Exact row count from parquet FOOTER metadata only — no Spark
    job, no data scan.  Corpus-adaptive operators (e.g. SemDeDup's
    cluster-count policy) need N before building their plan; a
    ``df.count()`` there would add a full pass over the table (at
    100 TB, a pass over the embeddings table just to pick a knob).
    Footers are O(files) metadata reads — the same information a
    lakehouse catalog would serve from stats."""
    import pyarrow.parquet as pq

    p = Path(sf_dir) / f"{table}.parquet"
    if p.is_dir():
        return sum(
            pq.ParquetFile(str(f)).metadata.num_rows
            for f in sorted(p.rglob("*.parquet"))
        )
    return pq.ParquetFile(str(p)).metadata.num_rows


@dataclass
class SourceRegistry:
    """Resolves plan coordinates → DataFrames/views.

    ``(SourceName, SourceDatabase, SourceSchema, SourceTable)`` →
    parquet path or JDBC endpoint.  Parquet is the default; JDBC kicks
    in when a job carries ``JDBCConnectionString`` and
    ``jdbc_enabled=True`` (needs the driver jar on the classpath, which
    the test image doesn't ship — the option-building logic is still
    unit-testable).
    """

    spark: SparkSession
    parquet_root: str | None = None
    table_paths: dict[str, str] = field(default_factory=dict)
    #: per-table source format ("parquet" default; csv/json/orc)
    table_formats: dict[str, str] = field(default_factory=dict)
    jdbc_enabled: bool = False

    def resolve_path(self, table: str) -> str | None:
        if table in self.table_paths:
            return self.table_paths[table]
        if self.parquet_root:
            ext = self.table_formats.get(table, "parquet")
            for candidate in (f"{table}.{ext}", table):
                p = Path(self.parquet_root) / candidate
                if p.exists():
                    return str(p)
        return None

    def read_table(self, table: str, schema=None, **options) -> DataFrame:
        """Resolve + read a registered table in its declared format."""
        path = self.resolve_path(table)
        if path is None:
            raise FileNotFoundError(table)
        return read_source(
            self.spark, path, self.table_formats.get(table, "parquet"),
            schema=schema, **options,
        )

    def register_views_for_query(self, tables: list[str] | None = None) -> dict[str, str]:
        """Register views for the tables a plan query may touch; returns
        the table-name → view-name map for the dialect rewriter."""
        if tables is None:
            tables = list(dict.fromkeys(list(self.table_paths) + TESTDATA_TABLES))
        mapping: dict[str, str] = {}
        sid = id(self.spark)
        for t in tables:
            path = self.resolve_path(t)
            if path:
                # consult AND maintain the shared view cache: skipping
                # when the view is already bound to this exact path
                # avoids a footer read + DDL per table per job (a
                # 50-part chain was paying ~500 of them), and writing
                # the binding back keeps register_parquet_views from
                # falsely skipping after we rebind a name elsewhere.
                if _VIEW_CACHE.get((sid, t)) != path:
                    read_source(
                        self.spark, path, self.table_formats.get(t, "parquet")
                    ).createOrReplaceTempView(t)
                    _VIEW_CACHE[(sid, t)] = path
                mapping[t] = t
        return mapping

    # ---- JDBC path (S1/S2/S3) ------------------------------------------

    @staticmethod
    def jdbc_scan_options(
        url: str,
        query: str,
        user: str,
        password: str,
        partition_column: str | None = None,
        lower_bound: str | None = None,
        upper_bound: str | None = None,
        num_partitions: int | None = None,
        engine: str | None = None,
        source_dialect: str | None = None,
    ) -> dict[str, str]:
        """Build the option dict for Spark's JDBC reader.

        Partitioned: derived-table pushdown ``(query) q`` + range splits
        (``sybaseiq_extractor.py:283-293``).  Unpartitioned: single
        connection via the ``query`` option (``sybaseiq_extractor.py:314-320``).

        ``source_dialect="tsql"``: the plan query is Sybase/T-SQL but
        the target ``engine`` is one of the OTHER adapters — rewrite it
        into the engine's dialect (``plans.dialect.to_source_sql``)
        before it ships.  Default (None) keeps the reference's verbatim
        contract.
        """
        if source_dialect == "tsql":
            from ..plans.dialect import to_source_sql

            query = to_source_sql(query, engine=engine or "sybaseiq")
        elif source_dialect is not None:
            raise ValueError(f"unknown source_dialect {source_dialect!r}")
        opts: dict[str, str] = {"url": url, "user": user, "password": password}
        if engine and engine in JDBC_ADAPTERS:
            opts["driver"] = JDBC_ADAPTERS[engine]["DRIVER"]
        if partition_column and str(partition_column).strip():
            if lower_bound is None or upper_bound is None:
                raise ValueError(
                    "jdbc_scan_options: partition_column="
                    f"{partition_column!r} requires LowerBound and "
                    "UpperBound (str(None) would reach Spark's JDBC "
                    "reader as the literal 'None' and fail deep in the "
                    "read, after credentials were already fetched)"
                )
            opts.update(
                {
                    "dbtable": f"({query}) q",
                    "partitionColumn": str(partition_column),
                    "lowerBound": str(lower_bound),
                    "upperBound": str(upper_bound),
                    "numPartitions": str(num_partitions or 1),
                }
            )
        else:
            opts["query"] = query
        return opts

    def jdbc_scan(self, **kwargs) -> DataFrame:
        opts = self.jdbc_scan_options(**kwargs)
        return self.spark.read.format("jdbc").options(**opts).load()

    def register_jdbc_catalog(
        self,
        name: str,
        url: str,
        user: str = "",
        password: str = "",
        engine: str | None = None,
        push_down_aggregate: bool = True,
        push_down_limit: bool = True,
    ) -> None:
        """Register a DSv2 JDBC *catalog* (Spark's ``JDBCTableCatalog``)
        so source tables are addressable as ``{name}.{schema}.{table}``
        in SQL — and, unlike the DSv1 ``spark.read.jdbc`` path, Catalyst
        pushes MIN/MAX/COUNT/SUM/AVG aggregations (plus LIMIT) down to
        the source engine, visible as ``PushedAggregates`` in the scan.

        This is the reference's push-work-to-the-source posture
        (``sybaseiq_extractor.py:286`` ships whole queries to IQ)
        expressed through Catalyst's own pushdown rules instead of
        hand-built query strings: a ``GROUP BY`` over a huge source
        table transfers one row per group over the wire, not the
        table.  The S1/S2 ``jdbc_scan`` path stays the extraction
        workhorse (range-partitioned parallel reads); the catalog tier
        serves interactive aggregation against the source."""
        conf = self.spark.conf
        base = f"spark.sql.catalog.{name}"
        conf.set(
            base,
            "org.apache.spark.sql.execution.datasources.v2.jdbc."
            "JDBCTableCatalog",
        )
        conf.set(f"{base}.url", url)
        if user:
            conf.set(f"{base}.user", user)
        if password:
            conf.set(f"{base}.password", password)
        if engine and engine in JDBC_ADAPTERS:
            conf.set(f"{base}.driver", JDBC_ADAPTERS[engine]["DRIVER"])
        conf.set(
            f"{base}.pushDownAggregate",
            "true" if push_down_aggregate else "false",
        )
        conf.set(
            f"{base}.pushDownLimit", "true" if push_down_limit else "false"
        )


def ranged_scan(
    df: DataFrame,
    column: str,
    lower_bound,
    upper_bound,
    num_partitions: int | None = None,
) -> DataFrame:
    """Native analog of the partitioned JDBC scan (S1): bounded slice on
    ``column`` with optional range repartition for downstream locality.

    The bound filter is a plain Catalyst predicate, so it pushes into
    the parquet scan; ``repartitionByRange`` reproduces the "N range
    splits" layout when a specific parallelism is requested.
    """
    out = df.filter((F.col(column) >= F.lit(lower_bound)) & (F.col(column) <= F.lit(upper_bound)))
    if num_partitions and num_partitions > 1:
        out = out.repartitionByRange(num_partitions, F.col(column))
    return out
