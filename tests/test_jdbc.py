"""Real JDBC end-to-end coverage (SURVEY.md §2.1 S1/S2/S3).

The sandbox has no network database, but Spark ships Apache Derby
(embedded, in-process JDBC) on its classpath — so the actual
``spark.read.format("jdbc")`` codepath in
``sources/registry.py::jdbc_scan`` can be exercised against a real JDBC
URL, in both reference modes:

* partitioned derived-table scan — ``(query) q`` + partitionColumn /
  bounds / numPartitions (``sybaseiq_extractor.py:283-293``)
* single-connection ``query`` pushdown (``sybaseiq_extractor.py:314-320``)

plus the full plan → Engine.run_job → parquet+catalog flow with
credentials resolved through the secrets source.
"""

from __future__ import annotations

import pytest

from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sources.registry import (
    JDBC_ADAPTERS,
    SourceRegistry,
)

N_ROWS = 100


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory) -> str:
    """Create an embedded Derby database seeded with ``orders_src``."""
    tmp = tmp_path_factory.mktemp("derby")
    jvm = spark._jvm
    jvm.java.lang.System.setProperty("derby.system.home", str(tmp))
    url = f"jdbc:derby:{tmp}/db"
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE orders_src (id INT PRIMARY KEY, amount DOUBLE, name VARCHAR(30))"
    )
    ps = conn.prepareStatement("INSERT INTO orders_src VALUES (?, ?, ?)")
    for i in range(1, N_ROWS + 1):
        ps.setInt(1, i)
        ps.setDouble(2, i * 1.5)
        ps.setString(3, f"row{i}")
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()
    return url


def test_jdbc_partitioned_scan_roundtrip(spark, derby_url):
    """S1: partitioned derived-table scan — N range splits become N
    Spark partitions, all rows arrive exactly once."""
    reg = SourceRegistry(spark, jdbc_enabled=True)
    df = reg.jdbc_scan(
        url=derby_url,
        query="SELECT id, amount, name FROM orders_src",
        user="app",
        password="app",
        partition_column="id",
        lower_bound="1",
        upper_bound=str(N_ROWS),
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == N_ROWS
    assert {r.ID for r in rows} == set(range(1, N_ROWS + 1))


def test_jdbc_query_mode_roundtrip(spark, derby_url):
    """S2: single-connection query pushdown — the WHERE clause executes
    in the source engine, only matching rows cross the wire."""
    reg = SourceRegistry(spark, jdbc_enabled=True)
    df = reg.jdbc_scan(
        url=derby_url,
        query="SELECT id, name FROM orders_src WHERE id <= 10",
        user="app",
        password="app",
    )
    assert df.count() == 10
    assert [c.upper() for c in df.columns] == ["ID", "NAME"]


def test_jdbc_adapter_registry_has_derby():
    """S3: per-engine adapter map (reference ``adapt_postgre.json``
    model) resolves a driver class for every supported engine."""
    assert JDBC_ADAPTERS["derby"]["DRIVER"] == "org.apache.derby.jdbc.EmbeddedDriver"
    opts = SourceRegistry.jdbc_scan_options(
        "jdbc:derby:/x/db", "SELECT 1 FROM t", "u", "p", engine="derby"
    )
    assert opts["driver"] == "org.apache.derby.jdbc.EmbeddedDriver"


def test_engine_runs_jdbc_job_end_to_end(spark, derby_url, tmp_path):
    """Plan JSON → Engine.run_job over a real JDBC source: partitioned
    extraction, reconciliation against ExpectedAmountOfRecords, parquet
    sink + catalog registration."""
    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.engine import (
        Engine,
        EngineConfig,
    )
    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.plans.model import (
        ExtractionJob,
    )
    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sinks.ledger import (
        Ledger,
    )
    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sinks.notify import (
        NotificationLog,
    )

    eng = Engine(
        spark,
        SourceRegistry(spark, jdbc_enabled=True),
        EngineConfig(target_root=str(tmp_path / "lake"), target_database="db_jdbc"),
        Ledger(tmp_path / "ledger.jsonl"),
        NotificationLog(tmp_path / "notify.jsonl"),
    )
    job = ExtractionJob(
        source_name="derbysrc",
        source_database="db",
        source_schema="app",
        source_table="orders_src",
        query="SELECT id, amount, name FROM orders_src",
        expected_amount_of_records=N_ROWS,
        num_partitions=4,
        lower_bound="1",
        upper_bound=str(N_ROWS),
        column_for_partitioning_on_spark="id",
        jdbc_connection_string=derby_url,
        credentials_secret_arn='{"user": "app", "password": "app"}',
    )
    res = eng.run_job(job)
    assert res.status == "SUCCEEDED"
    assert res.row_count == N_ROWS
    assert res.reconcile_status == "ok"
    got = spark.sql("SELECT count(*) AS c FROM db_jdbc.derbysrc_orders_src").collect()
    assert got[0].c == N_ROWS
    spark.sql("DROP TABLE db_jdbc.derbysrc_orders_src")
