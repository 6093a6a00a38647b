"""Extraction-plan language.

Mirrors the reference's JSON plan schema exactly (reference
``README.md:91-113``, ``MigrationPlans/.../example1-sybase.json``):
a plan is either a single job or a ``SequentialMultipleParts`` envelope
holding a ``Jobs`` array whose entries are hoisted one at a time onto
the envelope (reference ``routing/lambda_function.py:31-75``).

Key behavioral parity points:

* BOM-tolerant JSON load (``routing/lambda_function.py:21-23`` decodes
  utf-8-sig first, plain utf-8 as fallback).
* ``Active: false`` plans are dropped at intake
  (``routing/lambda_function.py:25-28``).
* The idempotency key is
  ``md5(SourceTable + str(MigrationPart) + Query.upper().strip())``
  (``routing/lambda_function.py:107-110``).
* ``NumPartitions`` is stringified on the wire and re-int'ed by the
  engine (``routing/lambda_function.py:60``, extractor usage) — we
  accept both.
* Blank-ish sentinel values: ``ColumnForPartitioningOnS3`` /
  ``ColumnForPartitioningOnSpark`` in ``{" ", "", None}`` mean
  "unpartitioned" (``sybaseiq_extractor.py:122,283``);
  ``ExpectedAmountOfRecords == " "`` means "skip reconciliation"
  (``postprocess/lambda_function.py:77``).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

BLANKISH = (" ", "", None)

def execution_hash_id(source_table: str, migration_part: Any, query: str) -> str:
    """Idempotency key — md5 over table + part + upper-stripped query
    (reference ``routing/lambda_function.py:107-110``)."""
    q = "" if query is None else str(query)
    code = f"{source_table}{migration_part}{q.upper().strip()}"
    return hashlib.md5(code.encode()).hexdigest()


def _is_blank(v: Any) -> bool:
    return v in BLANKISH or (isinstance(v, str) and v.strip() == "")


@dataclass
class ExtractionJob:
    """One executable unit: a query slice of one source table."""

    source_name: str
    source_database: str
    source_schema: str
    source_table: str
    query: str
    migration_part: int = 1
    expected_amount_of_records: Any = " "  # int, or " " = skip reconciliation
    num_partitions: int = 1
    lower_bound: str | None = None
    upper_bound: str | None = None
    column_for_partitioning_on_s3: str | None = None
    column_for_partitioning_on_spark: str | None = None
    job_name: str = "sybaseiq_extractor"
    worker_type: str = "G.1X"
    number_of_workers: int = 3
    jdbc_connection_string: str | None = None
    credentials_secret_arn: str | None = None
    origin_file: str | None = None

    @property
    def execution_hash_id(self) -> str:
        return execution_hash_id(self.source_table, self.migration_part, self.query)

    @property
    def partitioned_scan(self) -> bool:
        """Partitioned parallel scan vs single-connection scan
        (branch at ``sybaseiq_extractor.py:283``)."""
        return not _is_blank(self.column_for_partitioning_on_spark)

    @property
    def partitioned_sink(self) -> bool:
        """Partitioned vs unpartitioned output (``sybaseiq_extractor.py:122``)."""
        return not _is_blank(self.column_for_partitioning_on_s3)

    @property
    def reconciliation_enabled(self) -> bool:
        """Blank expected count skips reconciliation
        (``postprocess/lambda_function.py:77,97-98``)."""
        return not _is_blank(self.expected_amount_of_records)

    @property
    def target_table_name(self) -> str:
        """Catalog name ``{SourceName}_{SourceTable}``
        (``sybaseiq_extractor.py:163,254``)."""
        return f"{self.source_name}_{self.source_table}"

    @property
    def target_path_suffix(self) -> str:
        """``{SourceName}/{SourceSchema}/{SourceTable}/``
        (``sybaseiq_extractor.py:160,242``)."""
        return f"{self.source_name}/{self.source_schema}/{self.source_table}"

    @classmethod
    def from_plan_dict(cls, envelope: dict[str, Any], job: dict[str, Any]) -> ExtractionJob:
        # pick() IS the envelope→job field hoisting of the reference's
        # sequential plans (routing/lambda_function.py:43-59): a job
        # value wins, the envelope supplies the shared default.
        def pick(key: str, default: Any = None) -> Any:
            return job.get(key, envelope.get(key, default))

        def tolerant_int(key: str, default: int) -> int:
            # blank/null numeric fields fall back like NumPartitions
            # always has — int(None)/int(' ') must not turn a sloppy
            # but runnable plan into a parse crash
            try:
                return int(pick(key, default))
            except (TypeError, ValueError):
                return default

        num_partitions = tolerant_int("NumPartitions", 1)
        return cls(
            source_name=envelope["SourceName"],
            source_database=envelope["SourceDatabase"],
            source_schema=envelope["SourceSchema"],
            source_table=pick("SourceTable"),
            query=pick("Query"),
            migration_part=tolerant_int("MigrationPart", 1),
            expected_amount_of_records=pick("ExpectedAmountOfRecords", " "),
            num_partitions=num_partitions,
            lower_bound=pick("LowerBound"),
            upper_bound=pick("UpperBound"),
            column_for_partitioning_on_s3=pick("ColumnForPartitioningOnS3"),
            column_for_partitioning_on_spark=pick("ColumnForPartitioningOnSpark"),
            job_name=pick("JobName", "sybaseiq_extractor"),
            worker_type=pick("WorkerType", "G.1X"),
            number_of_workers=tolerant_int("NumberOfWorkers", 3),
            jdbc_connection_string=pick("JDBCConnectionString"),
            credentials_secret_arn=pick("CredentialsSecretArn"),
            origin_file=envelope.get("OriginFile"),
        )


@dataclass
class ExtractionPlan:
    """A parsed plan file: envelope + ordered jobs.

    Single-job plans become one-element ``jobs``; sequential plans keep
    their ``Jobs`` order (reference pops ``Jobs[0]`` repeatedly —
    ``routing/lambda_function.py:43-62`` — which is the same order).
    """

    source_name: str
    source_database: str
    source_schema: str
    active: bool = True
    sequential_multiple_parts: bool = False
    jobs: list[ExtractionJob] = field(default_factory=list)
    origin_file: str | None = None
    raw: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any], origin_file: str | None = None) -> ExtractionPlan:
        d = dict(d)
        if origin_file is not None:
            d.setdefault("OriginFile", origin_file)
        sequential = bool(d.get("SequentialMultipleParts", False))
        if sequential:
            raw_jobs = d.get("Jobs", [])
        else:
            raw_jobs = [d]
        plan = cls(
            source_name=d["SourceName"],
            source_database=d["SourceDatabase"],
            source_schema=d["SourceSchema"],
            active=bool(d.get("Active", True)),
            sequential_multiple_parts=sequential,
            origin_file=d.get("OriginFile"),
            raw=d,
        )
        plan.jobs = [ExtractionJob.from_plan_dict(d, j) for j in raw_jobs]
        return plan

    @classmethod
    def from_json_bytes(cls, data: bytes, origin_file: str | None = None) -> ExtractionPlan:
        """BOM-tolerant parse (reference ``routing/lambda_function.py:21-23``)."""
        try:
            d = json.loads(data.decode("utf-8-sig"))
        except (UnicodeDecodeError, json.JSONDecodeError):
            d = json.loads(data.decode("utf-8"))
        return cls.from_dict(d, origin_file=origin_file)

    @classmethod
    def from_file(cls, path: str | Path) -> ExtractionPlan:
        p = Path(path)
        return cls.from_json_bytes(p.read_bytes(), origin_file=str(p))

    def validate(self) -> list[str]:
        """Static plan checks; returns a list of problems (empty = ok)."""
        problems: list[str] = []
        for j in self.jobs:
            if not j.query or not str(j.query).strip():
                problems.append(f"part {j.migration_part}: empty Query")
            if isinstance(j.query, str) and j.query.rstrip().endswith(";"):
                problems.append(
                    f"part {j.migration_part}: Query must not end with ';' (README.md:101)"
                )
            if j.partitioned_scan:
                if j.lower_bound is None or j.upper_bound is None:
                    problems.append(
                        f"part {j.migration_part}: partitioned scan needs LowerBound/UpperBound"
                    )
                if j.num_partitions < 1:
                    problems.append(f"part {j.migration_part}: NumPartitions must be >= 1")
        return problems
