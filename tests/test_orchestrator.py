"""End-to-end orchestrator tests: queue dirs, dispatch, dedup gate,
sequential chains, reconciliation outcomes, plan-file lifecycle."""

from __future__ import annotations

import json

import pytest

from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.engine import (
    Engine,
    EngineConfig,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.orchestrator import (
    Orchestrator,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.plans.model import (
    ExtractionPlan,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sinks.ledger import (
    Ledger,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sinks.notify import (
    NotificationLog,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sources.registry import (
    SourceRegistry,
)
from tests.conftest import SF_SMALL


@pytest.fixture()
def orch(spark, tmp_path):
    eng = Engine(
        spark,
        SourceRegistry(spark, parquet_root=SF_SMALL),
        EngineConfig(target_root=str(tmp_path / "lake"), register_catalog=False),
        Ledger(tmp_path / "ledger.jsonl"),
        NotificationLog(tmp_path / "notify.jsonl"),
    )
    return Orchestrator(eng, tmp_path / "queue")


def _plan_dict(query="SELECT * FROM region", table="region", part=1, **kw):
    d = {
        "SourceName": "sybaseiq",
        "SourceDatabase": "iqdemo",
        "SourceSchema": "dba",
        "SourceTable": table,
        "Query": query,
        "MigrationPart": part,
        "ExpectedAmountOfRecords": " ",
    }
    d.update(kw)
    return d


def test_run_now_queue_lifecycle(orch):
    qdir = orch.queue_root / "run_now"
    (qdir / "good.json").write_text(json.dumps(_plan_dict()))
    (qdir / "done_old.json").write_text(json.dumps(_plan_dict()))  # skipped: 'done'
    (qdir / "notes.txt").write_text("not a plan")

    outcomes = orch.dispatch({})
    assert len(outcomes) == 1
    assert outcomes[0].succeeded
    assert not (qdir / "good.json").exists()
    assert (orch.queue_root / "succeeded" / "good.json").exists()
    assert (qdir / "done_old.json").exists()  # untouched


def test_failed_plan_moves_to_failed(orch):
    qdir = orch.queue_root / "run_now"
    (qdir / "bad.json").write_text(
        json.dumps(_plan_dict(query="SELECT * FROM no_such_table"))
    )
    outcomes = orch.run_now()
    assert not outcomes[0].succeeded
    assert (orch.queue_root / "failed" / "bad.json").exists()
    # ledger recorded the failure
    state = orch.engine.ledger.current_state()
    assert any(v.get("GlueJobFinalStatus") == "FAILED" for v in state.values())


def test_dedup_gate_skips_second_run(orch):
    plan = ExtractionPlan.from_dict(_plan_dict())
    first = orch.run_plan(plan)
    assert first.results and first.results[0].status == "SUCCEEDED"
    second = orch.run_plan(plan)
    assert second.results == [] and len(second.skipped) == 1
    # skip marker row recorded (JobHasRunOrIsRunning-…)
    assert any(
        str(k[0]).startswith("JobHasRunOrIsRunning-")
        for k in orch.engine.ledger.current_state()
    )


def test_sequential_chain_continues_past_failure(orch):
    plan = ExtractionPlan.from_dict(
        {
            "SourceName": "sybaseiq",
            "SourceDatabase": "iqdemo",
            "SourceSchema": "dba",
            "SequentialMultipleParts": True,
            "Jobs": [
                _plan_dict(part=1),
                _plan_dict(query="SELECT * FROM missing_tbl", table="nation", part=2),
                _plan_dict(query="SELECT * FROM nation", table="nation", part=3),
            ],
        }
    )
    out = orch.run_plan(plan)
    statuses = [r.status for r in out.results]
    assert statuses == ["SUCCEEDED", "FAILED", "SUCCEEDED"]
    assert not out.succeeded


def test_inactive_plan_dropped(orch):
    out = orch.run_plan(ExtractionPlan.from_dict(_plan_dict(Active=False)))
    assert out.results == [] and out.skipped == []


def test_reconciliation_warning_notification(orch):
    plan = ExtractionPlan.from_dict(
        _plan_dict(ExpectedAmountOfRecords=123456789)  # will mismatch
    )
    out = orch.run_plan(plan)
    assert out.results[0].reconcile_status == "mismatch"
    subjects = [e["subject"] for e in orch.engine.notifications.entries()]
    assert any(" WITH WARNING" in s and "[WITH WARNING]" not in s for s in subjects)
    assert all(len(s) <= 99 for s in subjects)


def test_schedule_scan(orch):
    d = orch.queue_root / "run_on_schedule_2"
    d.mkdir(parents=True, exist_ok=True)
    (d / "a.json").write_text(json.dumps(_plan_dict()))
    outcomes = orch.dispatch({"schedule_number": 2})
    assert len(outcomes) == 1 and outcomes[0].succeeded
