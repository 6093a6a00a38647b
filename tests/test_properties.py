"""Property-based tests (hypothesis) for driver-side primitives, plus
statistical bound checks for the approximate operators."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.operators.cleaning import (
    fix_col_name,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.operators.layout import (
    coalesce_tier,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.plans.dialect import (
    rewrite_bracket_identifiers,
    to_spark_sql,
)
from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.plans.model import (
    execution_hash_id,
)


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_fix_col_name_always_catalog_safe(name):
    out = fix_col_name(name)
    # output only ever contains [a-z0-9_] (Athena/Glue-safe, lowercased)
    assert re.fullmatch(r"[a-z0-9_]*", out) is not None


@given(st.text(alphabet=st.characters(blacklist_characters="[]'", max_codepoint=0x2FF), max_size=60))
@settings(max_examples=200, deadline=None)
def test_bracket_rewrite_identity_without_brackets(sql):
    # no brackets, no strings => rewrite is the identity
    assert rewrite_bracket_identifiers(sql) == sql


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters="[]'", min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=20,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None)
def test_bracket_rewrite_brackets_to_backticks(idents):
    sql = " ".join(f"[{i}]" for i in idents)
    out = rewrite_bracket_identifiers(sql)
    assert out == " ".join(f"`{i}`" for i in idents)


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_string_literals_never_rewritten(payload):
    inner = payload.replace("'", "''")
    sql = f"SELECT '{inner}' FROM t"
    assert f"'{inner}'" in to_spark_sql(sql)


@given(st.text(min_size=1, max_size=50), st.integers(1, 9), st.text(min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_execution_hash_id_stable_and_case_insensitive(tbl, part, query):
    a = execution_hash_id(tbl, part, query)
    assert a == execution_hash_id(tbl, part, query)  # deterministic
    assert a == execution_hash_id(tbl, part, query.upper())  # case-folded
    assert a == execution_hash_id(tbl, part, f"  {query}  ")  # stripped
    assert re.fullmatch(r"[0-9a-f]{32}", a)


@given(st.integers(0, 10**12))
@settings(max_examples=300, deadline=None)
def test_coalesce_tier_monotone_bounded(n):
    t = coalesce_tier(n)
    assert t in (8, 16, 24)
    assert coalesce_tier(n) <= coalesce_tier(n + 10**9)


def test_approx_count_distinct_error_bound(spark):
    """approx_count_distinct(rsd=0.02) must land within 3×rsd of exact
    (no cross-engine oracle possible — sketches differ)."""
    from pyspark.sql import functions as F

    from platform_to_migrate_sap_sybaseiq_to_datalake_on_aws_with_fine_grained_control_spark.sources.registry import (
        load_table,
    )
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    approx = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("n"))
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(1, 0.06 * ex), (k, approx[k], ex)
