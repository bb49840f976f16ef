"""Plan-shape regression tests: the physical properties PLANS.md claims
(pushdown, broadcast, top-k, partial aggregation) must survive refactors.
Checked on sf0.001 — plan shape is scale-invariant."""

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    from opentick_spark.workload import QUERIES

    return QUERIES


def test_range_scan_pushdown(spark, queries):
    plan = plan_of(queries["pk_range_scan"](spark, SF))
    assert "PushedFilters" in plan
    # (the PushedFilters list is elided in toString; the codegen Filter
    # shows the full conjunction)
    assert "GreaterThanOrEqual(ts" in plan
    assert "EqualTo(user_id,7)" in plan
    assert "< 1705708800000000000" in plan


def test_tail_limit_is_topk(spark, queries):
    plan = plan_of(queries["tail_limit"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_star_join_broadcasts_dims(spark, queries):
    plan = plan_of(queries["revenue_by_nation"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # fact table must not shuffle-join


def test_agg_is_partial_final(spark, queries):
    plan = plan_of(queries["pricing_summary"](spark, SF))
    # partial+final hash aggregation (map-side combine before exchange)
    assert plan.count("HashAggregate") >= 2


def test_rank_topn_uses_window_group_limit(spark, queries):
    plan = plan_of(queries["window_rank_topn"](spark, SF))
    assert "WindowGroupLimit" in plan


def test_dedup_text_paths_have_no_python_udf(spark, queries):
    # text/dedup hot paths must stay JVM-side (no BatchEvalPython /
    # ArrowEvalPython stages)
    for name in ["dedup_exact", "dedup_ngram_jaccard", "text_quality", "text_token_count_total"]:
        plan = plan_of(queries[name](spark, SF))
        assert "EvalPython" not in plan, name
