"""Plan-shape tests — pin the physical strategies that keep queries viable
at 100 TB (SURVEY.md §4): pushdown, pruning, broadcast, codegen, shuffle
counts. These are the Spark-native analogs of the reference's manual
optimizations (rowRestriction pushdown, side-input broadcast, typed-read
column pruning)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from example_beam_spark.plans import (
    has_broadcast_join,
    has_pushed_filter,
    num_exchanges,
    read_schema_columns,
    wholestage_codegen_spans,
)
from example_beam_spark.registry import load_registry
from example_beam_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def test_like_predicate_pushed_to_scan(spark):
    """S5 analog: `name LIKE '%9%'` must reach the parquet reader as
    StringContains (the rowRestriction equivalent)."""
    q = load_registry()["part_name_like"]
    assert has_pushed_filter(q.fn(spark, SF), "StringContains")


def test_equality_and_range_filters_pushed(spark):
    df = load_table(spark, SF, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000.0)
    )
    assert has_pushed_filter(df, "EqualTo(o_orderstatus,F)")
    assert has_pushed_filter(df, "GreaterThan(o_totalprice,1000.0)")


def test_column_pruning_reaches_scan(spark):
    """P9 analog: a two-column projection must scan two columns, not the
    whole lineitem schema."""
    df = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    cols = read_schema_columns(df, "lineitem.parquet")
    assert cols == {"l_orderkey", "l_quantity"}, cols


def test_small_dims_broadcast_in_q5(spark):
    """J1 analog: region/nation/customer/supplier stay broadcast —
    Catalyst must not sort-merge-shuffle the dimension joins."""
    q = load_registry()["q5_revenue_by_nation"]
    assert has_broadcast_join(q.fn(spark, SF))


def test_broadcast_enrich_has_no_fact_shuffle(spark):
    """enrich_broadcast_latest joins facts to a broadcast dimension: the
    fact side must reach the join without a hash-partition exchange."""
    q = load_registry()["enrich_broadcast_latest"]
    df = q.fn(spark, SF)
    assert has_broadcast_join(df)
    # only the dim-side dedup aggregation may shuffle (its input is tiny)
    assert num_exchanges(df) <= 2, num_exchanges(df)


def test_flagship_ctr_is_one_shuffle(spark):
    """The flagship windowed CTR is partial+final HashAggregate around
    exactly ONE exchange — the Combine.perKey shape (SURVEY §3.1)."""
    q = load_registry()["ctr_fixed_capped"]
    df = q.fn(spark, SF)
    assert num_exchanges(df) == 1, num_exchanges(df)
    assert wholestage_codegen_spans(df) >= 1


def test_q1_single_shuffle_aggregation(spark):
    q = load_registry()["q1_pricing_summary"]
    assert num_exchanges(q.fn(spark, SF)) == 1


def test_exists_plans_as_semi_join(spark):
    """q4: the EXISTS subquery must execute as one left-semi join, not a
    duplicating inner join + distinct."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["q4_late_orders"]
    plan = explain_formatted(q.fn(spark, SF))
    assert "LeftSemi" in plan, plan


def test_not_in_plans_as_broadcast_anti_join(spark):
    """q16: the NOT IN exclusion set must execute as a broadcast
    left-anti join over the fact side."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["q16_supplier_cnt"]
    plan = explain_formatted(q.fn(spark, SF))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan, plan


def test_scalar_subquery_is_single_broadcast(spark):
    """q22: the AVG threshold is one broadcast row, not a per-row
    subquery; NOT EXISTS is an anti join."""
    from example_beam_spark.plans import explain_formatted

    import re

    q = load_registry()["q22_rich_idle_customers"]
    plan = explain_formatted(q.fn(spark, SF))
    assert "LeftAnti" in plan
    # exactly one nested-loop join (the 1-row threshold broadcast); the
    # formatted plan names each node twice (tree + detail block), so count
    # detail blocks only
    nlj = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, flags=re.MULTILINE)
    assert len(nlj) == 1, plan


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Bucketing demo — the 100 TB co-located join path: write both join
    sides bucketed by the join key into a warehouse table, then join the
    bucketed tables. Neither side may shuffle (zero Exchange nodes): the
    scan partitioning already satisfies the join's distribution. This is
    the strategy for repeated fact-fact joins at scale (e.g. lineitem ×
    orders on orderkey), where re-shuffling 100 TB per query would
    dominate the runtime."""
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{tmp_path}'")
    try:
        for df, name, key in (
            (orders, "orders_b", "o_orderkey"),
            (li, "lineitem_b", "l_orderkey"),
        ):
            (
                df.write.mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(f"bucketdemo.{name}")
            )
        ob = spark.table("bucketdemo.orders_b")
        lb = spark.table("bucketdemo.lineitem_b")
        # disable broadcast so the join would shuffle if bucketing failed
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            assert num_exchanges(joined) == 0, joined._jdf.queryExecution().toString()
            assert joined.count() > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")


def test_sample_stratified_is_scan_shaped(spark):
    """Deterministic hash sampling must stay a scan + filter — zero
    exchanges; at 100 TB the sample IS the scan."""
    q = load_registry()["docs_sample_stratified"]
    assert num_exchanges(q.fn(spark, SF)) == 0


def test_pack_sequences_two_phase_no_single_task_window(spark):
    """Sequence packing (round-11 two-phase rewrite): every window is
    partitioned — no Exchange SinglePartition funnels per-document rows
    into one task (the round-10 per-language window did) — the summary
    side broadcasts back, and both consumers (cumsum window +
    bucket-totals aggregate) read the PERSISTED token summary
    (InMemoryTableScan in the executed plan), so text is tokenized
    exactly once."""
    from example_beam_spark.plans import explain_formatted
    from example_beam_spark.registry import drain_cleanups

    q = load_registry()["docs_pack_sequences"]
    try:
        df = q.fn(spark, SF)
        plan = explain_formatted(df)
        assert "SinglePartition" not in plan, plan[:3000]
        assert "BroadcastHashJoin" in plan, plan[:3000]
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in executed, executed[:3000]
    finally:
        drain_cleanups()


def test_budget_select_two_phase_no_single_task_window(spark):
    """docs_budget_select (round-11 two-phase rewrite): the global
    rank/cumsum must NOT compile to an unpartitioned WindowExec — no
    Exchange SinglePartition anywhere; the per-bucket base offsets join
    in as a broadcast."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["docs_budget_select"]
    from example_beam_spark.registry import drain_cleanups

    try:
        plan = explain_formatted(q.fn(spark, SF))
    finally:
        drain_cleanups()
    assert "SinglePartition" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_shard_shuffle_two_phase_no_single_task_window(spark):
    """docs_shard_shuffle (round-11 two-phase rewrite): per-bucket rank
    windows (65536-way) + per-shard summary prefix sums — no Exchange
    SinglePartition; offsets broadcast back."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["docs_shard_shuffle"]
    plan = explain_formatted(q.fn(spark, SF))
    assert "SinglePartition" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_session_path_topk_uses_takeordered(spark):
    """session_path_topk: the top-50 cut must compile to TakeOrdered
    (per-partition heaps) BEFORE the rank window, so the unpartitioned
    window's input is bounded at 50 rows by construction (the
    vocab_top_terms discipline)."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["session_path_topk"]
    plan = explain_formatted(q.fn(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_aqe_splits_skewed_join_partition(spark):
    """Skew posture: with one hot key dominating the build of a
    sort-merge join, AQE's skew-join must split the oversized partition
    at runtime (plan shows `skew=true`). Thresholds are lowered so the
    local fixture triggers the same machinery a 100 TB hot key would."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(0, 200_000).select(
            (F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 1000)).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
        )
        joined = left.join(right, "k")
        # collect() (not count()) so THIS DataFrame's own query execution
        # runs and its AdaptiveSparkPlan finalizes
        assert len(joined.collect()) > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.slow  # 57 s AQE skew-split execution; EBS_RUN_SLOW=1 runs it
def test_aqe_skew_split_on_time_range_join(spark, tmp_path):
    """The forced-skew pin above, on a REAL operator (round-7 verdict):
    ``enrich_time_range_join`` over a zipf-keyed events table (head
    user ~18% of 150k events) with the skew thresholds lowered — the
    hot user's sort-merge partition must be split at runtime
    (skew=true in the final adaptive plan) and the result must still
    match the same query without the skew machinery."""
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))
    from tools.skew_lane import skew_corpus

    # s=2.0 puts ~60% of events on the head user — the deliberately
    # extreme hot key the synthetic pin above uses (the realistic-skew
    # measurements live in tools/skew_lane.py); the 120-day span keeps
    # the 6h-range join output modest. Skew detection reads COMPRESSED
    # MapStatus bytes, so the hot partition must clear the lowered
    # threshold after compression — hence 150k events, not less.
    # small row groups: AQE splits a skewed reduce partition by
    # MAP-OUTPUT ranges, and a parquet split only produces map output if
    # it contains a row-group start — a single-row-group file is ONE
    # effective mapper and therefore unsplittable no matter how skewed
    d = skew_corpus(
        str(tmp_path / "zipf"), 150_000, 1_500, s=2.0,
        span_us=120 * 86_400 * 1_000_000, row_group_rows=10_000,
    )
    q = load_registry()["enrich_time_range_join"]
    baseline = q.fn(spark, d).count()
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.files.maxPartitionBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # AQE splits a skewed reduce partition by MAP-OUTPUT ranges, so
        # a single-file scan (one mapper) is unsplittable no matter how
        # skewed — shrink the input split size so the scan yields many
        # mappers, as any real multi-file table would
        spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
        probe = q.fn(spark, d).select(F.lit(1).alias("one"))
        n = len(probe.collect())
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:2000]
        assert n == baseline
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ivf_joins_are_broadcast(spark):
    """ann_topk_ivf: seeds / probes / queries are all tiny — every join
    around the corpus scan must be broadcast, never a fact-side
    sort-merge shuffle."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["ann_topk_ivf"]
    df = q.fn(spark, SF)
    assert has_broadcast_join(df)
    assert "SortMergeJoin" not in explain_formatted(df)


def test_vocab_top_terms_uses_takeordered(spark):
    """vocab_top_terms: the top-100 cut must compile to TakeOrdered
    (per-partition heaps), not a global sort of the vocabulary, and the
    term aggregation must be partial+final (map-side combine)."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["vocab_top_terms"]
    plan = explain_formatted(q.fn(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert plan.count("HashAggregate") >= 2, plan[:2000]


def test_doc_repetition_partial_final_agg(spark):
    """doc_repetition_ngrams: both aggregates are hash partial+final;
    the only exchanges are the two hash-keyed shuffles plus the final
    doc join."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["doc_repetition_ngrams"]
    df = q.fn(spark, SF)
    plan = explain_formatted(df)
    assert plan.count("HashAggregate") >= 4, plan[:2000]  # 2 aggs x partial+final
    assert num_exchanges(df) <= 3, num_exchanges(df)


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """100-TB technique: with a selective dimension filter and a
    non-broadcast join, Spark injects a runtime bloom filter built from
    the dimension keys and applies it on the fact scan side. The
    application-side scan threshold (default 10 GB) is what gates it —
    trivially exceeded at production scale, lowered here to pin the
    mechanism at test SF."""
    from example_beam_spark.plans import explain_formatted

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        plan = explain_formatted(j)
        assert "bloom_filter_agg" in plan or "BloomFilterMightContain" in plan.replace(
            " ", ""
        ), plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_eval_contamination_broadcasts_eval_spans(spark):
    """eval_contamination: the distinct eval-span set must broadcast so
    the training-side span scan never shuffles for the join."""
    q = load_registry()["eval_contamination"]
    assert has_broadcast_join(q.fn(spark, SF))


def test_pii_and_normalize_are_scan_shaped(spark):
    """pii_redact / text_normalize are pure map-side regex column
    expressions — zero exchanges; at 100 TB the cleaning pass runs at
    scan speed."""
    reg = load_registry()
    assert num_exchanges(reg["pii_redact"].fn(spark, SF)) == 0
    assert num_exchanges(reg["text_normalize"].fn(spark, SF)) == 0


def test_semantic_dedup_no_cartesian(spark):
    """semantic_dedup: seeds broadcast for cell assignment and the
    pairwise pass is an equi-join keyed by cell — the |corpus|² cartesian
    must never appear in the plan."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["semantic_dedup"]
    plan = explain_formatted(q.fn(spark, SF))
    # BroadcastNestedLoopJoin IS expected: seed_scores' n×k cell-scoring
    # expansion broadcasts the 16-seed set (bounded fan-out by design);
    # what must never appear is an unkeyed corpus×corpus product.
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # seed-id and drop joins stay broadcast


def test_source_overlap_scans_two_columns_and_caches(spark):
    """source_overlap: the documents scan is pruned to (source, text) and
    the shingle→sources table is persisted so both consumers (sizes,
    pair counts) reuse one corpus scan."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["source_overlap"]
    df = q.fn(spark, SF)
    cols = read_schema_columns(df, "documents.parquet")
    assert cols == {"source", "text"}, cols
    assert "InMemoryTableScan" in explain_formatted(df)


def test_mixture_sample_is_broadcast_filter(spark):
    """docs_mixture_sample: the per-language rate table broadcasts onto
    the corpus scan — the sample predicate must not shuffle the corpus."""
    q = load_registry()["docs_mixture_sample"]
    df = q.fn(spark, SF)
    assert has_broadcast_join(df)


def test_winnowing_no_cartesian(spark):
    """winnowing_fingerprint: window membership is a fixed ×w explode
    joined back on (doc, position) — never a positions×positions product."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["winnowing_fingerprint"]
    plan = explain_formatted(q.fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmv_bottomk_uses_takeordered(spark):
    """kmv_distinct_users: the bottom-k hash cut must compile to
    TakeOrdered (per-partition heaps + k-row driver merge), never a
    global sort of the distinct-hash table."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["kmv_distinct_users"]
    plan = explain_formatted(q.fn(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_events_json_stats_single_shuffle(spark):
    """events_json_stats: the JSON parse is scan-side and the aggregate
    is one partial+final pass — exactly one exchange."""
    q = load_registry()["events_json_stats"]
    assert num_exchanges(q.fn(spark, SF)) == 1


def test_fixed_k_sample_is_one_window_shuffle(spark):
    """docs_sample_fixed_k: one window shuffle keyed by the stratum,
    nothing global."""
    q = load_registry()["docs_sample_fixed_k"]
    assert num_exchanges(q.fn(spark, SF)) == 1


def test_funnel_single_user_shuffle(spark):
    """events_funnel: all four chained MIN-CASE windows share ONE
    user_id exchange; the only other exchange is the final single-row
    rollup."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["events_funnel"]
    df = q.fn(spark, SF)
    assert num_exchanges(df) == 2, explain_formatted(df)[:2000]


def test_interarrival_single_shuffle(spark):
    """events_interarrival: the LAG sort and the per-user aggregate run
    inside one user_id exchange."""
    q = load_registry()["events_interarrival"]
    assert num_exchanges(q.fn(spark, SF)) == 1


def test_retention_has_no_self_join(spark):
    """user_retention_cohorts: cohort_size comes from a MAX-CASE window,
    not an offset-0 self-join — the count subtree must appear once (no
    Join operator, no re-planned scan)."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["user_retention_cohorts"]
    plan = explain_formatted(q.fn(spark, SF))
    assert "Join" not in plan, plan[:2000]


def test_pivot_as_conditional_agg_single_shuffle(spark):
    """events_pivot_monthly: the COUNT-CASE form is one partial+final
    aggregate with one exchange — Spark's .pivot() would plan two
    (pre-count + PivotFirst), which is why the operator avoids it."""
    q = load_registry()["events_pivot_monthly"]
    assert num_exchanges(q.fn(spark, SF)) == 1


def test_cube_is_one_expand_aggregate(spark):
    """orders_cube_priority_status: CUBE expands rows map-side into one
    shared partial+final aggregate — a single exchange, never four
    scans."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["orders_cube_priority_status"]
    df = q.fn(spark, SF)
    plan = explain_formatted(df)
    assert "Expand" in plan, plan[:1500]
    assert num_exchanges(df) == 1, plan[:1500]


def test_gapfill_daily_aggregate_is_cached(spark):
    """orders_daily_gapfill: both the bounds branch and the gap-fill
    join must consume the persisted daily aggregate (InMemoryTableScan)
    — without the persist, column pruning differentiates the two
    subtrees and Spark plans a SECOND full fact scan (measured; the
    formatted plan prints the cached relation per reference, so we pin
    presence of the cache, not scan text counts)."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["orders_daily_gapfill"]
    plan = explain_formatted(q.fn(spark, SF))
    assert "InMemoryTableScan" in plan, plan[:2000]


def test_bpe_merge_pairs_partial_topk(spark):
    """bpe_merge_pairs: the ranked merge candidates come from
    TakeOrderedAndProject (per-partition partial top-k) over one
    partial+final count aggregate — no global sort of the pair space."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["bpe_merge_pairs"]
    df = q.fn(spark, SF)
    plan = explain_formatted(df)
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert num_exchanges(df) == 1, plan[:1500]


def test_zscore_stats_broadcast_no_fact_shuffle(spark):
    """events_value_zscore: the per-type stats frame must broadcast back
    onto the fact rows — the fact side reaches the join with no hash
    exchange (only the tiny stats aggregate shuffles)."""
    q = load_registry()["events_value_zscore"]
    df = q.fn(spark, SF)
    assert has_broadcast_join(df)
    assert num_exchanges(df) <= 1, num_exchanges(df)


def test_quality_classifier_no_shuffle(spark):
    """The hashed-n-gram scorer is a pure scan expression (HOF fold over
    the token array, no explode/groupBy): zero exchanges."""
    from example_beam_spark.plans import num_exchanges
    from example_beam_spark.registry import load_registry

    q = load_registry()["docs_quality_classifier"]
    assert num_exchanges(q.fn(spark, "/root/testdata/sf0.01")) == 0


def test_cogroup_fast_exchanges_are_shared(spark):
    """Both aggregates hash-partition on user_id and the full-outer join
    reuses that partitioning: exactly 2 exchanges (one per side), none
    added by the join itself."""
    from example_beam_spark.plans import num_exchanges
    from example_beam_spark.registry import load_registry

    q = load_registry()["cogroup_user_activity_fast"]
    assert num_exchanges(q.fn(spark, "/root/testdata/sf0.01")) == 2


def test_moving_avg_window_runs_on_aggregate(spark):
    """The RANGE-frame window must run over the days-sized aggregate,
    never the fact scan: one fact exchange (the daily partial+final
    aggregate) + one single-partition exchange for the tiny window."""
    from example_beam_spark.plans import num_exchanges
    from example_beam_spark.registry import load_registry

    q = load_registry()["orders_moving_avg_7d"]
    assert num_exchanges(q.fn(spark, "/root/testdata/sf0.01")) == 2


def test_bm25_stats_broadcast_bounded_exchanges(spark):
    """bm25_search: the (n_docs, avgdl) corpus stats and the 3-row idf
    table must broadcast onto the tf rows (no fact-side shuffle for
    them), and the isin() query filter runs BEFORE the (doc, term)
    aggregation so only query-term rows ever shuffle."""
    q = load_registry()["bm25_search"]
    df = q.fn(spark, SF)
    assert has_broadcast_join(df)
    assert num_exchanges(df) <= 6, num_exchanges(df)


def test_dsir_model_broadcast(spark):
    """dsir_importance_weights: the 256-bucket feature model is a
    broadcast join against the exploded features — the fact side
    shuffles only for the per-doc mean."""
    q = load_registry()["dsir_importance_weights"]
    df = q.fn(spark, SF)
    assert has_broadcast_join(df)
    assert num_exchanges(df) <= 5, num_exchanges(df)


def test_substring_coverage_fanout_after_dup_filter(spark):
    """substring_dup_coverage: the K-per-shingle position explode must
    sit ABOVE the count>1 duplicate join in the plan (only duplicated
    spans pay the fan-out), and the whole query is <= 3 exchanges
    (shingle count agg, dup join, per-doc agg)."""
    q = load_registry()["substring_dup_coverage"]
    df = q.fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert num_exchanges(df) <= 3, num_exchanges(df)
    # executedPlan prints root-first, so the position fan-out (a LATER
    # op) must appear ABOVE the duplicate-count filter it consumes
    fanout = plan.find("Generate explode(sequence(i#")
    dup_filter = plan.find("Filter (cnt#")
    assert fanout != -1 and dup_filter != -1, plan[:500]
    assert fanout < dup_filter, (fanout, dup_filter)


def test_pagerank_edges_cached_per_iteration(spark):
    """pagerank_term_graph: every power iteration must read the
    persisted (edge, weighted-degree) frame from cache — at least
    _PR_ITERS InMemoryTableScans, so the co-occurrence graph build is
    never recomputed inside the loop (the round-11 two-phase final
    rank adds scans of its own persisted ranged frame on top). The
    node-count frame broadcasts; no SinglePartition window remains."""
    from example_beam_spark.operators.retrieval import _PR_ITERS
    from example_beam_spark.registry import drain_cleanups

    q = load_registry()["pagerank_term_graph"]
    try:
        df = q.fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= _PR_ITERS, plan.count(
            "InMemoryTableScan"
        )
        # the only SinglePartition exchanges are 1-row global COUNT
        # aggregates (bounded partial+final), never a Window input
        import re

        for m in re.finditer(r"Exchange SinglePartition[^\n]*\n([^\n]*)", plan):
            assert "Window" not in m.group(1), plan[:3000]
        assert has_broadcast_join(df)
    finally:
        drain_cleanups()


def test_tf_cosine_query_postings_broadcast(spark):
    """tf_cosine_topk: the query-doc postings side must broadcast (the
    corpus postings never shuffle toward a tiny query set), and the
    plan must contain no cartesian product — candidates come only from
    the term equi-join."""
    q = load_registry()["tf_cosine_topk"]
    df = q.fn(spark, SF)
    assert has_broadcast_join(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:500]


def test_triangle_wedges_close_with_semi_join(spark):
    """triangle_count_terms: wedges must close via a LEFT SEMI equi-join
    on the oriented edge list (never a materializing inner join whose
    duplicates would double-count), and the degree annotations must
    ride broadcast joins."""
    q = load_registry()["triangle_count_terms"]
    df = q.fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan[:500]
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan, plan[:500]


def test_markov_row_totals_are_window_sum(spark):
    """events_markov_transitions: the per-from row totals must be a
    window-sum OVER the matrix (a groupBy + join-back would re-embed
    and re-execute the whole window+agg lineage for the totals branch).
    Three exchanges: the user window, the partial+final matrix agg, and
    the |types|-row totals window."""
    q = load_registry()["events_markov_transitions"]
    df = q.fn(spark, SF)
    assert num_exchanges(df) <= 3, num_exchanges(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2  # lead() + totals window


def test_label_propagation_edges_cached_per_iteration(spark):
    """label_propagation_terms: every LPA iteration must read the
    persisted symmetrized (edge, weight) frame from cache, and the
    converged labels must themselves be cached so the community-size
    branch does not re-execute the iteration chain. Printed-tree
    arithmetic: the top level scans the persisted LABELS relation twice
    (final join + sizes branch), and each of those scans re-prints the
    relation's build plan, which embeds the l0-init edge scan and the
    _LP_ITERS per-iteration edge scans — print re-embeddings of the ONE
    cached build (the pagerank_term_graph Exchange-count note), so the
    string count is 2 * (1 + _LP_ITERS) + 2."""
    from example_beam_spark.operators.graphtext import _LP_ITERS

    q = load_registry()["label_propagation_terms"]
    df = q.fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("InMemoryTableScan")
    assert n == 2 * (1 + _LP_ITERS) + 2, n
    assert has_broadcast_join(df)


def test_mad_median_tables_broadcast(spark):
    """events_anomaly_mad: the per-type median/MAD tables are |types|-row
    aggregates and must broadcast back onto the events scan — the only
    fact-side shuffles are the two per-type sort windows."""
    q = load_registry()["events_anomaly_mad"]
    df = q.fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan[:800]


def test_pmi_topk_is_takeordered(spark):
    """bigram_collocations_pmi: the top-50 cut must compile to
    TakeOrdered (per-partition heaps) with the rank window running on
    the 50-row result, and the unigram/total joins must broadcast."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["bigram_collocations_pmi"]
    df = q.fn(spark, SF)
    plan = explain_formatted(df)
    assert "TakeOrdered" in plan, plan[:800]
    assert has_broadcast_join(df)


def test_range_search_is_broadcast_scan_no_shuffle(spark):
    """ann_range_search: broadcast query set + map-side threshold filter
    — scan-shaped: no rank, no aggregate, and the ONLY exchanges are the
    fixture-only spread_small_input round-robin repartitions (no-ops at
    100 TB where the scan already yields >= parallelism splits)."""
    import re

    from example_beam_spark.plans import explain_formatted

    q = load_registry()["ann_range_search"]
    df = q.fn(spark, SF)
    plan = explain_formatted(df)
    # the query set rides a BroadcastNestedLoopJoin (cross join: the
    # threshold is not an equi-key)
    assert "BroadcastNestedLoopJoin" in plan, plan[:3000]
    for m in re.finditer(
        r"^\(\d+\) Exchange\b\n(?:.*\n)*?Arguments: (\w+)", plan, re.M
    ):
        assert m.group(1) == "RoundRobinPartitioning", plan[:3000]
    assert "HashAggregate" not in plan and "Window" not in plan, plan[:3000]


def test_hard_negatives_single_query_shuffle(spark):
    """ann_hard_negatives: broadcast queries and label filter map-side;
    beyond the fixture-only round-robin spreads, the only exchange feeds
    the per-query rank window."""
    import re

    from example_beam_spark.plans import explain_formatted

    q = load_registry()["ann_hard_negatives"]
    df = q.fn(spark, SF)
    plan = explain_formatted(df)
    assert "BroadcastNestedLoopJoin" in plan, plan[:3000]
    kinds = [
        m.group(1)
        for m in re.finditer(
            r"^\(\d+\) Exchange\b\n(?:.*\n)*?Arguments: (\w+)", plan, re.M
        )
    ]
    assert sum(1 for k in kinds if k != "RoundRobinPartitioning") == 1, kinds


def test_fertility_single_bounded_shuffle(spark):
    """tokenizer_fertility_by_lang: one partial+final aggregate keyed by
    lang — exactly one exchange, counts computed map-side."""
    q = load_registry()["tokenizer_fertility_by_lang"]
    from example_beam_spark.plans import explain_formatted

    df = q.fn(spark, SF)
    assert num_exchanges(df) == 1
    assert explain_formatted(df).count("HashAggregate") >= 2


def test_mix_weights_broadcast_totals(spark):
    """docs_domain_mix_weights: per-source aggregate once; both global
    totals broadcast back onto the summary (two BroadcastNestedLoop /
    BroadcastExchange joins over 1-row frames, no extra fact shuffle)."""
    q = load_registry()["docs_domain_mix_weights"]
    from example_beam_spark.plans import explain_formatted

    df = q.fn(spark, SF)
    plan = explain_formatted(df)
    assert plan.count("BroadcastExchange") >= 2, plan[:3000]


def test_next_event_examples_single_shuffle(spark):
    """events_next_event_examples: one window shuffle keyed by
    (user_id, day) — lags and row_number share the same window spec."""
    q = load_registry()["events_next_event_examples"]
    assert num_exchanges(q.fn(spark, SF)) == 1


def test_covariance_two_bounded_aggregates(spark):
    """embedding_covariance: the upper triangle expands per row (no
    self-join of the element table) — plan has NO SortMergeJoin, the
    only aggregates are the two partial+final integer sums (bounded at
    d(d+1)/2 and d groups), and the mean sums ride in as broadcasts."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["embedding_covariance"]
    df = q.fn(spark, SF)
    plan = explain_formatted(df)
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert plan.count("HashAggregate") >= 4, plan[:3000]  # 2x partial+final


def test_per_group_topk_windows_push_group_limit(spark):
    """topk_parts_per_brand and docs_sample_fixed_k filter on a rank
    window — Spark must push a PARTIAL WindowGroupLimit below the
    exchange (map-side per-group top-k heaps), so the low-cardinality
    group windows (25 brands / 5 langs) never sort whole groups in one
    task. Pinned so a refactor that breaks the rank-filter pattern
    (e.g. ranking before filtering in a separate select) can't silently
    lose the pushdown."""
    for name in ("topk_parts_per_brand", "docs_sample_fixed_k"):
        q = load_registry()[name]
        df = q.fn(spark, SF)
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in executed and "Partial" in executed, (
            name,
            executed[:2000],
        )


def test_decontaminate_broadcasts_eval_side(spark):
    """docs_decontaminate joins the train gram stream against the eval
    grams — the eval slice is ~1% by construction, so the gram join
    must be a BroadcastHashJoin (no shuffle of the train grams by g)
    and the per-doc counts stay partial+final aggregates."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["docs_decontaminate"]
    df = q.fn(spark, SF)
    plan = explain_formatted(df)
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert plan.count("HashAggregate") >= 2, plan[:3000]


def test_range_search_ivf_no_wide_shuffle(spark):
    """ann_range_search_ivf's plan stays narrow: the probe and query
    sides ride in as broadcasts over the assigned (persisted) scan —
    no SortMergeJoin anywhere; the only aggregation is the k-row
    radius artifact."""
    from example_beam_spark.plans import explain_formatted

    q = load_registry()["ann_range_search_ivf"]
    df = q.fn(spark, SF)
    plan = explain_formatted(df)
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_runtime_bloom_filter_fires_on_selective_dim_join(spark):
    """The 100-TB shuffle-join regime's other free win: Catalyst's
    runtime bloom filter — a selective dim predicate (p_brand = one
    value) induces a bloom_filter_might_contain guard on the FACT scan
    side, so most lineitem rows die before the exchange. The feature is
    size-gated (applicationSideScanSizeThreshold defaults to 10 GB — a
    real fact table qualifies organically); the pin lowers the gate to
    observe the injection at fixture scale, and restores every conf."""
    from example_beam_spark.sources import load_table
    from pyspark.sql import functions as F

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        l = load_table(spark, SF, "lineitem")
        p = load_table(spark, SF, "part").filter(F.col("p_brand") == "Brand#13")
        j = l.join(p, l.l_partkey == p.p_partkey).groupBy("p_brand").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "might_contain" in plan, plan[:3000]
