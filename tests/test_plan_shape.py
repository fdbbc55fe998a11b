"""Physical-plan regression tests: the scale guarantees the engine claims
(pushdown, broadcast joins, no raw-fact global windows) must be visible in
the plans, not just intended."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from wrtd_etl_spark.plans import REGISTRY
from wrtd_etl_spark.plans import pipeline_queries  # noqa: F401 (registers)
from wrtd_etl_spark.plans import testdata_queries  # noqa: F401 (registers)

from .conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: the scan must not read l_orderkey/l_partkey/l_suppkey
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_dim_joins_are_broadcast(spark):
    for name in ("top_customers", "nation_pair_revenue", "first_event"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_global_window_runs_on_preaggregated_input(spark):
    """The dense_rank window must sit ABOVE the aggregate in the plan —
    i.e. the single-partition exchange only ever sees one row per group."""
    import re

    plan = _plan(spark, "top_customers")
    assert "Window" in plan and "HashAggregate" in plan
    # formatted explain numbers operators leaves-first, so the aggregate
    # feeding the window must carry a SMALLER operator id
    win_ids = [int(m) for m in re.findall(r"\((\d+)\) Window", plan)]
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan)]
    assert win_ids and agg_ids
    assert min(agg_ids) < min(win_ids)


def test_anti_join_is_join_not_collect(spark):
    plan = _plan(spark, "inactive_customers")
    assert "LeftAnti" in plan or "left_anti" in plan.lower()


def test_bucketed_join_runs_without_exchange(spark):
    """Co-bucketed tables must join with NO shuffle: bucketBy records the
    hash partitioning in the catalog, so the sort-merge join reads
    pre-shuffled data — the pay-shuffle-once-at-write 100 TB layout."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.sinks import write_bucketed

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_totalprice"
    )
    write_bucketed(events, "t_events_bucketed", "user_id", buckets=8)
    write_bucketed(orders, "t_orders_bucketed", "user_id", buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_events_bucketed").join(
            spark.table("t_orders_bucketed"), "user_id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and it actually runs correctly co-located
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_events_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")


def test_contamination_join_prunes_to_id_and_text(spark):
    """The leakage join must read only (doc_id, text) from the scan — no
    payload columns ride through the fp exchange."""
    plan = _plan(spark, "contamination_check")
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_context_packing_window_is_partitioned(spark):
    """The fact-table running sum must be a PARTITIONED window (two-pass
    prefix sum), never a global single-task window over the corpus."""
    import re

    plan = _plan(spark, "context_packing")
    specs = re.findall(
        r"Arguments: \[[^\]]*windowspecdefinition\(([^)]*)\)", plan
    )
    # the fact-side running sum and the bucket-offset window both appear
    assert len(specs) >= 2, plan
    # the FACT window must be partitioned by the bucket column b#N;
    # partition-less specs start directly with the order expression
    fact_specs = [s for s in specs if s.strip().startswith("b#")]
    assert fact_specs, specs
    # the only unpartitioned window allowed is the bounded per-bucket
    # offsets one (its order column is the bucket b#N itself)
    for s in specs:
        if not s.strip().startswith("b#"):
            assert s.strip().split(" ")[0].split("#")[0] == "b", s


def test_pii_redaction_is_shuffle_free(spark):
    """Scrubbing is a scan-stage projection — ANY exchange would mean the
    operator stopped scaling linearly. (The registry query adds the gated
    ``spread`` exchange for single-split LOCAL inputs, a no-op at scale —
    so the claim is tested on the operator over a plain scan.)"""
    import contextlib
    import io

    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.functions.text import redact_pii

    docs = load_table(spark, SF_SMOKE, "documents")
    df = docs.select("doc_id", redact_pii(F.col("text")).alias("clean"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_per_source_cap_is_single_exchange(spark):
    """One hash exchange on source feeds both the ranking window and the
    aggregate; rank truncation must prune before the final agg."""
    plan = _plan(spark, "per_source_cap")
    assert plan.count(") Exchange") <= 2  # source window + agg (AQE may fuse)
    assert "Window" in plan
    # rank filter sits above the window, below the aggregate
    assert "rn" in plan


def test_price_outliers_broadcasts_thresholds(spark):
    """The 3-row percentile thresholds must broadcast back over the fact
    scan — a shuffle join here would re-exchange the whole fact table."""
    plan = _plan(spark, "price_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shipping_priority_is_takeordered_with_pushdown(spark):
    plan = _plan(spark, "shipping_priority")
    assert "TakeOrderedAndProject" in plan
    # date filters reach both fact scans
    pushed = plan.split("PushedFilters")
    assert any("l_shipdate" in seg[:250] for seg in pushed[1:])
    assert any("o_orderdate" in seg[:250] for seg in pushed[1:])


def test_rolling_window_sits_above_daily_aggregate(spark):
    """The frame-spec window must consume the day-level aggregate, never
    the raw orders scan (global window over raw facts = the anti-pattern)."""
    import re

    plan = _plan(spark, "rolling_revenue")
    win_ids = [int(m) for m in re.findall(r"\((\d+)\) Window", plan)]
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", plan)]
    assert win_ids and agg_ids
    assert min(agg_ids) < min(win_ids)


def test_corpus_vocab_dedups_before_explode(spark):
    """Per-doc distinct tokens must come from array_distinct in the scan
    stage projection, not a post-explode distinct (which would shuffle the
    full token stream)."""
    plan = _plan(spark, "corpus_vocab")
    # TakeOrdered top-k, not a global sort
    assert "TakeOrderedAndProject" in plan
    # exactly one aggregation exchange (token groupBy); a post-explode
    # distinct would add a second
    assert plan.count(") Exchange") <= 2


def test_distributed_cumsum_scans_fact_table_once(spark):
    """The two-pass prefix sum must reuse the window's shuffle for the
    bucket totals (ReusedExchange) — not scan and exchange the fact
    table twice."""
    import contextlib
    import io

    from wrtd_etl_spark.operators.prefix_sum import distributed_cumsum

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = (
            spark.range(10000)
            .withColumn("b", (F.col("id") / 1000).cast("long"))
            .withColumn("v", F.lit(1))
        )
        out = distributed_cumsum(df, "v", ["id"], "b")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert "ReusedExchange" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_scd2_rebuild_is_single_exchange(spark):
    """scd2_from_changelog promises ONE keyed shuffle: the change-point
    filter and the interval-close windows share a (partition, order)
    spec, so the plan must contain exactly one Exchange and one Sort."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.operators.scd2 import scd2_from_changelog

    from .conftest import SF_SMOKE

    log = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderstatus").alias("st"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("k"),
    )
    plan = (
        scd2_from_changelog(log, ["ck"], ["d", "k"], ["st"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort") == 1, plan


def test_partitioned_write_gets_dynamic_partition_pruning(spark, tmp_path):
    """The scale contract for partitioned fact tables: a join whose dim
    side is filtered must prune fact PARTITIONS at runtime (DPP), not
    scan them all. Proven from the physical plan's dynamicpruning
    subquery on a priority-partitioned orders copy."""
    from wrtd_etl_spark.catalog import load_table

    from .conftest import SF_SMOKE

    fact_dir = str(tmp_path / "orders_part")
    load_table(spark, SF_SMOKE, "orders").write.partitionBy(
        "o_orderpriority"
    ).parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("1-URGENT", "urgent"), ("5-LOW", "low")], ["prio", "label"]
    ).filter(F.col("label") == "urgent")
    joined = fact.join(dim, fact["o_orderpriority"] == dim["prio"]).select(
        "o_orderkey", "label"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruning works: only the matching partition's rows survive
    n_urgent = fact.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert joined.count() == n_urgent


def test_weighted_sample_stages_and_exchanges(spark):
    """Two-stage reservoir: the plan carries BOTH windows — the local
    (group, pid) pre-top-k and the group-keyed final rank — and no more
    exchanges than the two their partitionings require (plus the gated
    spread no-op for single-split local input)."""
    plan = _plan(spark, "weighted_doc_sample")
    assert plan.count("Window") >= 2
    assert plan.count(") Exchange") <= 3
    # no row-at-a-time python evaluation anywhere in the sampling path
    assert "BatchEvalPython" not in plan


def test_filtered_ann_broadcasts_probes_only(spark):
    """Filtered vector search must broadcast the PROBES and keep the
    corpus scan shuffle-free until the tiny candidate top-k: the only
    exchange is the probe-keyed window over per-probe candidates."""
    plan = _plan(spark, "ann_filtered_topk")
    assert "BroadcastExchange" in plan
    # corpus vectors never hash-shuffle: the single hash exchange is the
    # post-scoring window input (probe_id, neighbor_id, sim) rows
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in plan


def test_keyword_search_df_table_is_broadcast(spark):
    """The per-term document-frequency table joins back by broadcast —
    a hash join there would shuffle the postings twice."""
    plan = _plan(spark, "keyword_search")
    assert "BroadcastExchange" in plan


def test_event_anomaly_window_sits_above_daily_buckets(spark):
    """The trailing window must consume the (type, day) AGGREGATE, not
    raw events: partial aggregation first, then one exchange on the
    bucket keys feeding both window and output."""
    plan = _plan(spark, "event_anomaly")
    assert "HashAggregate" in plan and "Window" in plan
    # the Window node's input schema must be the AGGREGATE's output
    # (cents), never the raw fact column (value) — the textual-order
    # check alone can't distinguish window-over-raw from window-over-agg
    import re

    m = re.search(r"\(\d+\) Window\n.*?Input \[\d+\]: \[([^\]]*)\]", plan, re.S)
    assert m, plan
    win_input = m.group(1)
    assert "cents" in win_input and "value" not in win_input
    assert "BatchEvalPython" not in plan
