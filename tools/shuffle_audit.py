"""Shuffle/broadcast audit: wall-clock-independent evidence of plan scale.

Runs every registry query at sf0.01 and extracts the SQL metrics Spark
actually recorded (SQLAppStatusStore): rows scanned, exchange count,
shuffle bytes written, broadcast count. Wall-clock varies with host load;
BYTES MOVED is a property of the plan — the number that predicts 100 TB
behavior. Writes SHUFFLE_AUDIT.md.

Usage: python tools/shuffle_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_UNITS = {
    "B": 1,
    "KiB": 1024,
    "MiB": 1024**2,
    "GiB": 1024**3,
}


def _parse_bytes(s: str) -> int:
    m = re.match(r"([\d.,]+)\s*([KMG]i?B|B)", s.strip())
    if not m:
        return 0
    val = float(m.group(1).replace(",", ""))
    return int(val * _UNITS.get(m.group(2), 1))


def _parse_size_dist(s: str) -> tuple[int, int, int, int]:
    """(total, min, med, max) bytes from a SQL size metric.

    Handles both render forms the status store emits:
    plain ``"81.9 KiB"`` and the per-task distribution
    ``"total (min, med, max (stageId: taskId))\\n81.9 KiB (2.5 KiB,
    2.6 KiB, 2.6 KiB (stage 0.0: task 22))"``.
    """
    sizes = [
        int(float(v.replace(",", "")) * _UNITS[u])
        for v, u in re.findall(r"([\d.,]+)\s*([KMG]i?B|B)", s)
    ]
    if len(sizes) >= 4:
        return sizes[0], sizes[1], sizes[2], sizes[3]
    if sizes:
        return sizes[0], 0, 0, 0
    return 0, 0, 0, 0


def _parse_count(s: str) -> int:
    try:
        return int(s.replace(",", "").strip())
    except ValueError:
        return 0


def _execution_metrics(store, eid):
    """[(node_name, metric_name, value_str)] for one execution."""
    vals = {}
    it = store.executionMetrics(eid).iterator()
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2()
    out = []
    nit = store.planGraph(eid).allNodes().iterator()
    while nit.hasNext():
        node = nit.next()
        mi = node.metrics().iterator()
        while mi.hasNext():
            met = mi.next()
            if met.accumulatorId() in vals:
                out.append((node.name(), met.name(), vals[met.accumulatorId()]))
    return out


def _agg_range(store, before: int) -> dict:
    """Aggregate SQL metrics over every execution recorded since
    ``before`` (the status-store high-water mark taken before the op)."""
    execs = store.executionsList()
    agg = {
        "scan_rows": 0,
        "exchanges": 0,
        "shuffle_bytes": 0,
        "shuffle_records": 0,
        "broadcasts": 0,
        "max_task_bytes": 0,
        "skew": 0.0,
    }
    for i in range(before, execs.size()):
        for node, metric, value in _execution_metrics(
            store, execs.apply(i).executionId()
        ):
            if node.startswith("Scan") and metric == "number of output rows":
                agg["scan_rows"] += _parse_count(value)
            elif node == "Exchange" and metric == "shuffle bytes written":
                agg["exchanges"] += 1
                total, _mn, med, mx = _parse_size_dist(value)
                agg["shuffle_bytes"] += total
                agg["max_task_bytes"] = max(agg["max_task_bytes"], mx)
                # skew = worst max/median write across this query's
                # exchanges: the early warning a 100x run turns into
                # a straggler task (a hot key shows up here long
                # before it OOMs anything). Exchanges whose MEDIAN
                # task writes under 1 KiB are excluded: at that mass
                # the ratio is row-granularity noise (one task
                # carrying 3 rows instead of 1 reads as "4.0"), not
                # key structure — a sub-KB max task cannot straggle.
                # Structural hot keys always push the median exchange
                # past the floor long before they matter.
                if med >= 1024:
                    agg["skew"] = max(agg["skew"], mx / med)
            elif node == "Exchange" and metric == "shuffle records written":
                agg["shuffle_records"] += _parse_count(value)
            elif node == "BroadcastExchange":
                if metric == "number of output rows":
                    agg["broadcasts"] += 1
    return agg


def audit(spark, sf_dir: str) -> dict[str, dict]:
    import __spark_entry__ as entry

    store = spark._jsparkSession.sharedState().statusStore()
    results: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        before = store.executionsList().size()
        try:
            fn(spark, sf_dir).collect()
        except Exception as e:  # keep auditing the rest
            results[name] = {"error": str(e).splitlines()[0][:100]}
            continue
        results[name] = _agg_range(store, before)
    return results


def audit_write_paths(spark, sf_dir: str) -> dict[str, dict]:
    """The table-MUTATING paths the registry audit can't see: versioned
    writes (clustered + append), text-index build/refresh, the temporal
    enrich sink, and the exactly-once streaming append sink. Each step
    runs against temp tables seeded from the same sf_dir inputs; the
    steps are sequential because later ones consume earlier ones' tables
    (build → append → refresh is the real lifecycle)."""
    import datetime
    import tempfile

    from pyspark.sql import functions as F

    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.operators.text_index import (
        build_text_index_from,
        refresh_text_index,
    )
    from wrtd_etl_spark.sources.versioned import write_snapshot
    from wrtd_etl_spark.streaming.enrich import make_temporal_enrich_sink
    from wrtd_etl_spark.streaming.versioned_sink import (
        run_versioned_append_stream,
    )

    store = spark._jsparkSession.sharedState().statusStore()
    root = tempfile.mkdtemp(prefix="wrtd_write_audit_")
    docs_t = os.path.join(root, "docs")
    idx_t = os.path.join(root, "idx")
    out_t = os.path.join(root, "enriched")
    sink_t = os.path.join(root, "ingest")
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    results: dict[str, dict] = {}

    def step(name, fn):
        before = store.executionsList().size()
        try:
            fn()
        except Exception as e:
            results[name] = {"error": str(e).splitlines()[0][:100]}
            return
        results[name] = _agg_range(store, before)

    step(
        "w:versioned_write_clustered",
        lambda: write_snapshot(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs_t,
            layout_by=["doc_id"],
            layout_files=4,
        ),
    )
    step("w:text_index_build", lambda: build_text_index_from(spark, docs_t, idx_t))
    step(
        "w:versioned_append",
        lambda: write_snapshot(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs_t,
            mode="append",
            layout_by=["doc_id"],
            layout_files=4,
        ),
    )
    step(
        "w:text_index_refresh",
        lambda: refresh_text_index(spark, docs_t, idx_t),
    )

    def _enrich():
        dim_t = os.path.join(root, "dim")
        t0 = datetime.datetime(2020, 1, 1)
        write_snapshot(
            spark.createDataFrame(
                [(int(u), "tier", t0, None, True) for u in range(200)],
                "k long, status string, valid_from timestamp,"
                " valid_to timestamp, is_current boolean",
            ),
            dim_t,
        )
        sink = make_temporal_enrich_sink(dim_t, out_t, "user_id", "k", "ts")
        sink(events.select("event_id", "user_id", "ts"), 0)

    step("w:enrich_sink_batch", _enrich)

    def _stream_sink():
        from wrtd_etl_spark.streaming.dedup import read_events_stream

        run_versioned_append_stream(
            read_events_stream(spark, sf_dir),
            sink_t,
            os.path.join(root, "ck"),
            stats_cols=["event_id"],
        )

    step("w:versioned_stream_sink", _stream_sink)
    return results


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from wrtd_etl_spark.session import get_spark

    spark = get_spark("shuffle-audit")
    results = audit(spark, sf_dir)

    lines = [
        "# Shuffle audit — bytes moved per registry query",
        "",
        f"Source: `tools/shuffle_audit.py` at `{sf_dir}` (SQL metrics from",
        "Spark's status store — actual recorded values, not estimates).",
        "Shuffle bytes are the plan property that predicts 100 TB behavior;",
        "wall-clock depends on host load and is tracked separately in",
        "BENCH_*.json.",
        "",
        "| Query | Scan rows | Exchanges | Shuffle records | Shuffle bytes | Broadcasts | Max task bytes | Skew max/med |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, m in results.items():
        if "error" in m:
            lines.append(
                f"| {name} | — | — | — | error: {m['error']} | — | — | — |"
            )
            continue
        skew = f"{m['skew']:.1f}" if m["skew"] else "—"
        lines.append(
            f"| {name} | {m['scan_rows']:,} | {m['exchanges']} "
            f"| {m['shuffle_records']:,} | {m['shuffle_bytes']:,} "
            f"| {m['broadcasts']} | {m['max_task_bytes']:,} | {skew} |"
        )
    heavy = sorted(
        (r for r in results.items() if "error" not in r[1]),
        key=lambda kv: -kv[1]["shuffle_bytes"],
    )[:8]
    lines += [
        "",
        "## Heaviest shufflers (watch list at scale)",
        "",
    ]
    for name, m in heavy:
        ratio = m["shuffle_records"] / max(m["scan_rows"], 1)
        lines.append(
            f"- **{name}** — {m['shuffle_bytes']:,} B shuffled, "
            f"{m['shuffle_records']:,} records "
            f"({ratio:.2f} shuffle-records per scanned row)"
        )
    wp = audit_write_paths(spark, sf_dir)
    lines += [
        "",
        "## Write paths (table-mutating operations, audited separately)",
        "",
        "Versioned writes, index build/refresh, the enrich sink, and the",
        "streaming append sink mutate tables, so the registry loop never",
        "sees their exchanges — audited here over temp tables seeded from",
        "the same inputs (build → append → refresh is the real lifecycle).",
        "",
        "| Operation | Scan rows | Exchanges | Shuffle records | Shuffle bytes | Broadcasts | Max task bytes | Skew max/med |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, m in wp.items():
        if "error" in m:
            lines.append(
                f"| {name} | — | — | — | error: {m['error']} | — | — | — |"
            )
            continue
        skew = f"{m['skew']:.1f}" if m["skew"] else "—"
        lines.append(
            f"| {name} | {m['scan_rows']:,} | {m['exchanges']} "
            f"| {m['shuffle_records']:,} | {m['shuffle_bytes']:,} "
            f"| {m['broadcasts']} | {m['max_task_bytes']:,} | {skew} |"
        )
    results_all = {**results, **wp}
    skewed = sorted(
        (r for r in results_all.items() if r[1].get("skew", 0) > 4),
        key=lambda kv: -kv[1]["skew"],
    )
    lines += ["", "## Skewed exchanges (max/median task write > 4x)", ""]
    if skewed:
        for name, m in skewed:
            lines.append(
                f"- **{name}** — worst exchange max/med = {m['skew']:.1f} "
                f"(max task {m['max_task_bytes']:,} B): a hot key here "
                "becomes a straggler at 100x — candidate for salting or "
                "AQE skew-join"
            )
    else:
        lines.append(
            "- none above threshold — no exchange writes a partition "
            ">4x its median"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SHUFFLE_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(results)} queries)")


if __name__ == "__main__":
    main()
