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
        results[name] = agg
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
    skewed = sorted(
        (r for r in results.items() if r[1].get("skew", 0) > 4),
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
