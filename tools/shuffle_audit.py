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
        }
        for i in range(before, execs.size()):
            for node, metric, value in _execution_metrics(
                store, execs.apply(i).executionId()
            ):
                if node.startswith("Scan") and metric == "number of output rows":
                    agg["scan_rows"] += _parse_count(value)
                elif node == "Exchange" and metric == "shuffle bytes written":
                    agg["exchanges"] += 1
                    agg["shuffle_bytes"] += _parse_bytes(value)
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
        "| Query | Scan rows | Exchanges | Shuffle records | Shuffle bytes | Broadcasts |",
        "|---|---|---|---|---|---|",
    ]
    for name, m in results.items():
        if "error" in m:
            lines.append(f"| {name} | — | — | — | error: {m['error']} | — |")
            continue
        lines.append(
            f"| {name} | {m['scan_rows']:,} | {m['exchanges']} "
            f"| {m['shuffle_records']:,} | {m['shuffle_bytes']:,} "
            f"| {m['broadcasts']} |"
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
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SHUFFLE_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(results)} queries)")


if __name__ == "__main__":
    main()
