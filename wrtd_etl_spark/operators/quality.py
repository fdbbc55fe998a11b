"""Declarative data-quality checks: a deequ-style constraint suite.

The reference validates nothing on ingest — a malformed page or a NULL
id flows straight into state (main.py's bare except is the only guard).
A warehouse needs constraints as DATA: declare them, evaluate them in as
few passes as the constraint types allow, and get back a small report
row per check (violations / total / passed) that a pipeline can gate on.

Evaluation cost by check type — this is the scale contract:

* row-predicate checks (``not_null``, ``in_range``, ``accepted_values``,
  ``matches``) fold into ONE conditional aggregation — a single scan of
  the table regardless of how many such checks are declared;
* ``unique`` needs its own keyed aggregation (one shuffle per distinct
  key set — the minimum; duplicate detection IS a group-by);
* ``foreign_key`` is a left-anti join against the (broadcastable)
  reference keys — orphan count, one join per declared FK.

The report is a union of per-check 1-row frames: constant-size output,
never data-sized. ``assert_checks`` raises on any failure for fail-fast
pipelines (the gate the reference's poll loop never had).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_SCHEMA = "check string, violations long, total long, passed boolean"


def not_null(col: str) -> dict:
    return {"kind": "row", "name": f"not_null({col})", "bad": F.col(col).isNull()}


def in_range(col: str, lo=None, hi=None) -> dict:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    # NULL comparisons are NULL -> treated as non-violations here; pair
    # with not_null(col) to reject NULLs explicitly
    return {
        "kind": "row",
        "name": f"in_range({col})",
        "bad": F.coalesce(cond, F.lit(False)),
    }


def accepted_values(col: str, values: list) -> dict:
    return {
        "kind": "row",
        "name": f"accepted_values({col})",
        "bad": F.coalesce(~F.col(col).isin(values), F.lit(True)),
    }


def matches(col: str, pattern: str) -> dict:
    return {
        "kind": "row",
        "name": f"matches({col})",
        "bad": F.coalesce(~F.col(col).rlike(pattern), F.lit(True)),
    }


def unique(cols: list[str]) -> dict:
    return {"kind": "unique", "name": f"unique({','.join(cols)})", "cols": cols}


def foreign_key(col: str, ref: DataFrame, ref_col: str) -> dict:
    return {
        "kind": "fk",
        "name": f"foreign_key({col})",
        "col": col,
        "ref": ref,
        "ref_col": ref_col,
    }


def run_checks(df: DataFrame, checks: list[dict]) -> DataFrame:
    """One report row per check: (check, violations, total, passed)."""
    spark = df.sparkSession
    reports: list[DataFrame] = []

    row_checks = [c for c in checks if c["kind"] == "row"]
    if row_checks:
        aggs = [F.count(F.lit(1)).alias("__total")]
        for i, c in enumerate(row_checks):
            aggs.append(
                F.sum(F.when(c["bad"], 1).otherwise(0)).alias(f"__v{i}")
            )
        wide = df.agg(*aggs)
        per = F.array(
            *[
                F.struct(
                    F.lit(c["name"]).alias("check"),
                    F.coalesce(F.col(f"__v{i}"), F.lit(0))
                    .cast("long")
                    .alias("violations"),
                    F.col("__total").cast("long").alias("total"),
                    (F.coalesce(F.col(f"__v{i}"), F.lit(0)) == 0).alias(
                        "passed"
                    ),
                )
                for i, c in enumerate(row_checks)
            ]
        )
        reports.append(
            wide.select(F.explode(per).alias("r")).select("r.*")
        )

    for c in checks:
        if c["kind"] == "unique":
            dup_rows = (
                df.groupBy(*c["cols"])
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(
                    F.coalesce(F.sum("__n"), F.lit(0)).alias("violations")
                )
            )
            total = df.agg(F.count(F.lit(1)).alias("total"))
            reports.append(
                dup_rows.crossJoin(F.broadcast(total)).select(
                    F.lit(c["name"]).alias("check"),
                    F.col("violations").cast("long"),
                    F.col("total").cast("long"),
                    (F.col("violations") == 0).alias("passed"),
                )
            )
        elif c["kind"] == "fk":
            orphans = (
                df.select(F.col(c["col"]).alias("__k"))
                .filter(F.col("__k").isNotNull())
                .join(
                    F.broadcast(
                        c["ref"].select(F.col(c["ref_col"]).alias("__k"))
                    ),
                    "__k",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("violations"))
            )
            total = df.agg(F.count(F.lit(1)).alias("total"))
            reports.append(
                orphans.crossJoin(F.broadcast(total)).select(
                    F.lit(c["name"]).alias("check"),
                    F.col("violations").cast("long"),
                    F.col("total").cast("long"),
                    (F.col("violations") == 0).alias("passed"),
                )
            )

    if not reports:
        return spark.createDataFrame([], REPORT_SCHEMA)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def violating_rows(df: DataFrame, checks: list[dict]) -> DataFrame:
    """The rows behind the violation counts, tagged with ``__violation``
    (one output copy per violated check — a row failing two checks
    appears twice, once per tag). This is the quarantine payload for
    write-gated commits: the refused batch's bad rows land somewhere
    Spark-readable instead of vanishing into an error message."""
    parts: list[DataFrame] = []
    for c in checks:
        if c["kind"] == "row":
            parts.append(
                df.filter(c["bad"]).withColumn(
                    "__violation", F.lit(c["name"])
                )
            )
        elif c["kind"] == "unique":
            dup_keys = (
                df.groupBy(*c["cols"])
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .select(*c["cols"])
            )
            parts.append(
                df.join(F.broadcast(dup_keys), c["cols"], "left_semi")
                .withColumn("__violation", F.lit(c["name"]))
            )
        elif c["kind"] == "fk":
            ref_keys = c["ref"].select(
                F.col(c["ref_col"]).alias(c["col"])
            ).distinct()
            parts.append(
                df.filter(F.col(c["col"]).isNotNull())
                .join(F.broadcast(ref_keys), c["col"], "left_anti")
                .withColumn("__violation", F.lit(c["name"]))
            )
    if not parts:
        return df.filter(F.lit(False)).withColumn(
            "__violation", F.lit(None).cast("string")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def assert_checks(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Fail-fast gate: returns the report if all checks pass, raises
    listing every failed check otherwise."""
    report = run_checks(df, checks)
    rows = report.collect()
    failed = [r for r in rows if not r.passed]
    if failed:
        detail = "; ".join(
            f"{r.check}: {r.violations}/{r.total}" for r in failed
        )
        raise ValueError(f"data-quality checks failed: {detail}")
    return report
