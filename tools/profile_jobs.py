"""Per-query Spark JOB profile: run registry queries and list every job
the query triggers (id, duration, description) via the UI REST API.

Usage: python tools/profile_jobs.py <query>[,<query>...] [--repeat N]

The lake-lifecycle queries are driver-coordinated chains of many small
jobs; wall-clock there is dominated by job COUNT x scheduling latency,
not data. This tool makes that count visible so fusions (observe(),
thunked gates) can be verified as "N jobs -> M jobs", which no
.explain() dump can show.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from wrtd_etl_spark.session import RUNTIME_CONFS


def get_jobs(ui: str, app_id: str) -> list[dict]:
    url = f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1].split(",")
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("wrtd-profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/wrtd-spark-warehouse"),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    from wrtd_etl_spark.plans import REGISTRY
    from wrtd_etl_spark.plans import testdata_queries  # noqa: F401

    try:
        from wrtd_etl_spark.plans import pipeline_queries  # noqa: F401
        from wrtd_etl_spark.plans import replay_queries  # noqa: F401
        from wrtd_etl_spark.plans import streaming_queries  # noqa: F401
    except ImportError:
        pass

    # Label every job with the PYTHON call site that triggered it: wrap
    # the action entry points so the REST API's job descriptions point
    # at engine source lines instead of JVM anonfun frames.
    import traceback

    from pyspark.sql.classic.dataframe import DataFrame as CDF
    from pyspark.sql.readwriter import DataFrameWriter

    def _site() -> str:
        for fr in reversed(traceback.extract_stack()):
            if "/wrtd_etl_spark/" in fr.filename:
                base = fr.filename.rsplit("/wrtd_etl_spark/", 1)[1]
                return f"{base}:{fr.lineno}"
        return "caller"

    def _wrap(cls, meth):
        orig = getattr(cls, meth)

        def run(self, *a, **kw):
            spark.sparkContext.setJobDescription(f"{meth} @ {_site()}")
            try:
                return orig(self, *a, **kw)
            finally:
                spark.sparkContext.setJobDescription(None)

        setattr(cls, meth, run)

    for m in ("collect", "count", "take", "toPandas", "head"):
        _wrap(CDF, m)
    for m in ("parquet", "save", "json", "csv"):
        _wrap(DataFrameWriter, m)

    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    for name in names:
        spec = REGISTRY[name]
        for it in range(repeat):
            before = {j["jobId"] for j in get_jobs(ui, app_id)}
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            wall = time.perf_counter() - t0
            time.sleep(0.3)
            jobs = [
                j for j in get_jobs(ui, app_id) if j["jobId"] not in before
            ]
            jobs.sort(key=lambda j: j["jobId"])
            total_ms = 0.0
            print(f"\n=== {name} run {it}: wall {wall:.3f}s, {len(jobs)} jobs ===")
            for j in jobs:
                t_sub = time.mktime(
                    time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                ) + float(j["submissionTime"][20:23]) / 1000
                t_end = time.mktime(
                    time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
                ) + float(j["completionTime"][20:23]) / 1000
                dur = t_end - t_sub
                total_ms += dur
                desc = (j.get("description") or j["name"])[:100]
                print(
                    f"  job {j['jobId']:>4}  {dur:6.3f}s  "
                    f"stages={len(j['stageIds'])} tasks={j['numTasks']:>4}  {desc}"
                )
            print(f"  sum of job durations: {total_ms:.3f}s (wall {wall:.3f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
