"""Simulate the grading driver: vanilla SparkSession (none of our builder
configs), import __spark_entry__, run entry() smoke + queries() vs
oracle_sql() via DuckDB views at sf0.01."""

import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

# VANILLA session — the driver does not know about our configs
spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

# 1. smoke: entry at sf0.001
df = e.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
for r in rows:
    print("   ", tuple(r))

# 2. correctness: queries vs oracles at sf0.01 (override with argv[1])
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

q = e.queries()
o = e.oracle_sql()
print(f"\n{len(q)} queries, {len(o)} oracles")
fails = 0
for name, fn in q.items():
    sdf = fn(spark, SF)
    s_rows = sorted([tuple(str(x) for x in sorted(zip(sdf.columns, r), key=lambda p: p[0])) for r in sdf.collect()])
    if name not in o:
        print(f"ROWS-ONLY {name}: {len(s_rows)} rows")
        continue
    res = con.execute(o[name])
    d_cols = [d[0] for d in res.description]
    d_rows = sorted([tuple(str(x) for x in sorted(zip(d_cols, r), key=lambda p: p[0])) for r in res.fetchall()])
    status = "MATCH" if s_rows == d_rows else "MISMATCH"
    if status == "MISMATCH":
        fails += 1
        for a, b in zip(s_rows, d_rows):
            if a != b:
                print(f"   spark={a}\n   duck ={b}")
                break
    print(f"{status} {name}: {len(s_rows)} rows")
spark.stop()
sys.exit(1 if fails else 0)
