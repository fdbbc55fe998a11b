"""wrtd_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL service (GGoyathlay/WRTD-ETL).

The reference delegates all query planning/execution to PostgreSQL
(reference: docker/airflow/dags/tasks/queries.py); here Catalyst plays that
role. Everything is DataFrame/SQL-first: explicit schemas, broadcast joins
for small dimensions, pushed-down predicates, and Structured Streaming for
the polling loops.

Layout:
    session      SparkSession builder tuned for local[N] and cluster use
    catalog      loaders for the parquet test tables (+ view registration)
    schemas      explicit StructType schemas (replay domain + ingest docs)
    operators/   reusable relational operators (joins, aggs, windows, upsert)
    sources/     ingest: HTML regex extraction, nested-JSON flattening
    functions/   scalar function surface + text analytics
    plans/       the query catalog graded by the driver (testdata + replay)
    streaming/   incremental cursor, outbox consumer, dedup, suppression
    dedup/       exact + MinHash/SimHash/n-gram/embedding near-dup
    similarity/  ANN over embedding columns (brute-force + LSH)
    multimodal/  binary-column plumbing with stubbed decoders
"""

__version__ = "0.1.0"
