"""Count-min-sketch frequency estimation over a token stream.

The corpus-vocabulary pass (plans/pipeline_queries.py corpus_vocab)
computes EXACT term frequencies with a full shuffle of the vocabulary;
at 100 TB a mixture/monitoring job often only needs "how frequent are
THESE terms" — which a count-min sketch answers with one aggregation
whose state is a fixed (depth × width) counter grid, independent of
vocabulary size (Cormode & Muthukrishnan, J. Algorithms 55(1), 2005).

Spark-first shape: ``F.count_min_sketch`` is a JVM-side TypedImperative
aggregate — per-partition sketches merge on the map side, so the ONLY
thing crossing the wire is #partitions × (depth·width·8) bytes, never a
(term, count) table. The merged sketch is a few KB; point queries run
driver-side through the same ``org.apache.spark.util.sketch`` class that
built it, so estimates use the identical hash family (verified by test:
estimate ≥ exact always, ≤ exact + eps·N at the sketch's confidence).

Guarantee: estimate e satisfies exact ≤ e ≤ exact + eps·N with
probability ≥ confidence, N = total counted items.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_count_min(
    df: DataFrame,
    col: Column,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """Merged count-min sketch of ``col`` (non-null values) as bytes —
    persistable alongside a versioned table's manifest ``extra`` for
    build-once/query-many monitoring."""
    row = df.select(
        F.count_min_sketch(
            col, F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("s")
    ).head()
    return bytes(row["s"])


def query_count_min(spark, sketch: bytes, terms: list[str]) -> list[tuple[str, int]]:
    """Point-estimate each term's frequency from a sketch built by
    :func:`build_count_min`. Driver-side and O(len(terms)·depth) — the
    sketch is KBs regardless of corpus size."""
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(sketch)
    )
    return [(t, int(cms.estimateCount(t))) for t in terms]


def term_frequency_estimates(
    df: DataFrame,
    text_col: str,
    terms: list[str],
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """(term, est_count) for a fixed probe vocabulary, via one
    sketch-aggregate pass over the exploded token stream. Deterministic
    for a given seed, so the result is stable across runs — but the
    VALUES are sketch estimates (upper bounds), so correctness is
    asserted by the error-bound test, not a SQL oracle."""
    from . import text as TX

    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.explode(TX.lower_tokens(F.col(text_col))).alias("tok")
    )
    sketch = build_count_min(toks, F.col("tok"), eps, confidence, seed)
    est = query_count_min(df.sparkSession, sketch, terms)
    return df.sparkSession.createDataFrame(est, "term string, est_count long")
