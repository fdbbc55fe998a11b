"""Fuzzy-dedup verification: LSH candidate pairs + banded Levenshtein.

The precise confirmation pass a dedup pipeline runs AFTER cheap candidate
generation (reference: the reference engine has no fuzzy dedup at all —
this is part of the training-data surface SURVEY §2.12 adds). Two pieces,
deliberately decoupled:

* :func:`minshingle_candidate_pairs` — candidate generation by MIN-SHINGLE
  LSH: per band b, a document's key is ``min(md5(b || '|' || shingle))``
  over its word ``shingle_k``-grams (a 1-row-per-band MinHash built from
  md5 so DuckDB computes the identical keys — the engine-portable twin of
  dedup/minhash.py's xxhash bands). Near-identical documents share most
  shingles, hence (with high probability) the per-band minimum; the
  candidate set is all id-ordered pairs sharing any band key.

  WHY THIS KEY: round-3's verify stage blocked on the document's FIRST
  TOKEN, and first-token frequency is Zipfian — on a real corpus one
  block holds O(N) docs ("the …") and the within-block join goes
  quadratic (the worst skew in SHUFFLE_AUDIT r3). A min-of-hashes key is
  uniform over CONTENT: only genuinely similar documents collide, so
  block sizes track duplicate-group sizes, not token frequency.

* :func:`levenshtein_verify` — the exact verify filter over ANY candidate
  pair table (these min-shingle candidates, dedup/minhash.py bands,
  dedup/simhash.py pigeonhole buckets): keep pairs whose edit distance is
  ≤ ``1/max_dist_den`` of the longer text. The threshold is the integer
  form ``dist * den <= max_len`` in both engines (a fractional
  ``CAST(0.25*len ...)`` ROUNDS in DuckDB and TRUNCATES in Spark), and
  the same bound is passed INTO Spark's 3-arg ``levenshtein`` so the DP
  runs a O(L·L/den) band and exits early — identical pair set, ~4x less
  work per pair.

Scale shape: shingling is a scan-stage projection (one explode, rows =
#docs × bands); the bucket join shuffles once on (band, key); hot buckets
are capped BEFORE any pair list materializes (count aggregate + broadcast
anti-join — the dedup/minhash.py idiom, same rationale: a degenerate
bucket must never reach collect_list); pair enumeration is an array
expression over each bucket's sorted member list; the verify join touches
only candidate pairs, never the corpus cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minshingle_keys(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, band, key): per-band minimum md5 over word ``shingle_k``-gram
    shingles of the lower/trimmed text. Documents shorter than one
    shingle contribute their whole text (both engines slice-to-available,
    the dedup/substring.py window rule)."""
    # tokenization materialized BEFORE the HOF lambdas: lambda bodies sit
    # outside codegen CSE, so an inline split would re-run per element
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    pos = F.sequence(
        F.lit(1), F.greatest(F.size("__toks") - (shingle_k - 1), F.lit(1))
    )
    shingles = F.transform(
        pos, lambda p: F.concat_ws(" ", F.slice(F.col("__toks"), p, shingle_k))
    )
    keys = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("__sh"),
                    lambda s, b=b: F.md5(
                        F.encode(F.concat(F.lit(f"{b}|"), s), "UTF-8")
                    ),
                )
            )
            for b in range(bands)
        ]
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), toks.alias("__toks"))
        .select(F.col(id_col), shingles.alias("__sh"))
        .select(id_col, F.posexplode(keys).alias("band", "key"))
    )


def minshingle_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket: int = 64,
) -> DataFrame:
    """(id1, id2) candidate pairs (id1 < id2) sharing any band min-shingle.

    ``max_bucket`` drops degenerate buckets whole (boilerplate corpora:
    thousands of docs sharing one min-shingle) before any member list
    materializes — deterministic, so the DuckDB oracle applies the same
    cap with a windowed count. Dropped buckets only lose pairs that other
    bands almost certainly still catch."""
    posts = minshingle_keys(df, text_col, id_col, bands, shingle_k)
    # Hot-bucket cap as a WINDOW count over the bucket key (r13 perf,
    # guide §2.4): the former count-aggregate + broadcast anti-join
    # executed the shingling+md5 projection TWICE (posts feeds both the
    # size probe and the join) and planned two exchanges; the window
    # hash-partitions by (band, key) once, the groupBy below reuses that
    # partitioning (ReusedExchange — the kmeans cap idiom), and the
    # filter still runs BEFORE any member list materializes, so a
    # degenerate bucket spills in the window sort instead of OOMing a
    # collect_list buffer. Same cap semantics as the oracle's QUALIFY.
    from pyspark.sql import Window

    w = Window.partitionBy("band", "key")
    cold = (
        posts.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") <= max_bucket)
        .drop("__n")
    )
    grouped = (
        cold.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .select("p.id1", "p.id2")
        .distinct()
    )


def levenshtein_verify(
    pairs: DataFrame,
    texts: DataFrame,
    text_col: str,
    id_col: str,
    max_dist_den: int = 4,
) -> DataFrame:
    """(id1, id2, dist) for candidate pairs within edit distance
    ``max_len / max_dist_den`` — the exact verify stage over any
    candidate generator's (id1, id2) output.

    ``texts`` rows are joined back by id (two hash joins on the tiny pair
    table side), the length-gap prune runs before any DP (dist ≥ length
    difference), and the banded 3-arg levenshtein returns -1 as soon as
    the band is exceeded. ``dist * den <= max_len ⇔ dist <=
    floor(max_len/den)`` for integer dist, so the banded form keeps the
    exact pair set."""
    t = F.lower(F.trim(F.col(text_col)))
    d = texts.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), t.alias("__t")
    )
    a = d.select(F.col(id_col).alias("id1"), F.col("__t").alias("__t1"))
    b = d.select(F.col(id_col).alias("id2"), F.col("__t").alias("__t2"))
    den = int(max_dist_den)
    dist = F.expr(
        "levenshtein(__t1, __t2, "
        f"cast(greatest(length(__t1), length(__t2)) div {den} as int))"
    )
    len_gap_ok = (
        F.abs(F.length("__t1") - F.length("__t2")) * den
        <= F.greatest(F.length("__t1"), F.length("__t2"))
    )
    return (
        pairs.join(a, "id1")
        .join(b, "id2")
        .filter(len_gap_ok)
        .filter(dist >= 0)
        .select("id1", "id2", dist.cast("long").alias("dist"))
    )
