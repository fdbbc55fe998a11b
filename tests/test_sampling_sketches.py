"""Truth-model tests for weighted reservoir sampling, source overlap,
and count-min-sketch frequency estimation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from wrtd_etl_spark.catalog import load_table
from wrtd_etl_spark.dedup.source_overlap import (
    source_jaccard_exact,
    source_jaccard_minhash,
)
from wrtd_etl_spark.functions.sketches import (
    build_count_min,
    query_count_min,
    term_frequency_estimates,
)
from wrtd_etl_spark.operators.sampling import (
    sample_key,
    weighted_sample_per_group,
)

from .conftest import SF_SMOKE

_MOD = 2**32
_MUL = 2654435761


def _py_key(doc_id: int, w: float) -> float:
    u = ((doc_id * _MUL) % _MOD + 0.5) / _MOD
    return round(math.log(u) / w, 12)


def test_weighted_sample_matches_python_truth_model(spark):
    """The distributed two-stage top-k equals a brute-force A-ES in
    plain Python on the same deterministic hash."""
    rows = [(i, f"g{i % 3}", float(1 + i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    got = {
        (r.source, r.doc_id, r["rank"])
        for r in weighted_sample_per_group(df, 5, F.col("w")).collect()
    }
    expect = set()
    for g in ("g0", "g1", "g2"):
        members = [(i, w) for i, s, w in rows if s == g]
        ranked = sorted(members, key=lambda t: (-_py_key(t[0], t[1]), t[0]))
        expect |= {(g, i, r + 1) for r, (i, _) in enumerate(ranked[:5])}
    assert got == expect


def test_weighted_sample_two_stage_equals_one_window(spark):
    """Containment argument holds under adversarial partitioning: many
    small physical partitions must give the same sample as one window."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "source", "doc_id", "n_chars"
    )
    w = F.col("n_chars").cast("double")
    got = weighted_sample_per_group(docs.repartition(16), 7, w).select(
        "source", "doc_id", "rank"
    )
    keyed = docs.filter(w > 0).withColumn("__k", sample_key(F.col("doc_id"), w))
    win = Window.partitionBy("source").orderBy(F.desc("__k"), F.asc("doc_id"))
    ref = (
        keyed.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= 7)
        .select("source", "doc_id", "rank")
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in ref.collect()}


def test_weighted_sample_respects_weights(spark):
    """Zero-ish weight rows must essentially never win against heavy
    rows: weight 1000 vs weight 0.001 across many groups."""
    rows = []
    for g in range(50):
        for i in range(10):
            doc = g * 100 + i
            rows.append((doc, f"g{g}", 1000.0 if i < 5 else 0.001))
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    got = weighted_sample_per_group(df, 3, F.col("w")).collect()
    assert len(got) == 150
    heavy = sum(1 for r in got if r.doc_id % 100 < 5)
    # P(light row beats heavy rows) ~ (w_l/w_h)-scaled — vanishing; allow
    # a couple of flukes out of 150 picks
    assert heavy >= 148


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 0.0), (3, "g", -1.0), (4, "g", None)],
        "doc_id long, source string, w double",
    )
    got = weighted_sample_per_group(df, 10, F.col("w")).collect()
    assert {r.doc_id for r in got} == {1}


def test_source_jaccard_exact_planted(spark):
    """Three sources with hand-computable shingle sets, including a
    disjoint pair that must still appear with jaccard 0."""
    df = spark.createDataFrame(
        [
            (1, "A", "a b c d"),      # shingles {a b c, b c d}
            (2, "B", "a b c"),        # {a b c}
            (3, "C", "x y z"),        # {x y z}
        ],
        "doc_id long, source string, text string",
    )
    got = {
        (r.source_a, r.source_b): (r.n_a, r.n_b, r.n_common, r.jaccard)
        for r in source_jaccard_exact(df).collect()
    }
    assert got[("A", "B")] == (2, 1, 1, 0.5)
    assert got[("A", "C")] == (2, 1, 0, 0.0)
    assert got[("B", "C")] == (1, 1, 0, 0.0)


def test_source_jaccard_minhash_tracks_exact(spark):
    """The one-aggregation MinHash estimate stays within the standard
    ~1/sqrt(num_hashes) band of the exact join on real documents."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    exact = {
        (r.source_a, r.source_b): r.jaccard
        for r in source_jaccard_exact(docs).collect()
    }
    est = {
        (r.source_a, r.source_b): r.est_jaccard
        for r in source_jaccard_minhash(docs, num_hashes=128).collect()
    }
    assert set(est) == set(exact)
    worst = max(abs(est[k] - exact[k]) for k in exact)
    assert worst <= 0.25, f"minhash overlap estimate off by {worst}"


def test_count_min_error_bound(spark):
    """CMS contract: exact <= estimate <= exact + eps*N for every probe,
    at planted frequencies the bound makes non-vacuous."""
    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.filter(F.col("text").isNotNull()).select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t")
    )
    exact = {
        r.t: r.c
        for r in toks.groupBy("t").agg(F.count("*").alias("c")).collect()
    }
    n_total = sum(exact.values())
    eps = 0.0001
    sketch = build_count_min(toks, F.col("t"), eps=eps, confidence=0.99)
    probes = list(sorted(exact, key=exact.get, reverse=True))[:20] + ["zzz_absent"]
    for term, est in query_count_min(spark, sketch, probes):
        true = exact.get(term, 0)
        assert true <= est <= true + eps * n_total, (term, true, est)


def test_term_frequency_estimates_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    probes = ["the", "data", "nosuchtoken"]
    a = term_frequency_estimates(docs, "text", probes).collect()
    b = term_frequency_estimates(docs, "text", probes).collect()
    assert a == b
    assert [r.term for r in a] == probes
    got = {r.term: r.est_count for r in a}
    assert got["nosuchtoken"] <= got["the"]


def test_filtered_topk_filters_before_ranking(spark):
    """filter-then-search ≠ search-then-filter: every probe gets a full
    k of SAME-LABEL neighbors, while post-filtering the unfiltered top-k
    starves (labels are ~uniform-10, so a plain top-5 rarely contains 5
    same-label rows)."""
    from wrtd_etl_spark.similarity.ann import brute_force_top_k, filtered_top_k

    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}

    got = filtered_top_k(emb, probes, match_cols=["label"], k=5).collect()
    per_probe = {}
    for r in got:
        assert labels[r.neighbor_id] == labels[r.probe_id]
        per_probe.setdefault(r.probe_id, []).append(r)
    assert all(len(v) == 5 for v in per_probe.values())

    plain = brute_force_top_k(emb, probes, k=5).collect()
    post = [r for r in plain if labels[r.neighbor_id] == labels[r.probe_id]]
    assert len(post) < len(got)  # post-filtering starves


def test_sample_key_survives_full_range_ids(spark):
    """Snowflake-style 64-bit ids: the naive id*2654435761 overflows
    long under ANSI mode; hash32's split multiply must not, and must
    agree with the python model on the reduced id."""
    big = [2**62 + 7, 2**63 - 1, 5_000_000_000, 123]
    df = spark.createDataFrame(
        [(i, "g", 1.0) for i in big], "doc_id long, source string, w double"
    )
    got = {
        r.doc_id: r["rank"]
        for r in weighted_sample_per_group(df, 4, F.col("w")).collect()
    }
    assert set(got) == set(big)
    ranked = sorted(big, key=lambda i: (-_py_key(i % _MOD, 1.0), i))
    assert [got[i] for i in ranked] == [1, 2, 3, 4]


def test_hash32_equals_naive_product_everywhere(spark):
    """hash32's split multiply must equal (id*2654435761) mod 2^32 for
    ids across the whole long range — including where the naive Spark
    expression would overflow and where Python big-ints are the truth."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wrtd_etl_spark.operators.sampling import hash32

    ids = [0, 1, 2**31, 2**32 - 1, 2**32, 3_500_000_000, 2**62, 2**63 - 1]

    @settings(max_examples=30, deadline=None)
    @given(st.integers(min_value=0, max_value=2**63 - 1))
    def _collect(i):
        ids.append(i)

    _collect()
    df = spark.createDataFrame([(i,) for i in sorted(set(ids))], "id long")
    got = {
        r.id: r.h
        for r in df.select("id", hash32(F.col("id")).alias("h")).collect()
    }
    for i, h in got.items():
        assert h == (i * _MUL) % _MOD, (i, h)
