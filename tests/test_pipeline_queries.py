"""Differential + property tests for the data-pipeline layer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.plans import REGISTRY
from wrtd_etl_spark.plans import pipeline_queries  # noqa: F401 (registers)

from .conftest import SF_CORRECT, SF_SMOKE, compare_to_oracle

_PIPELINE_ORACLE = [
    "doc_token_stats",
    "doc_lang_id",
    "doc_quality",
    "doc_fingerprint",
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "embedding_neardup",
    "ann_cosine_topk",
    "multimodal_meta",
    "dataset_split",
    "training_corpus",
    "doc_chunks",
    "stratified_sample",
    "contamination_check",
    "context_packing",
    "per_source_cap",
    "corpus_vocab",
    "pii_redaction",
    "bigram_counts",
    "dedup_apply",
    "doc_repetition",
    "doc_tfidf_topk",
    "dedup_fuzzy_verify",
    "quality_weighted_sample",
    "dedup_substring",
    "corpus_mixture",
    "heavy_hitter_tokens",
    "weighted_doc_sample",
    "source_overlap",
    "keyword_search",
    "ann_filtered_topk",
]


@pytest.mark.parametrize("name", _PIPELINE_ORACLE)
def test_pipeline_query_matches_oracle(spark, name):
    compare_to_oracle(spark, REGISTRY[name], SF_SMOKE)


def test_rows_only_queries_run(spark):
    for name in (
        "dedup_minhash",
        "dedup_simhash",
        "embedding_neardup_lsh",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "ann_ivf_kmeans_topk",
        "multimodal_decode",
        "semantic_dedup",
        "ann_sq8_topk",
        "bpe_tokenize",
    ):
        df = REGISTRY[name].fn(spark, SF_SMOKE)
        assert df.count() >= 0  # runs to completion with a stable schema


def test_training_corpus_is_non_vacuous(spark):
    """The quality gate must keep a real corpus on the testdata — a 0-row
    result would make the oracle match vacuous (VERDICT r1)."""
    result = REGISTRY["training_corpus"].fn(spark, SF_SMOKE)
    rows = result.collect()
    assert len(rows) > 0
    assert sum(r.n_docs for r in rows) > 0


def test_exact_dedup_keeps_one_per_group(spark):
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.dedup.exact import exact_dedup

    docs = load_table(spark, SF_SMOKE, "documents")
    # inject exact duplicates (whitespace/case variants must collapse)
    dupes = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text", F.upper(F.col("text"))
    )
    full = docs.unionByName(dupes)
    deduped = exact_dedup(full, "text", "doc_id")
    assert deduped.count() == docs.count()
    # survivors are the min-id variants (originals)
    assert deduped.filter(F.col("doc_id") >= 100000).count() == 0


def test_minhash_agrees_with_true_jaccard(spark):
    """LSH candidates that pass verification must equal brute-force truth
    above the threshold (verification is exact, so no false positives; at
    j>=0.9 collision probability is ~1 so no false negatives either)."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.dedup.minhash import minhash_near_dup_pairs, shingles

    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    # build near-dupes: copy docs, drop the last 2 tokens
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    near = (
        docs.withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn(
            "text",
            F.concat_ws(" ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(1)))),
        )
    )
    full = docs.unionByName(near)
    got = {
        (r.id1, r.id2)
        for r in minhash_near_dup_pairs(
            full, "text", "doc_id", threshold=0.9
        ).collect()
    }
    # brute-force truth
    g = full.select(F.col("doc_id").alias("bid"), shingles(F.col("text")).alias("sh"))
    a = g.select(F.col("bid").alias("id1"), F.col("sh").alias("s1"))
    b = g.select(F.col("bid").alias("id2"), F.col("sh").alias("s2"))
    inter = F.size(F.array_intersect("s1", "s2")).cast("double")
    union = (F.size("s1") + F.size("s2") - F.size(F.array_intersect("s1", "s2"))).cast(
        "double"
    )
    truth = {
        (r.id1, r.id2)
        for r in a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("j", inter / union)
        .filter(F.col("j") >= 0.9)
        .select("id1", "id2")
        .collect()
    }
    assert got >= truth  # no false negatives at j>=0.9
    assert got <= truth or all(p in truth for p in got)  # verify step is exact


def test_simhash_identical_docs_distance_zero(spark):
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.dedup.simhash import simhash_near_dup_pairs

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    clones = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    pairs = simhash_near_dup_pairs(
        docs.unionByName(clones), "text", "doc_id", max_distance=0
    )
    got = {(r.id1, r.id2): r.hamming for r in pairs.collect()}
    for r in docs.select("doc_id").collect():
        assert got.get((r.doc_id, r.doc_id + 100000)) == 0


def test_lsh_topk_recall_vs_brute_force(spark):
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.similarity.ann import brute_force_top_k, lsh_top_k

    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in brute_force_top_k(emb, probes, k=5).collect()
    }
    approx = {
        (r.probe_id, r.neighbor_id) for r in lsh_top_k(emb, probes, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall collapsed: {recall}"


def test_multimodal_feature_and_frames(spark):
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.multimodal.binary_ops import (
        attach_binary_payload,
        extract_features,
        sample_frames,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    media = attach_binary_payload(docs, "text", "doc_id")
    feats = extract_features(media).collect()
    assert all(len(r.feature) == 16 for r in feats)
    frames = sample_frames(media, n_frames=4)
    counts = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in counts)


def test_multimodal_decode_stub_raises(spark):
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.multimodal.binary_ops import (
        attach_binary_payload,
        decode_image,
    )
    from py4j.protocol import Py4JJavaError

    docs = load_table(spark, SF_SMOKE, "documents").limit(2)
    media = attach_binary_payload(docs, "text", "doc_id")
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        decode_image(media, fake=False).collect()


def test_ivf_topk_recall_vs_brute_force(spark):
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.similarity.ann import brute_force_top_k
    from wrtd_etl_spark.similarity.ivf import ivf_top_k
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.probe_id, r.neighbor_id)
        for r in brute_force_top_k(emb, probes, k=5).collect()
    }
    approx = {
        (r.probe_id, r.neighbor_id)
        for r in ivf_top_k(emb, probes, k=5, n_cells=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"


def test_contamination_check_fires_on_testdata(spark):
    """The prefix-fingerprint key must actually detect leakage on the
    corpus (an exact-duplicate key finds nothing here — vacuous)."""
    rows = REGISTRY["contamination_check"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r.n_train_hits >= 1 for r in rows)


def test_context_packing_invariants(spark):
    """Packing conserves tokens, numbers windows contiguously from 0, and
    every window starts strictly inside its budget boundary."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.functions import text as TX

    rows = sorted(
        REGISTRY["context_packing"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.window_id,
    )
    docs = load_table(spark, SF_SMOKE, "documents")
    total = docs.select(
        F.sum(TX.token_count(F.col("text"))).alias("t")
    ).collect()[0].t
    assert sum(r.total_tokens for r in rows) == total
    assert [r.window_id for r in rows] == list(range(len(rows)))
    assert all(r.n_docs > 0 for r in rows)


def test_connected_components_matches_union_find(spark):
    """Hash-min label propagation == union-find truth on a graph with a
    4-chain (diameter 3 — forces multiple propagation rounds), a triangle,
    one isolated pair, and ids deliberately out of order."""
    from wrtd_etl_spark.dedup.clusters import connected_components, dup_clusters

    edges = [
        (40, 30), (30, 20), (20, 10),      # chain: min label travels 3 hops
        (7, 9), (9, 8), (7, 8),            # triangle
        (100, 99),                          # pair
    ]
    df = spark.createDataFrame(edges, "id1 long, id2 long")

    parent: dict[int, int] = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}

    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert got == want

    sizes = {r.doc_id: r.cluster_size for r in dup_clusters(df).collect()}
    assert sizes == {10: 4, 20: 4, 30: 4, 40: 4, 7: 3, 8: 3, 9: 3, 99: 2, 100: 2}


def test_dedup_clusters_matches_oracle(spark):
    from wrtd_etl_spark.plans.registry import REGISTRY

    compare_to_oracle(spark, REGISTRY["dedup_clusters"], SF_CORRECT)


def test_kmeans_centroids_improve_or_match_ivf(spark):
    """Lloyd training must (a) be deterministic, (b) produce more balanced
    cells than the hash-sample init, (c) keep recall at least as high."""
    from pyspark.sql import functions as F
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.similarity.ann import brute_force_top_k
    from wrtd_etl_spark.similarity.ivf import _assign_cells, ivf_top_k
    from wrtd_etl_spark.similarity.kmeans import train_centroids_kmeans

    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)

    trained = train_centroids_kmeans(emb, n_cells=16, rounds=2)
    assert trained == train_centroids_kmeans(emb, n_cells=16, rounds=2)

    # baseline init = rounds=0 (exactly the hash-sample ivf.py uses)
    init = train_centroids_kmeans(emb, n_cells=16, rounds=0)

    def cell_sizes(cents):
        rows = (
            _assign_cells(emb, "embedding", "vec_id", cents, nprobe=1)
            .groupBy("cell")
            .count()
            .collect()
        )
        return [r["count"] for r in rows]

    def imbalance(sizes):  # max/mean: 1.0 = perfectly even
        return max(sizes) / (sum(sizes) / len(sizes))

    assert imbalance(cell_sizes(trained)) <= imbalance(cell_sizes(init))

    exact = {
        (r.probe_id, r.neighbor_id)
        for r in brute_force_top_k(emb, probes, k=5).collect()
    }
    def recall(cents):
        approx = {
            (r.probe_id, r.neighbor_id)
            for r in ivf_top_k(
                emb, probes, k=5, n_cells=16, nprobe=4, centroids=cents
            ).collect()
        }
        return len(exact & approx) / len(exact)

    r_init, r_trained = recall(init), recall(trained)
    assert r_trained >= r_init - 0.05, (r_init, r_trained)
    assert r_trained >= 0.3


def test_pii_redaction_scrubs_known_fixtures(spark):
    """Every PII class is removed, rule order protects specific classes
    from the general phone rule, and clean text passes through unchanged."""
    from wrtd_etl_spark.functions.text import redact_pii

    rows = [
        (1, "mail bob.smith+x@mail.example.org now"),
        (2, "call +1 (415) 555-1234 today"),
        (3, "ssn 123-45-6789 and host 10.0.0.1"),
        (4, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r.id: r.r for r in df.select("id", redact_pii(F.col("t")).alias("r")).collect()}
    assert got[1] == "mail [EMAIL] now"
    assert got[2] == "call [PHONE] today"
    assert got[3] == "ssn [SSN] and host [IPV4]"
    assert got[4] == "no pii here at all"


def test_pii_redaction_query_non_vacuous(spark):
    rows = REGISTRY["pii_redaction"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(r.email_hits >= 1 and r.phone_hits >= 1 for r in rows)


def test_connected_components_random_graphs_property(spark):
    """Property: hash-min label propagation equals union-find on random
    edge sets (chains, cliques, forests, self-loops, duplicate edges)."""
    from hypothesis import given, settings, strategies as st

    from wrtd_etl_spark.dedup.clusters import connected_components

    edge_st = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=25,
    )

    @settings(max_examples=8, deadline=None)
    @given(edges=edge_st)
    def check(edges):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {n: find(n) for n in parent}

        df = spark.createDataFrame(edges, "id1 long, id2 long")
        got = {r.node: r.cluster_id for r in connected_components(df).collect()}
        assert got == want

    check()


def test_dedup_apply_catches_boilerplate_clones(spark, tmp_path):
    """An 80%-clone corpus (the boilerplate-page scenario): identical docs
    share ALL n-grams, so df-pruning hides them from the near-dup pair
    graph — the exact-fingerprint layer must catch them. Survivors =
    distinct texts; and the bucket caps keep the clone flood from going
    quadratic in the near-dup path."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from .conftest import TABLE_NAMES

    d = tmp_path / "sf_clones"
    d.mkdir()
    for t in TABLE_NAMES:
        if t != "documents":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", str(d / f"{t}.parquet"))
    boiler = "cookie notice accept all rights reserved terms of service apply"
    texts = [boiler] * 80 + [f"unique document number {i} with words" for i in range(20)]
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["web"] * n),
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    rows = REGISTRY["dedup_apply"].fn(spark, str(d)).collect()
    survivors = sum(r.n_docs for r in rows)
    # 80 clones collapse to 1; the 20 unique docs are near-dups of each
    # other pairwise only if jaccard >= threshold — count them precisely:
    # they differ in one token, so they MAY cluster; survivors must at
    # least collapse all clones and keep >= 1 of each text family
    assert survivors <= 21
    assert survivors >= 2
    # and the oracle agrees on this adversarial corpus
    compare_to_oracle(spark, REGISTRY["dedup_apply"], str(d))


def test_minhash_hot_bucket_cap_drops_degenerate_buckets(spark):
    """A flood of identical docs makes every band bucket hot; the cap must
    drop those buckets (before their member lists ever materialize) while
    pairs from cold buckets survive untouched."""
    from wrtd_etl_spark.dedup.minhash import minhash_near_dup_pairs

    flood = [(i, "identical boilerplate text repeated everywhere") for i in range(200)]
    # two genuine near-dups in a cold bucket
    distinct = [
        (1000, "completely different unique words alpha beta gamma delta"),
        (1001, "completely different unique words alpha beta gamma"),
    ]
    df = spark.createDataFrame(flood + distinct, "doc_id long, text string")
    pairs = minhash_near_dup_pairs(
        df, "text", "doc_id", threshold=0.5, max_bucket=50
    ).collect()
    ids = {(r.id1, r.id2) for r in pairs}
    # the flood's buckets are all oversized -> no pairs among them
    assert not any(a < 1000 and b < 1000 for a, b in ids)
    # the cold-bucket pair is found and verified
    assert (1000, 1001) in ids


def test_dedup_apply_null_texts_match_oracle(spark, tmp_path):
    """>=2 NULL-text docs: Spark's null-dropping fingerprint join and the
    oracle's PARTITION BY fingerprint must agree that NULL-text docs are
    never exact-dup losers (pinned by symmetric IS NOT NULL filters)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from .conftest import TABLE_NAMES, compare_to_oracle

    d = tmp_path / "sf_nulls"
    d.mkdir()
    for t in TABLE_NAMES:
        if t != "documents":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", str(d / f"{t}.parquet"))
    texts = (
        [None, None, None]
        + ["same duplicated text body here"] * 3
        + [f"unique document number {i} with words" for i in range(5)]
    )
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["web"] * n),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], type=pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    rows = {r.lang: r.n_docs for r in REGISTRY["dedup_apply"].fn(spark, str(d)).collect()}
    # 3 NULL-text docs all survive (never losers) + 1 of the 3 identical
    # + 5 unique (near-dup clustering may collapse some of the 5)
    assert rows["en"] >= 3 + 1 + 1
    compare_to_oracle(spark, REGISTRY["dedup_apply"], str(d))


def _tiny_png(w=3, h=2, rgb=(10, 200, 30)) -> bytes:
    """A real, spec-valid RGB PNG built with stdlib only."""
    import struct
    import zlib

    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_sniff_image_dims_real_headers():
    """Header parse of real PNG/GIF/JPEG bytes — no codec library."""
    import struct

    from wrtd_etl_spark.multimodal.binary_ops import sniff_image_dims

    assert sniff_image_dims(_tiny_png(3, 2)) == (3, 2, 3)
    gif = b"GIF89a" + struct.pack("<HH", 7, 5) + b"\x00" * 10
    assert sniff_image_dims(gif) == (7, 5, 3)
    # minimal JPEG: SOI + APP0 stub + SOF0 (1 component gray, 4x6)
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + struct.pack(">H", 8) + b"\x08" + struct.pack(">HH", 6, 4) + b"\x01"
    assert sniff_image_dims(b"\xff\xd8" + app0 + sof0) == (4, 6, 1)
    with pytest.raises(ValueError):
        sniff_image_dims(b"just some text bytes")


def test_decode_image_real_png_via_spark(spark):
    """decode_image(fake=False) on a real PNG payload: real dimensions out
    of the mapInPandas path (header parse here; Pillow where installed)."""
    from wrtd_etl_spark.multimodal.binary_ops import decode_image

    png = _tiny_png(5, 4)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), None)],
        "media_id long, media_type string, payload binary, "
        "meta map<string,string>",
    )
    rows = decode_image(media, fake=False).collect()
    assert [(r.media_id, r.width, r.height, r.n_channels) for r in rows] == [
        (1, 5, 4, 3)
    ]


def test_decode_image_pillow_full_decode(spark):
    """Full raster decode when Pillow is installed (skips in this
    container, runs wherever PIL exists — same fixture, same expectation)."""
    pytest.importorskip("PIL")
    from wrtd_etl_spark.multimodal.binary_ops import decode_image

    png = _tiny_png(5, 4)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), None)],
        "media_id long, media_type string, payload binary, "
        "meta map<string,string>",
    )
    rows = decode_image(media, fake=False).collect()
    assert [(r.media_id, r.width, r.height, r.n_channels) for r in rows] == [
        (1, 5, 4, 3)
    ]


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 100-node path graph (diameter 99): plain hash-min needs ~99
    rounds; with pointer-jumping after `escalate_after` it must converge
    in escalate_after + O(log n) rounds — max_iter=20 forces the
    escalation to actually do the work."""
    from wrtd_etl_spark.dedup.clusters import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "id1 long, id2 long"
    )
    labels = connected_components(edges, max_iter=20, escalate_after=4)
    got = {(r.node, r.cluster_id) for r in labels.collect()}
    assert got == {(i, 0) for i in range(100)}


def test_connected_components_two_chains_and_clique(spark):
    """Mixed topology under escalation: two disjoint chains + one clique
    keep distinct min-labels (pointer jumps must not cross components)."""
    from wrtd_etl_spark.dedup.clusters import connected_components

    chain1 = [(i, i + 1) for i in range(0, 19)]          # nodes 0..19
    chain2 = [(i, i + 1) for i in range(100, 119)]       # nodes 100..119
    clique = [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]
    edges = spark.createDataFrame(
        chain1 + chain2 + clique, "id1 long, id2 long"
    )
    labels = {
        r.node: r.cluster_id
        for r in connected_components(
            edges, max_iter=15, escalate_after=3
        ).collect()
    }
    assert all(labels[i] == 0 for i in range(20))
    assert all(labels[i] == 100 for i in range(100, 120))
    assert all(labels[i] == 200 for i in range(200, 205))


def test_doc_repetition_is_non_vacuous(spark):
    """The gate must flag real docs on the testdata — a corpus where no
    doc trips either threshold would make the oracle match vacuous."""
    rows = REGISTRY["doc_repetition"].fn(spark, SF_SMOKE).collect()
    assert sum(1 for r in rows if r.repetitive) >= 1
    assert all(0.0 <= r.top_word_frac <= 1.0 for r in rows)


def test_doc_repetition_zero_shuffle_stats(spark):
    """The per-doc stats are HOF projections — no exchange may appear
    below the driver-facing sort (the whole point vs explode+groupBy)."""
    df = REGISTRY["doc_repetition"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly the ORDER BY's rangepartitioning exchange, nothing keyed
    assert "hashpartitioning" not in plan.lower()


def test_dedup_fuzzy_verify_finds_near_clones(spark):
    """Blocked + levenshtein-verified pairs must exist on the testdata
    (it carries near-clone docs) and every pair must satisfy the 25%
    bound symmetrically."""
    rows = REGISTRY["dedup_fuzzy_verify"].fn(spark, SF_SMOKE).collect()
    assert len(rows) >= 1
    assert all(r.id1 < r.id2 and r.dist >= 0 for r in rows)


def test_quality_weighted_sample_downsamples(spark):
    """The sample must be a strict, non-empty subset: keeping everything
    (or nothing) would mean the hash-vs-quality comparison is vacuous."""
    from wrtd_etl_spark.catalog import load_table

    kept = (
        REGISTRY["quality_weighted_sample"].fn(spark, SF_SMOKE)
        .agg(F.sum("n_kept"))
        .collect()[0][0]
    )
    total = load_table(spark, SF_SMOKE, "documents").count()
    assert 0 < kept < total


def test_doc_tfidf_topk_ranks_within_doc(spark):
    """Every doc contributes at most 3 terms, rk is 1..3, and the scores
    are non-increasing within a doc (ties broken by term)."""
    rows = REGISTRY["doc_tfidf_topk"].fn(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        assert 1 <= len(doc_rows) <= 3
        assert [r.rk for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        scores = [r.score for r in doc_rows]
        assert scores == sorted(scores, reverse=True)


def test_kmeans_cell_cap_binds_without_changing_the_contract(spark):
    """The per-cell sample cap must (a) be a no-op when it doesn't bind
    and (b) still produce deterministic, well-formed centroids when it
    does — the bounded-group guarantee for 100 TB cells."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.similarity.kmeans import train_centroids_kmeans

    emb = load_table(spark, SF_SMOKE, "embeddings")
    uncapped = train_centroids_kmeans(emb, n_cells=8, rounds=2)
    huge_cap = train_centroids_kmeans(emb, n_cells=8, rounds=2, cell_sample_cap=10**9)
    assert uncapped == huge_cap  # default cap never binds at test scale

    capped = train_centroids_kmeans(emb, n_cells=8, rounds=2, cell_sample_cap=20)
    assert capped == train_centroids_kmeans(
        emb, n_cells=8, rounds=2, cell_sample_cap=20
    )  # deterministic under a binding cap
    assert len(capped) == 8 and all(len(c) == len(capped[0]) for c in capped)
    assert capped != uncapped  # the cap actually bound (sanity)


def test_semantic_dedup_flags_every_clone(spark):
    """Identical vectors always share a cell (deterministic argmax), so
    every clone MUST be flagged with dup_of = its original at cosine 1.0
    — the non-vacuity contract of the registered query."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.similarity.semdedup import semantic_dup_losers

    emb = load_table(spark, SF_SMOKE, "embeddings")
    clones = emb.withColumn("vec_id", F.col("vec_id") + 10_000_000)
    losers = semantic_dup_losers(
        emb.unionByName(clones), threshold=0.95, n_cells=8, rounds=1
    ).collect()
    flagged = {r.vec_id: r for r in losers}
    originals = [r.vec_id for r in emb.select("vec_id").collect()]
    for vid in originals:
        assert vid + 10_000_000 in flagged, f"clone of {vid} not flagged"
        r = flagged[vid + 10_000_000]
        # min-id survivor: the original (or an even-earlier semantic dup)
        assert r.dup_of <= vid and r.cosine >= 0.95
    # no original may be dropped in favor of its own higher-id clone
    assert all(vid not in flagged or flagged[vid].dup_of < vid for vid in originals)


def test_semantic_dedup_no_false_positives(spark):
    """Every flagged pair must truly have cosine >= threshold — verified
    against the exact pairwise computation on the raw vectors."""
    import numpy as np

    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.similarity.semdedup import semantic_dup_losers

    emb = load_table(spark, SF_SMOKE, "embeddings").filter(F.col("vec_id") < 200)
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    losers = semantic_dup_losers(emb, threshold=0.5, n_cells=4, rounds=1).collect()
    for r in losers:
        a, b = vecs[r.vec_id], vecs[r.dup_of]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= 0.5 - 1e-9, (r.vec_id, r.dup_of, cos)
        assert abs(cos - r.cosine) < 1e-5
        assert r.dup_of < r.vec_id


def test_semantic_dedup_survivor_join(spark):
    """semantic_dedup = corpus minus losers, min-id survivor kept."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.similarity.semdedup import (
        semantic_dedup,
        semantic_dup_losers,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    both = emb.unionByName(emb.withColumn("vec_id", F.col("vec_id") + 10_000_000))
    kwargs = dict(threshold=0.95, n_cells=8, rounds=1)
    kept = semantic_dedup(both, **kwargs)
    losers = semantic_dup_losers(both, **kwargs)
    assert kept.count() == both.count() - losers.count()
    assert kept.join(losers, "vec_id", "inner").count() == 0


def test_incremental_dedup_cross_corpus_truth(spark):
    """New-batch dedup against a reference corpus: cross-side LSH+verify
    must equal brute-force cross-side Jaccard truth at j>=0.9, flag no
    within-side pairs, and never drop a reference doc."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.dedup.incremental import (
        incremental_dedup,
        incremental_near_dup_losers,
    )
    from wrtd_etl_spark.dedup.minhash import shingles

    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    # new batch: fresh docs (odd ids) + near-clones of reference docs
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    clones = ref.withColumn("doc_id", F.col("doc_id") + 100000).withColumn(
        "text",
        F.concat_ws(" ", F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(1)))),
    )
    new = docs.filter(F.col("doc_id") % 2 == 1).unionByName(clones)

    losers = incremental_near_dup_losers(
        new, ref, "text", "doc_id", threshold=0.9
    ).collect()
    got = {(r.new_id, r.ref_id) for r in losers}
    got_new_ids = {r.new_id for r in losers}

    # brute-force cross-side truth
    a = new.select(F.col("doc_id").alias("new_id"), shingles(F.col("text")).alias("s1"))
    b = ref.select(F.col("doc_id").alias("ref_id"), shingles(F.col("text")).alias("s2"))
    inter = F.size(F.array_intersect("s1", "s2")).cast("double")
    union = (
        F.size("s1") + F.size("s2") - F.size(F.array_intersect("s1", "s2"))
    ).cast("double")
    truth_pairs = (
        a.crossJoin(b).withColumn("j", inter / union).filter(F.col("j") >= 0.9)
    )
    truth_new = {r.new_id for r in truth_pairs.select("new_id").distinct().collect()}
    truth_min_ref = {
        (r.new_id, r.ref_id)
        for r in truth_pairs.groupBy("new_id")
        .agg(F.min("ref_id").alias("ref_id"))
        .collect()
    }
    assert got_new_ids == truth_new  # exactly the true cross-side dups
    assert got == truth_min_ref  # smallest matching ref id reported

    kept = incremental_dedup(new, ref, "text", "doc_id", threshold=0.9)
    assert kept.count() == new.count() - len(got_new_ids)
    # reference side is never touched — only new-side ids are dropped
    assert all(i >= 100000 or i % 2 == 1 for i in got_new_ids)


def test_substring_dedup_flags_planted_boilerplate(spark):
    """Docs sharing a verbatim passage must be flagged at exactly the
    passage windows; a doc with unique text must show zero dup spans."""
    from wrtd_etl_spark.dedup.substring import (
        duplicated_spans,
        substring_dup_stats,
    )

    boiler = "all rights reserved contact the site admin for license terms"
    uniq = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliett",
        "kilo lima mike november oscar papa quebec romeo sierra tango",
        "uniform victor whiskey xray yankee zulu one two three four",
    ]
    rows = [
        (1, f"{uniq[0]} {boiler}"),
        (2, f"{boiler} {uniq[1]}"),
        (3, uniq[2]),  # no shared passage
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        r.doc_id: r
        for r in substring_dup_stats(
            df, "text", "doc_id", window=8, stride=1
        ).collect()
    }
    assert stats[1].n_dup_spans > 0 and stats[2].n_dup_spans > 0
    assert stats[3].n_dup_spans == 0
    # the flagged windows must actually BE the boilerplate: every flagged
    # span's window text appears in the shared passage region
    spans = duplicated_spans(df, "text", "doc_id", window=8, stride=1).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    toks1 = rows[0][1].lower().split()
    for pos in by_doc[1]:
        w = " ".join(toks1[pos - 1 : pos - 1 + 8])
        assert w in f"{boiler}" or any(
            t in boiler.split() for t in w.split()
        ), w
    # doc 3 contributes no flagged spans at all
    assert 3 not in by_doc


def test_corpus_mixture_caps_and_subsamples(spark):
    """Both mixture branches must bind on the testdata: over-weighted
    (even) sources hit the frac=1 cap with a real availability shortfall
    and pass through whole; under-weighted (odd) sources subsample below
    their availability with zero shortfall. Deterministic across runs."""
    rows = REGISTRY["corpus_mixture"].fn(spark, SF_SMOKE).collect()
    assert rows  # non-vacuous
    by_src = {r.source: r for r in rows}
    totals = {
        r.source: (r.n, r.toks)
        for r in REGISTRY["corpus_mixture"]
        .fn(spark, SF_SMOKE)
        .sparkSession.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("toks"),
        )
        .collect()
    }
    saw_cap = saw_sub = False
    for src, r in by_src.items():
        even = int(src[3:]) % 2 == 0
        n_all, _ = totals[src]
        if even:
            assert r.frac == 1.0 and r.shortfall > 0, (src, r)
            assert r.n_docs_kept == n_all  # cap keeps the whole source
            saw_cap = True
        else:
            assert r.frac < 1.0 and r.shortfall == 0.0, (src, r)
            assert r.n_docs_kept < n_all
            saw_sub = True
    assert saw_cap and saw_sub
    again = {
        (r.source, r.n_docs_kept, r.n_tokens_kept)
        for r in REGISTRY["corpus_mixture"].fn(spark, SF_SMOKE).collect()
    }
    assert again == {(r.source, r.n_docs_kept, r.n_tokens_kept) for r in rows}


def test_leakage_safe_split_clusters_co_travel(spark):
    """Every near-dup pair must land in ONE split, and the property must
    be non-vacuous: at least one pair exists that the doc-id hash split
    WOULD have separated (i.e. the cluster split actually changed an
    assignment)."""
    from wrtd_etl_spark.dedup.ngram import ngram_jaccard_pairs
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.plans.pipeline_queries import _NGRAM_MAX_DF

    split = {
        r.doc_id: (r.split, r.cluster_id)
        for r in REGISTRY["leakage_safe_split"].fn(spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=5, threshold=0.08, max_df=_NGRAM_MAX_DF
    ).collect()
    assert pairs  # the pair graph is non-empty on the testdata

    def doc_hash_split(i):
        b = (i * 2654435761) % 4294967296 % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    separated_by_doc_hash = 0
    for p in pairs:
        s1, c1 = split[p.id1]
        s2, c2 = split[p.id2]
        assert s1 == s2 and c1 == c2, (p.id1, p.id2)  # co-travel
        if doc_hash_split(p.id1) != doc_hash_split(p.id2):
            separated_by_doc_hash += 1
    assert separated_by_doc_hash > 0  # the operator made a difference
    # singleton docs keep the plain hash split (cluster_id == doc_id)
    clustered = {p.id1 for p in pairs} | {p.id2 for p in pairs}
    for d, (s, c) in split.items():
        if d not in clustered:
            assert c == d and s == doc_hash_split(d)


def test_sq8_quantized_topk_recall_and_rescore_exactness(spark):
    """SQ8 search must (a) recall nearly all brute-force neighbors with
    the default margin and (b) report EXACT cosine for every returned
    pair (the rescore contract: approximation affects candidate choice,
    never the reported similarity)."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.similarity.ann import brute_force_top_k
    from wrtd_etl_spark.similarity.quantized import quantized_top_k

    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    exact_rows = brute_force_top_k(emb, probes, k=5).collect()
    exact = {(r.probe_id, r.neighbor_id) for r in exact_rows}
    exact_sims = {(r.probe_id, r.neighbor_id): r.sim for r in exact_rows}
    got_rows = quantized_top_k(emb, probes, k=5).collect()
    got = {(r.probe_id, r.neighbor_id) for r in got_rows}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, f"SQ8 recall collapsed: {recall}"
    for r in got_rows:
        key = (r.probe_id, r.neighbor_id)
        if key in exact_sims:
            assert r.sim == exact_sims[key]  # bit-identical rescore


def test_sq8_quantization_error_bound(spark):
    """Dequantized values stay within half a quantization step of the
    original in every dimension (the int8 linear-map contract)."""
    import numpy as np

    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.similarity.quantized import quantize, train_scales

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(100)
    scales = train_scales(emb)
    assert len(scales) == 64
    rows = quantize(emb, scales).select("embedding", "qvec").collect()
    s = np.array(scales)
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        q = np.array(r.qvec, dtype=np.float64)
        assert np.all(np.abs(q * s - v) <= s * 0.5 + 1e-12)


def test_sq8_numpy_quantizer_matches_expression_codes(spark):
    """The in-batch numpy quantizer used by the search path must emit
    bit-identical codes to the quantize() expression (the persisted-index
    writer) — including the half-away-from-zero rounding rule."""
    import numpy as np

    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.similarity.quantized import (
        _np_quantize,
        quantize,
        train_scales,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    scales = train_scales(emb)
    rows = quantize(emb, scales).select("embedding", "qvec").collect()
    s = np.array(scales)
    V = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
    got = _np_quantize(V, s)
    want = np.stack([np.array(r.qvec, dtype=np.float64) for r in rows])
    assert np.array_equal(got, want)


def test_embedding_neardup_hot_bucket_cap_stays_subquadratic(spark):
    """Planted degenerate corpus: 1200 near-identical vectors share every
    band bucket (all sign bits equal), which before the cap made the band
    join enumerate ~720k pairs. The cap must drop those buckets whole —
    zero pairs among the flood — while a planted near-dup pair living in
    ordinary buckets still surfaces."""
    import numpy as np

    from wrtd_etl_spark.similarity.ann import embedding_near_dup_pairs

    rng = np.random.default_rng(11)
    base = rng.normal(size=64)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(1200):
        v = base + rng.normal(scale=1e-4, size=64)  # same sign pattern
        rows.append((i, [float(x) for x in v]))
    # planted cold pair: an unrelated direction and its tiny perturbation
    other = rng.normal(size=64)
    other /= np.linalg.norm(other)
    rows.append((500_000, [float(x) for x in other]))
    rows.append((500_001, [float(x) for x in other + 1e-4 * rng.normal(size=64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_dup_pairs(df, threshold=0.95, max_bucket=600)
    got = {(r.id1, r.id2) for r in pairs.collect()}
    assert not any(a < 1200 and b < 1200 for a, b in got), (
        "flood pairs must be dropped by the hot-bucket cap"
    )
    assert (500_000, 500_001) in got
    # raising the cap re-admits the flood (semantics, not a silent floor)
    n = embedding_near_dup_pairs(
        df, threshold=0.95, max_bucket=10_000
    ).count()
    assert n >= 1200 * 1199 // 2


def test_embedding_neardup_lsh_recall_vs_exact(spark):
    """Capped LSH must still find every exact-path pair on a clone
    corpus: each (orig, clone) pair has cosine 1.0 and identical band
    signatures, and the healthy-corpus buckets stay far below the cap."""
    from wrtd_etl_spark.catalog import load_table
    from wrtd_etl_spark.similarity.ann import embedding_near_dup_pairs

    emb = load_table(spark, SF_SMOKE, "embeddings").filter(
        F.col("vec_id") < 300
    )
    clones = emb.withColumn("vec_id", F.col("vec_id") + 10_000_000)
    both = emb.unionByName(clones)
    exact = {
        (r.id1, r.id2)
        for r in embedding_near_dup_pairs(
            both, threshold=0.95, exact=True
        ).collect()
    }
    approx = {
        (r.id1, r.id2)
        for r in embedding_near_dup_pairs(both, threshold=0.95).collect()
    }
    assert exact, "clone corpus must contain exact pairs"
    assert exact <= approx or len(exact & approx) / len(exact) >= 0.99


def test_decode_image_pixels_real_codec_via_spark(spark):
    """decode_image_pixels: REAL raster decode through mapInPandas —
    known pixels come back byte-exact, channel means match hand
    arithmetic, and a non-image payload NULLs out on the tolerant path
    but raises under strict=True."""
    from wrtd_etl_spark.multimodal.binary_ops import decode_image_pixels
    from wrtd_etl_spark.multimodal.png_codec import encode_png

    px = bytes([10, 20, 30, 40])  # gray 2x2
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_png(2, 2, 1, px)), None),
            (2, "image", bytearray(b"not a png"), None),
        ],
        "media_id long, media_type string, payload binary, "
        "meta map<string,string>",
    )
    rows = {r.media_id: r for r in decode_image_pixels(media).collect()}
    assert bytes(rows[1].raster) == px
    assert (rows[1].width, rows[1].height, rows[1].n_channels) == (2, 2, 1)
    assert rows[1].channel_means == [25.0]
    assert rows[2].raster is None and rows[2].width is None
    with pytest.raises(Exception):
        decode_image_pixels(media, strict=True).collect()


def test_attach_decode_resize_pipeline(spark, sf_dir=None):
    """attach_png_payload → decode_image_pixels(strict) → resize_images:
    every minted payload decodes (the query path's contract) and the
    4x4 thumbnails re-decode to 4x4 with the same channel count."""
    from wrtd_etl_spark.multimodal.binary_ops import (
        attach_png_payload,
        decode_image_pixels,
        resize_images,
    )
    from wrtd_etl_spark.multimodal.png_codec import decode_png

    docs = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(30)],
        "doc_id long, text string",
    )
    media = attach_png_payload(docs, "text", "doc_id")
    pixels = decode_image_pixels(media, strict=True)
    rows = pixels.collect()
    assert len(rows) == 30
    for r in rows:
        assert r.width == 8 + r.media_id % 9
        assert r.height == 8 + r.media_id % 7
        assert len(bytes(r.raster)) == r.width * r.height * r.n_channels
    thumbs = resize_images(pixels, 4, 4).collect()
    for t in thumbs:
        w, h, ch, raster = decode_png(bytes(t.payload))
        assert (w, h) == (4, 4) and len(raster) == 16 * ch


def test_extract_image_features_real_pixels(spark):
    """26-float real feature vector: histogram mass sums to 1, channel
    means match hand arithmetic, aspect/channel markers land, and a
    non-image payload NULLs (tolerant) or raises (strict)."""
    from wrtd_etl_spark.multimodal.binary_ops import extract_image_features
    from wrtd_etl_spark.multimodal.png_codec import encode_png

    px = bytes([0, 0, 255, 255])  # gray 2x2: two black, two white
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_png(2, 2, 1, px)), None),
            (2, "image", bytearray(b"nope"), None),
        ],
        "media_id long, media_type string, payload binary, "
        "meta map<string,string>",
    )
    rows = {r.media_id: r for r in extract_image_features(media).collect()}
    f = rows[1].feature
    assert len(f) == 26
    hist, means, stds, aspect, chn = f[:16], f[16:20], f[20:24], f[24], f[25]
    assert abs(sum(hist) - 1.0) < 1e-6
    assert abs(hist[0] - 0.5) < 1e-6 and abs(hist[15] - 0.5) < 1e-6
    assert abs(means[0] - 0.5) < 1e-3 and means[1] == 0.0
    assert abs(stds[0] - 0.5) < 1e-3
    assert aspect == 1.0 and abs(chn - 0.25) < 1e-6
    assert rows[2].feature is None
    import pytest as _pytest

    with _pytest.raises(Exception):
        extract_image_features(media, strict=True).collect()
