"""Training-data pipeline queries: text analysis, dedup, similarity,
multimodal — the north-star extensions (BASELINE.json) over the
``documents`` and ``embeddings`` tables.

Oracle discipline matches testdata_queries: identical fixed-order IEEE
arithmetic on both sides; cosines quantized to 1e-6 via the exact integer
idiom before ranking/thresholding; regexes valid in both Java regex and
RE2. MinHash/SimHash/LSH queries have no SQL oracle (hash functions differ
per engine) — they get rows-only checks here and property tests against
brute-force ground truth in tests/test_pipeline_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import hash32 as _h32
from ..catalog import load_table, spread
from ..dedup.exact import exact_dup_groups
from ..dedup.minhash import minhash_near_dup_pairs
from ..dedup.ngram import ngram_jaccard_pairs
from ..dedup.simhash import simhash_near_dup_pairs
from ..functions import text as TX
from ..multimodal.binary_ops import attach_binary_payload, payload_metadata
from ..similarity.ann import brute_force_top_k, embedding_near_dup_pairs, lsh_top_k
from .registry import register

# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------



def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with guaranteed scan parallelism.

    Every consumer below runs CPU-heavy per-document expressions (regex
    token/lang/quality passes, md5 fingerprints, chunk explosion, binary
    codecs), so the gated :func:`~wrtd_etl_spark.catalog.spread` pays for
    itself: a no-op on a real multi-split scan, full-core parallelism when
    the testdata is one parquet row group (which otherwise serializes the
    whole scan stage on one core)."""
    return spread(load_table(spark, sf_dir, "documents"))


@register(
    "doc_token_stats",
    r"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
           len(regexp_extract_all(text, '([A-Za-z0-9_]+|[^\sA-Za-z0-9_])', 1)) AS n_bpe_tokens,
           len(text) AS n_chars_actual
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex (north-star text ops)."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


@register(
    "doc_lang_id",
    f"""
    SELECT doc_id,
           {TX.stopword_hits_sql("text", "en")} AS en_hits,
           {TX.stopword_hits_sql("text", "es")} AS es_hits,
           {TX.lang_id_sql("text")} AS predicted_lang
    FROM documents
    """,
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID heuristic."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        TX.stopword_hits(F.col("text"), "en").alias("en_hits"),
        TX.stopword_hits(F.col("text"), "es").alias("es_hits"),
        TX.lang_id(F.col("text")).alias("predicted_lang"),
    )


@register(
    "doc_quality",
    rf"""
    SELECT doc_id, {TX.quality_score_sql("text")} AS quality,
           1.0 - len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
                 / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
               AS dup_token_ratio
    FROM documents
    """,
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (length/stopword/punctuation ratios) plus
    the repetition signal: share of tokens that are repeats of an earlier
    token (boilerplate / degenerate-generation filter)."""
    docs = _docs(spark, sf_dir)
    toks = TX.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        TX.quality_score(F.col("text")).alias("quality"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(toks)) / F.size(toks).cast("double")
        ).alias("dup_token_ratio"),
    )


@register(
    "doc_fingerprint",
    f"""
    SELECT doc_id, {TX.FINGERPRINT_SQL.format(expr="text")} AS fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-text md5 fingerprint (the exact-dedup key)."""
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------


@register(
    "dedup_exact_groups",
    f"""
    SELECT {TX.FINGERPRINT_SQL.format(expr="text")} AS fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS cnt
    FROM documents
    GROUP BY fp
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: hash-groupBy on the fingerprint (1 shuffle)."""
    docs = _docs(spark, sf_dir)
    return exact_dup_groups(docs, "text", "doc_id")


# Document-frequency pruning is load-bearing at scale: this corpus has a
# ~30-word vocabulary, so most 5-grams occur in most documents and the
# unpruned postings self-join is quadratic (measured: 416 s at sf0.1 vs
# seconds with max_df). Near-duplicate pairs share their RARE grams, so
# pruning common grams keeps recall while bounding the join.
_NGRAM_MAX_DF = 50

_NGRAM_ORACLE = rf"""
    WITH grams AS (
        SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id,
                   substr(lower(text),
                          CAST(unnest(range(1, greatest(len(text)-4, 1)+1)) AS INT),
                          5) AS g
            FROM documents)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
    ), gram_df AS (
        SELECT g, COUNT(*) AS df FROM grams GROUP BY g
    ), pruned AS (
        SELECT grams.doc_id, grams.g
        FROM grams JOIN gram_df USING (g) WHERE df <= {_NGRAM_MAX_DF}
    ), shared AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS shared
        FROM pruned a JOIN pruned b USING (g)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id1, id2, shared,
           CAST(shared AS DOUBLE) / CAST(s1.sz + s2.sz - shared AS DOUBLE) AS jaccard
    FROM shared
    JOIN sizes s1 ON s1.doc_id = id1
    JOIN sizes s2 ON s2.doc_id = id2
    WHERE CAST(shared AS DOUBLE) / CAST(s1.sz + s2.sz - shared AS DOUBLE) >= 0.08
"""


# Session-scoped cache of the deterministic n-gram pair graph and its CC
# labels: dedup_ngram_jaccard / dedup_clusters / dedup_apply /
# leakage_safe_split all consume the IDENTICAL subgraph, and the pair
# generation + closure dominated their cost when several ran in one
# session (VERDICT r3 ask #6 measured ~3 s of repeat work). Keyed by
# (application, sf_dir, params); values are LAZY localCheckpoints, so
# nothing materializes until a query actually runs, and memory is one
# tiny pair table + one label row per clustered doc. Oracles are
# unaffected — the cache changes when plans run, never what they compute.
_DEDUP_GRAPH_CACHE: dict[tuple, DataFrame] = {}


def _dedup_graph_key(spark: SparkSession, sf_dir: str, what: str) -> tuple:
    return (
        spark.sparkContext.applicationId,
        sf_dir,
        what,
        5,
        0.08,
        _NGRAM_MAX_DF,
    )


def _cached_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = _dedup_graph_key(spark, sf_dir, "pairs")
    if key not in _DEDUP_GRAPH_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        _DEDUP_GRAPH_CACHE[key] = ngram_jaccard_pairs(
            docs, "text", "doc_id", n=5, threshold=0.08, max_df=_NGRAM_MAX_DF
        ).localCheckpoint(eager=False)
    return _DEDUP_GRAPH_CACHE[key]


def _cached_cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..dedup.clusters import connected_components

    key = _dedup_graph_key(spark, sf_dir, "labels")
    if key not in _DEDUP_GRAPH_CACHE:
        _DEDUP_GRAPH_CACHE[key] = connected_components(
            _cached_ngram_pairs(spark, sf_dir), "id1", "id2"
        ).localCheckpoint(eager=False)
    return _DEDUP_GRAPH_CACHE[key]


@register("dedup_ngram_jaccard", _NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard similarity join (inverted index with
    document-frequency pruning — the inverted-index shape that survives
    100 TB; Jaccard is computed over full gram sets, shared counts over
    pruned postings, identically on both sides)."""
    return _cached_ngram_pairs(spark, sf_dir)


# Transitive closure of the near-dup pair graph. The oracle runs the same
# closure as a recursive CTE (reach = all nodes reachable from each node,
# label = min reachable id) — DuckDB-feasible because near-dup components
# are tiny; the Spark side converges by hash-min label propagation (see
# dedup/clusters.py for the iteration and its sum-certificate).
_CLUSTERS_ORACLE = rf"""
    WITH RECURSIVE pairs AS ({_NGRAM_ORACLE}
    ), edges AS (
        SELECT id1 AS a, id2 AS b FROM pairs
        UNION ALL
        SELECT id2, id1 FROM pairs
    ), reach(node, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
    ), labels AS (
        SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
    FROM labels
"""


@register("dedup_clusters", _CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the (deterministic)
    n-gram Jaccard pair graph, labels = min doc_id per component."""
    from ..dedup.clusters import cluster_sizes

    return cluster_sizes(_cached_cc_labels(spark, sf_dir))


# Survivors = min-id per exact-dup group AND per near-dup cluster + every
# untouched doc. BOTH layers matter: identical documents share ALL their
# n-grams, so document-frequency pruning removes heavy boilerplate from
# the pair graph — exact dedup is what catches it (the standard pipeline
# layering: exact first, then near-dup). The oracle reuses the
# recursive-CTE closure and unions both loser sets.
_DEDUP_APPLY_ORACLE = rf"""
    WITH RECURSIVE pairs AS ({_NGRAM_ORACLE}
    ), edges AS (
        SELECT id1 AS a, id2 AS b FROM pairs
        UNION ALL
        SELECT id2, id1 FROM pairs
    ), reach(node, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
    ), near_losers AS (
        SELECT node AS doc_id FROM reach GROUP BY node
        HAVING node <> MIN(r)
    ), exact_losers AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                   MIN(doc_id) OVER (
                       PARTITION BY {TX.FINGERPRINT_SQL.format(expr="text")}
                   ) AS keep_id
            FROM documents WHERE text IS NOT NULL)
        WHERE doc_id <> keep_id
    ), losers AS (
        SELECT doc_id FROM near_losers UNION SELECT doc_id FROM exact_losers
    )
    SELECT d.lang AS lang, COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
    FROM documents d
    LEFT JOIN losers l ON d.doc_id = l.doc_id
    WHERE l.doc_id IS NULL
    GROUP BY d.lang ORDER BY d.lang
"""


@register("dedup_apply", _DEDUP_APPLY_ORACLE)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step users actually run: dedup APPLIED to the corpus — exact
    duplicates collapse to their min-id survivor, near-dup clusters keep
    their min-id survivor, everything untouched passes through; report
    the surviving corpus per language.

    Exact-before-near layering is load-bearing: identical docs share all
    n-grams, so df-pruning hides boilerplate from the near-dup pair graph
    — only the fingerprint layer catches it (tested with an 80%-clone
    corpus in tests/test_pipeline_queries.py).

    Scale shape: the loser sets scale with the corpus DUPLICATE RATE
    (tens of percent on real crawls), so the anti-join strategy is left
    to AQE — broadcast when the set fits, shuffled hash join when it
    doesn't. Forcing a broadcast here would OOM exactly when dedup
    matters most."""
    from ..dedup.exact import exact_dup_groups

    docs = load_table(spark, sf_dir, "documents")
    # The pair graph + closure come from the session cache (one
    # materialization serves dedup_ngram_jaccard / dedup_clusters /
    # leakage_safe_split / this query; the localCheckpoint also keeps
    # both directions of the CC edge union on one physical subtree).
    labels = _cached_cc_labels(spark, sf_dir)
    near_losers = labels.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    # NULL-text docs have no fingerprint and are never exact-dup losers —
    # made explicit here AND in the oracle (WHERE text IS NOT NULL) so the
    # two engines can't diverge on NULL grouping: Spark's equi-join drops
    # NULL fingerprints while SQL's PARTITION BY groups them together.
    nn = docs.filter(F.col("text").isNotNull())
    exact_losers = (
        nn.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))
        .join(
            exact_dup_groups(nn, "text", "doc_id").select("fp", "keep_id"),
            "fp",
        )
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    losers = near_losers.unionByName(exact_losers).distinct()
    return (
        docs.join(losers, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


@register("dedup_minhash", None)  # hash fns engine-specific → rows-only
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (verified vs brute force in tests)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(docs, "text", "doc_id", threshold=0.5)


@register("dedup_simhash", None)  # hash fns engine-specific → rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded Hamming near-dup pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, "text", "doc_id", max_distance=3)


# cosine with per-vector precomputed squared norms (nn) — matches the
# engine's op order exactly: dot / sqrt(nn_a * nn_b), quantized to 1e-6
_DOT_SQL = "list_sum(list_transform(list_zip({a}, {b}), x -> x[1]*x[2]))"
_NN_SQL = "list_sum(list_transform(list_zip(e, e), x -> x[1]*x[2]))"
_QCOS_SQL = (
    "floor((" + _DOT_SQL + " / sqrt({na} * {nb})) * 1000000 + 0.5) / 1000000.0"
)


@register(
    "embedding_neardup",
    f"""
    WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings WHERE vec_id < 500),
    v AS (SELECT vec_id, e, {_NN_SQL} AS nn FROM v0)
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           {_QCOS_SQL.format(a="a.e", b="b.e", na="a.nn", nb="b.nn")} AS sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_QCOS_SQL.format(a="a.e", b="b.e", na="a.nn", nb="b.nn")} >= 0.35
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs — the EXACT O(n²) baseline, bounded
    to a fixed 500-vector slice (covers the whole corpus at the sf0.01
    correctness gate). The full-corpus scale path is the LSH variant
    below; an unbounded brute force is exactly what must not ship."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return embedding_near_dup_pairs(emb, threshold=0.35, exact=True)


@register("embedding_neardup_lsh", None)  # plane hashes engine-specific
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH near-dup (the 100 TB path).

    The synthetic embeddings have no true near-dups, so the corpus is
    unioned with deterministic clones (vec_id + 10_000_000): every clone
    pair has cosine 1.0 and MUST surface through the LSH bands — making
    the rows-only check meaningful (≥ one pair per original vector)."""
    emb = load_table(spark, sf_dir, "embeddings")
    clones = emb.withColumn("vec_id", F.col("vec_id") + 10_000_000)
    return embedding_near_dup_pairs(
        emb.unionByName(clones), threshold=0.95, exact=False
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


@register(
    "ann_cosine_topk",
    f"""
    WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    v AS (SELECT vec_id, e, {_NN_SQL} AS nn FROM v0),
    scored AS (
        SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
               {_QCOS_SQL.format(a="p.e", b="c.e", na="p.nn", nb="c.nn")} AS sim
        FROM v p JOIN v c ON c.vec_id <> p.vec_id
        WHERE p.vec_id < 10
    ), ranked AS (
        SELECT probe_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT probe_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a probe set (exact ANN baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return brute_force_top_k(emb, probes, k=5)


@register("ann_lsh_topk", None)  # plane hashes engine-specific → rows-only
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH candidate generation + exact rerank (scale path)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return lsh_top_k(emb, probes, k=5)


@register("ann_ivf_topk", None)  # centroid choice engine-specific → rows-only
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized ANN (cells + nprobe fan-out + exact rerank) —
    the second scale path next to LSH; recall-tested vs brute force."""
    from ..similarity.ivf import ivf_top_k

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return ivf_top_k(emb, probes, k=5)


@register("ann_ivf_kmeans_topk", None)  # float centroid training → rows-only
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with k-means-trained coarse centroids (Lloyd rounds over the
    corpus, see similarity/kmeans.py) — the production IVF shape: trained
    cells even out sizes and raise recall at the same nprobe."""
    from ..similarity.ivf import ivf_top_k
    from ..similarity.kmeans import train_centroids_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    cents = train_centroids_kmeans(emb, rounds=2)
    return ivf_top_k(emb, probes, k=5, centroids=cents)


# --------------------------------------------------------------------------
# Multimodal plumbing
# --------------------------------------------------------------------------


@register(
    "multimodal_meta",
    """
    SELECT doc_id AS media_id,
           'image' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata — JVM-only path over opaque bytes."""
    docs = _docs(spark, sf_dir)
    media = attach_binary_payload(docs, "text", "doc_id")
    return payload_metadata(media)


@register("embedding_clusters", None)  # float centroid training → rows-only
def embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster report over the embedding corpus: per-cell size and
    quantized mean within-cell cosine-to-centroid (the cluster-quality
    readout of the trained IVF index). Rows-only (float centroid math);
    balance/determinism pinned in the kmeans pytest."""
    from ..similarity.ivf import _assign_cells
    from ..similarity.kmeans import train_centroids_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids_kmeans(emb, rounds=2)
    assigned = _assign_cells(emb, "embedding", "vec_id", cents, nprobe=1)
    return (
        assigned.groupBy("cell")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("cell")
    )


@register("semantic_dedup", None)  # float centroid training → rows-only
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup removal: k-means cells + within-cell
    cosine pruning (similarity/semdedup.py; arXiv:2303.09540). Catches
    paraphrase-level duplicates that share no surface n-grams.

    The synthetic embeddings have no true semantic dups, so the corpus is
    unioned with deterministic clones (vec_id + 10_000_000): every clone
    lands in its original's cell (identical vector → identical argmax) and
    MUST be flagged with dup_of = the original — the rows-only check is
    ≥ one loser per original vector, pinned exactly in pytest.

    Centroids are trained on the ORIGINAL corpus and reused for the
    clone-augmented pruning pass (the train-once/reuse pattern the module
    documents): clones are identical vectors, so they cannot shift the
    density the cells should reflect — and the training pass runs on half
    the rows."""
    from ..similarity.kmeans import train_centroids_kmeans
    from ..similarity.semdedup import semantic_dup_losers

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids_kmeans(emb, n_cells=16, rounds=2)
    clones = emb.withColumn("vec_id", F.col("vec_id") + 10_000_000)
    return semantic_dup_losers(
        emb.unionByName(clones), threshold=0.95, centroids=cents
    ).orderBy("vec_id")


@register("multimodal_decode", None)  # binary raster decode → rows-only
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched REAL image decode (r10): deterministic PNG
    payloads minted from the docs (stdlib encoder) run through the
    stdlib raster codec — genuine pixels, per-channel means, and a
    nearest-neighbor thumbnail pass, all executor-side
    (multimodal/png_codec.py; Pillow remains the fast path where
    installed)."""
    from ..multimodal.binary_ops import (
        attach_png_payload,
        decode_image_pixels,
        resize_images,
    )

    docs = _docs(spark, sf_dir)
    media = attach_png_payload(docs, "text", "doc_id")
    pixels = decode_image_pixels(media, strict=True)
    # resize passes the decode metadata through, so the whole mint →
    # decode → thumbnail chain is ONE linear pipeline (no join back)
    thumbs = resize_images(
        pixels.withColumn("src_w", F.col("width")).withColumn(
            "src_h", F.col("height")
        ),
        4,
        4,
    )
    return thumbs.select(
        "media_id",
        F.col("src_w").alias("width"),
        F.col("src_h").alias("height"),
        "n_channels",
        F.round(F.element_at("channel_means", 1), 4).alias("mean_c0"),
        F.sha2(F.col("payload"), 256).alias("thumb_sha"),
    ).orderBy("media_id")


# --------------------------------------------------------------------------
# Dataset assembly: deterministic splits + the composite prepare step
# --------------------------------------------------------------------------

# Knuth multiplicative hash on the id — engine-portable (pure integer
# arithmetic), uniform, and stable across runs/engines; rand()/hash()
# differ per engine and per task retry.
_SPLIT_SQL = "((doc_id * 2654435761) % 4294967296) % 100"


@register(
    "dataset_split",
    f"""
    SELECT CASE WHEN {_SPLIT_SQL} < 80 THEN 'train'
                WHEN {_SPLIT_SQL} < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY split ORDER BY split
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split via multiplicative
    hashing of the id — reproducible across engines, runs and retries
    (unlike rand()-based sampling)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _h32(F.col("doc_id")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.groupBy(split.alias("split"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split")
    )


@register(
    "training_corpus",
    f"""
    WITH scored AS (
        SELECT doc_id, lang, n_chars,
               {TX.quality_score_sql("text")} AS quality,
               {TX.FINGERPRINT_SQL.format(expr="text")} AS fp
        FROM documents
    ), deduped AS (
        SELECT * FROM scored
        WHERE quality >= 0.1
          AND doc_id IN (SELECT MIN(doc_id) FROM scored GROUP BY fp)
    )
    SELECT lang,
           CASE WHEN {_SPLIT_SQL} < 80 THEN 'train'
                WHEN {_SPLIT_SQL} < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM deduped
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite prepare-training-data step: quality filter → exact
    dedup (min-id survivor) → deterministic split → per-(lang, split)
    accounting. One declarative plan; Catalyst fuses the scoring with the
    scan and the dedup is the one hash shuffle."""
    from ..dedup.exact import exact_dedup

    docs = _docs(spark, sf_dir)
    # Threshold calibrated to the synthetic corpus: its ~30-word vocabulary
    # scores quality in [0.02, 0.20] (no English stopwords, sparse
    # punctuation), so 0.1 ≈ the median — a real filter that keeps a
    # non-trivial corpus instead of the vacuous 0.5 gate.
    scored = docs.withColumn("quality", TX.quality_score(F.col("text")))
    deduped = exact_dedup(scored, "text", "doc_id").filter(F.col("quality") >= 0.1)
    bucket = _h32(F.col("doc_id")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        deduped.groupBy("lang", split.alias("split"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang", "split")
    )


@register(
    "doc_chunks",
    r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(unnest(range(0, (len(t) + 63) // 64)) AS BIGINT) AS chunk_idx,
           array_to_string(t[(unnest(range(0, (len(t) + 63) // 64)) * 64 + 1):
                             (unnest(range(0, (len(t) + 63) // 64)) * 64 + 64)],
                           ' ') AS chunk_text
    FROM toks
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into 64-token chunks
    (the LLM-training prep step) — pure array expressions, one explode,
    no UDF; chunk count = ceil(n_tokens/64)."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = F.ceil(F.size(toks) / 64).cast("int")
    return (
        docs.select(
            "doc_id",
            toks.alias("t"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(F.col("t"), F.col("chunk_idx") * 64 + 1, 64)).alias(
                "chunk_text"
            ),
        )
    )


@register(
    "stratified_sample",
    f"""
    SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
    FROM documents
    WHERE {_SPLIT_SQL} < 20
    GROUP BY lang ORDER BY lang
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% per-stratum sample via the same multiplicative
    hash as dataset_split — reproducible, no rand(), survives retries."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _h32(F.col("doc_id")) % 100
    return (
        docs.filter(bucket < 20)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.sum("n_chars").alias("sampled_chars"))
        .orderBy("lang")
    )


_SOURCE_CAP = 15


@register(
    "per_source_cap",
    f"""
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY ((doc_id * 2654435761) % 4294967296), doc_id
               ) AS rn
        FROM documents
    )
    SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM ranked WHERE rn <= {_SOURCE_CAP}
    GROUP BY source ORDER BY source
    """,
)
def per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the domain-balancing primitive of corpus
    assembly (no single crawl domain may dominate the mix). Keeps at most
    ``_SOURCE_CAP`` docs per source, chosen by the deterministic
    multiplicative-hash order rather than doc_id order, so the cap is an
    unbiased-ish sample yet reproducible across engines and retries.

    Scale shape: one hash exchange on ``source`` + a partition-local sort;
    rank truncation prunes before the aggregate. At 100 TB per-source row
    counts are large but the window never materializes beyond each
    partition's sort run — no global window, no skew beyond the source-key
    distribution itself (a pathologically hot source is exactly what the
    cap removes)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    k = _h32(F.col("doc_id"))
    w = Window.partitionBy("source").orderBy(k.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SOURCE_CAP)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("source")
    )


_BIGRAM_TOP = 50


@register(
    "bigram_counts",
    rf"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents
    ), pairs AS (
        SELECT t[i] || ' ' || t[i+1] AS bigram
        FROM toks, unnest(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM pairs GROUP BY bigram
    ORDER BY cnt DESC, bigram LIMIT {_BIGRAM_TOP}
    """,
)
def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token pair counts — the BPE-merge-training primitive (the
    highest-count pair is the next merge rule) and the unit of n-gram LM
    estimation.

    Scale shape: pairs are built by zipping the token array with its own
    tail INSIDE the scan projection (no self-join, no window over raw
    tokens), then one partial-aggregating groupBy on the pair and a
    TakeOrdered top-k — the same single-exchange profile as corpus_vocab.
    """
    docs = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.filter(F.size(toks) >= 2)
        .select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(_BIGRAM_TOP)
    )


# Synthetic-PII injection keeps the redaction query NON-vacuous on this
# corpus (the generated texts contain no real PII): every doc gets a
# deterministic email + phone derived from doc_id, then the scrubber must
# remove them — the oracle checks hit counts AND the redacted-text md5, so
# an over- or under-matching pattern fails the hash, not just the count.
_PII_ORACLE = rf"""
    WITH dirty AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com tel +1 415 555 '
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS d
        FROM documents
    )
    SELECT doc_id,
           {{email_hits}} AS email_hits,
           {{phone_hits}} AS phone_hits,
           md5({{redacted}}) AS redacted_fp
    FROM dirty
"""


def _pii_oracle() -> str:
    from ..functions.text import pii_hits_sql, redact_pii_sql

    return _PII_ORACLE.format(
        email_hits=pii_hits_sql("d", "EMAIL"),
        phone_hits=pii_hits_sql("d", "PHONE"),
        redacted=redact_pii_sql("d"),
    )


@register("pii_redaction", _pii_oracle())
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus: chained regexp_replace per PII class
    (email/SSN/IPv4/phone, specific-before-general rule order) — a pure
    scan-stage projection, zero shuffle at any scale."""
    docs = _docs(spark, sf_dir)
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com tel +1 415 555 "),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select(
        "doc_id",
        TX.pii_hits(dirty, "EMAIL").alias("email_hits"),
        TX.pii_hits(dirty, "PHONE").alias("phone_hits"),
        F.md5(F.encode(TX.redact_pii(dirty), "UTF-8")).alias("redacted_fp"),
    )


_VOCAB_TOP = 50


@register(
    "corpus_vocab",
    rf"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(
            regexp_split_to_array(lower(trim(text)), '\s+')
        ) AS token
        FROM documents
    )
    SELECT token, COUNT(*) AS doc_freq
    FROM toks GROUP BY token
    ORDER BY doc_freq DESC, token ASC
    LIMIT {_VOCAB_TOP}
    """,
)
def corpus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary by document frequency (top-{_VOCAB_TOP}, ties by
    token for determinism).

    Scale shape: distinct tokens come from ``array_distinct`` per doc
    BEFORE the explode (a scan-stage projection — the per-doc dedup never
    shuffles), then one partial-aggregating groupBy on token and a
    TakeOrdered top-k instead of a global sort. This is the vocabulary /
    document-frequency pass every tokenizer-training and df-pruning step
    needs over a 100 TB corpus."""
    docs = _docs(spark, sf_dir)
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    return (
        docs.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("token"))
        .limit(_VOCAB_TOP)
    )


# --------------------------------------------------------------------------
# Contamination + context packing (training-corpus hygiene at scale)
# --------------------------------------------------------------------------

# first-N-token prefix fingerprint: the standard weaker contamination key —
# exact-duplicate fps miss near-verbatim leakage that shares an opening
_PREFIX_N = 8
_PREFIX_FP_SQL = (
    r"md5(array_to_string(list_slice("
    r"regexp_split_to_array(lower(trim({expr})), '\s+'), 1, "
    + str(_PREFIX_N)
    + r"), ' '))"
)


def _prefix_fp(col: Column) -> Column:
    return F.md5(
        F.encode(
            F.concat_ws(
                " ",
                F.slice(F.split(F.lower(F.trim(col)), r"\s+"), 1, _PREFIX_N),
            ),
            "UTF-8",
        )
    )


@register(
    "contamination_check",
    f"""
    WITH fp AS (
        SELECT doc_id, {_PREFIX_FP_SQL.format(expr="text")} AS fp,
               CASE WHEN {_SPLIT_SQL} < 80 THEN 'train'
                    WHEN {_SPLIT_SQL} < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT t.doc_id AS test_doc_id, MIN(tr.doc_id) AS train_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_train_hits
    FROM fp t JOIN fp tr ON t.fp = tr.fp
    WHERE t.split = 'test' AND tr.split = 'train'
    GROUP BY t.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test leakage scan: test-split docs whose first-{N}-token
    prefix fingerprint also appears in the train split.

    Scale shape: ONE equi-join on a 128-bit hash key (uniform, no skew),
    both sides pruned to (doc_id, fp) before the exchange — the same
    linear-cost layout as exact dedup. The split is the engine's own
    deterministic multiplicative-hash split (dataset_split), so the check
    composes with it at any SF.
    """
    docs = _docs(spark, sf_dir)
    bucket = _h32(F.col("doc_id")) % 100
    fp = docs.select(
        "doc_id",
        _prefix_fp(F.col("text")).alias("fp"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    test = fp.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_doc_id"), "fp"
    )
    train = fp.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc_id"), "fp"
    )
    return (
        test.join(train, "fp")
        .groupBy("test_doc_id")
        .agg(
            F.min("train_doc_id").alias("train_doc_id"),
            F.count("*").alias("n_train_hits"),
        )
    )


_PACK_BUDGET = 4096  # tokens per context window
_PACK_BUCKETS = 64
# shuffle key: same multiplicative hash (full 32-bit range, not mod 100);
# bucket = key DIV (2^32 / buckets) is MONOTONE in key → valid range bucket
_SHUFFLE_KEY_SQL = "((doc_id * 2654435761) % 4294967296)"


@register(
    "context_packing",
    f"""
    WITH t AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               {_SHUFFLE_KEY_SQL} AS k
        FROM documents
    ), c AS (
        SELECT doc_id, n_tokens,
               CAST(SUM(n_tokens) OVER (ORDER BY k, doc_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM t
    )
    SELECT CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS window_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM c
    GROUP BY window_id
    ORDER BY window_id
    """,
)
def context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the (deterministically shuffled) corpus into fixed token-budget
    context windows: window_id = exclusive-prefix-sum DIV budget.

    The shuffle order is the same multiplicative hash as dataset_split —
    a reproducible global training order with no rand(). The running sum
    uses the two-pass distributed prefix sum (operators/prefix_sum.py):
    a naive ``SUM OVER (ORDER BY ...)`` with no partition collapses 100 TB
    onto one window task; here the fact table only exchanges on a range
    bucket that is arithmetic on the key (no sampling pass needed).
    """
    from ..operators.prefix_sum import distributed_cumsum

    docs = _docs(spark, sf_dir)
    t = docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        (_h32(F.col("doc_id"))).alias("k"),
    ).withColumn("b", (F.col("k") / F.lit(4294967296 // _PACK_BUCKETS)).cast("long"))
    c = distributed_cumsum(
        t, "n_tokens", order_cols=["k", "doc_id"], bucket_col="b", out_col="cum"
    )
    return (
        c.groupBy(
            # floor-div (values are non-negative; DuckDB's // is the twin —
            # a double division + CAST would ROUND there and truncate here)
            F.floor((F.col("cum") - F.col("n_tokens")) / _PACK_BUDGET)
            .cast("long")
            .alias("window_id")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("window_id")
    )


# --------------------------------------------------------------------------
# Corpus hygiene, round 2: repetition signals, salient terms, edit-distance
# verification, quality-weighted sampling (Gopher/C4-style filter stages a
# production training-data pipeline runs between dedup and packing)
# --------------------------------------------------------------------------

# Gopher-style repetition gates (Rae et al. 2021 §A1.1 use a family of
# duplicate-fraction thresholds; these two are the word/bigram members)
_REP_WORD_MAX = 0.20
_REP_BIGRAM_MAX = 0.18


@register(
    "doc_repetition",
    rf"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents WHERE text IS NOT NULL
    ), words AS (
        SELECT doc_id, unnest(t) AS w FROM toks
    ), wc AS (
        SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
    ), wstat AS (
        SELECT doc_id, MAX(c) AS max_c, SUM(c) AS tot FROM wc GROUP BY doc_id
    ), pairs AS (
        SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
        FROM toks, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2
    ), bc AS (
        SELECT doc_id, bg, COUNT(*) AS c FROM pairs GROUP BY doc_id, bg
    ), bstat AS (
        SELECT doc_id, MAX(c) AS max_b, SUM(c) AS btot FROM bc GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(w.max_c AS DOUBLE) / w.tot AS top_word_frac,
           CAST(COALESCE(b.max_b, 0) AS DOUBLE) / COALESCE(b.btot, 1)
               AS top_bigram_frac,
           (CAST(w.max_c AS DOUBLE) / w.tot > {_REP_WORD_MAX}
            OR CAST(COALESCE(b.max_b, 0) AS DOUBLE) / COALESCE(b.btot, 1)
               > {_REP_BIGRAM_MAX}) AS repetitive
    FROM wstat w LEFT JOIN bstat b USING (doc_id)
    ORDER BY w.doc_id
    """,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition ratios: most-frequent-word fraction and
    most-frequent-bigram fraction, plus the Gopher-style gate flag.

    Scale shape: ZERO shuffles for the stats — where the obvious plan
    (explode → two keyed aggregations, the oracle's shape) exchanges the
    full token stream twice, this one never leaves the scan projection:
    sort the token array per doc, find run starts with a higher-order
    ``filter`` over the index sequence, and the max run length (= the top
    term's count) is the max gap between consecutive starts. The whole
    query is scan → project; the only exchange is the driver-facing
    ORDER BY, droppable at scale.

    The sorted arrays are materialized in their own ``select`` — see the
    :func:`~wrtd_etl_spark.functions.text.sorted_runs` contract (an
    inline sort inside the HOF lambdas re-executes per element: 117×).
    """
    docs = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")

    def max_run(sorted_arr: Column) -> Column:
        return F.array_max(
            F.transform(TX.sorted_runs(sorted_arr), lambda r: r["cnt"])
        )

    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    pre = docs.select(
        "doc_id",
        F.size(toks).alias("n_t"),
        F.size(bigrams).alias("n_b"),
        F.array_sort(toks).alias("s_t"),
        F.array_sort(bigrams).alias("s_b"),
    )
    stats = pre.select(
        "doc_id",
        (max_run(F.col("s_t")).cast("double") / F.col("n_t")).alias(
            "top_word_frac"
        ),
        F.when(
            F.col("n_b") >= 1,
            max_run(F.col("s_b")).cast("double") / F.col("n_b"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )
    return stats.withColumn(
        "repetitive",
        (F.col("top_word_frac") > _REP_WORD_MAX)
        | (F.col("top_bigram_frac") > _REP_BIGRAM_MAX),
    ).orderBy("doc_id")


@register(
    "doc_tfidf_topk",
    r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
        FROM documents WHERE text IS NOT NULL
    ), tfc AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(t) AS term FROM toks)
        GROUP BY doc_id, term
    ), dfc AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM (SELECT DISTINCT doc_id, unnest(t) AS term FROM toks)
        GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM toks),
    scored AS (
        SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
               CAST(tfc.tf AS DOUBLE) * n.n_docs / CAST(dfc.df AS DOUBLE)
                   AS score
        FROM tfc JOIN dfc USING (term), n
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
        FROM scored
    )
    SELECT doc_id, term, tf, df, score, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk
    """,
)
def doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document by tf-idf-style score.

    The score is ``tf * N / df`` — idf WITHOUT the log. Deliberate: both
    engines compute ``ln`` in libm with 1-ulp freedom, so a log-based
    score could flip a rank between engines; ``tf * N / df`` is two IEEE
    ops in a fixed order, bit-identical everywhere, and ranks identically
    to ``tf * (N/df)^1`` (monotone in the same arguments). Ties broken by
    term for full determinism.

    Scale shape: tf never shuffles — per-doc term counts are computed in
    the scan projection with the sorted-run-length HOF
    (:func:`~wrtd_etl_spark.functions.text.sorted_runs`) and exploded
    ALREADY AGGREGATED, where the obvious plan exchanges the raw token
    stream on (doc, term); df aggregates keyed by term AFTER a per-doc
    ``array_distinct`` in the scan projection (no doc×term distinct
    shuffle); the join back to tf is a plain hash join on term (the df
    side is vocabulary-sized — broadcastable for real vocabularies); the
    window runs over the tf table partitioned by doc
    (aggregate-below-window, never over raw tokens). The corpus count
    crosses the driver boundary as a 1-row broadcast anchor, not a
    collect.
    """
    docs = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = docs.select("doc_id", toks.alias("t"))
    # sorted_runs requires the sort materialized in a prior select (HOF
    # lambdas sit outside codegen CSE — an inline sort re-runs per element)
    tf = (
        base.select("doc_id", F.array_sort("t").alias("s"))
        .select("doc_id", F.explode(TX.sorted_runs(F.col("s"))).alias("r"))
        .select(
            "doc_id",
            F.col("r.term").alias("term"),
            F.col("r.cnt").cast("long").alias("tf"),
        )
    )
    dfc = (
        base.select(F.explode(F.array_distinct("t")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    n_docs = base.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("df").cast("double")).alias(
                "score"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .orderBy("doc_id", "rk")
    )


@register(
    "dedup_fuzzy_verify",
    r"""
    WITH d AS (
        SELECT doc_id, lower(trim(text)) AS t,
               regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        FROM documents WHERE text IS NOT NULL
    ), sh AS (
        SELECT doc_id, array_to_string(toks[pos:pos+2], ' ') AS s
        FROM (SELECT doc_id, toks,
                     UNNEST(generate_series(1, GREATEST(len(toks) - 2, 1)))
                         AS pos
              FROM d)
    ), k AS (
        SELECT doc_id, band,
               MIN(md5(CAST(band AS VARCHAR) || '|' || s)) AS key
        FROM sh CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS band) b
        GROUP BY doc_id, band
    ), cold AS (
        SELECT band, key, doc_id FROM k
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= 64
    ), p AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM cold a JOIN cold b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT p.id1, p.id2, CAST(levenshtein(da.t, db.t) AS BIGINT) AS dist
    FROM p JOIN d da ON p.id1 = da.doc_id JOIN d db ON p.id2 = db.doc_id
    WHERE abs(len(da.t) - len(db.t)) * 4 <= greatest(len(da.t), len(db.t))
      AND levenshtein(da.t, db.t) * 4 <= greatest(len(da.t), len(db.t))
    ORDER BY id1, id2
    """,
)
def dedup_fuzzy_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification over LSH candidates (dedup/fuzzy.py):
    min-shingle band keys generate candidate pairs, the banded-Levenshtein
    stage keeps pairs within 25% edit distance of the longer text — the
    candidates→verify composite a production fuzzy-dedup pipeline runs.

    Round-3's version blocked the self-join on the document's FIRST TOKEN
    (Zipfian: one block goes O(N) on a real corpus, the worst skew in
    SHUFFLE_AUDIT r3). The min-shingle key is uniform over content —
    collisions track actual similarity — and the md5-based construction
    means DuckDB derives the IDENTICAL buckets, so the full composite
    (candidate generation + hot-bucket cap + verify) stays hash-pinned by
    the oracle, not just the verify filter.

    The 25% threshold is the integer form ``dist * 4 <= max_len`` in both
    engines (``CAST(0.25*len AS BIGINT)`` ROUNDS in DuckDB, TRUNCATES in
    Spark), and the same bound feeds Spark's 3-arg banded ``levenshtein``
    — see dedup/fuzzy.py for the per-pair O(L·L/4) early-exit.
    """
    from ..dedup.fuzzy import levenshtein_verify, minshingle_candidate_pairs

    docs = _docs(spark, sf_dir)
    pairs = minshingle_candidate_pairs(
        docs, "text", "doc_id", bands=4, shingle_k=3, max_bucket=64
    )
    return levenshtein_verify(
        pairs, docs, "text", "doc_id", max_dist_den=4
    ).orderBy("id1", "id2")


_QUALITY_SAMPLE_ORACLE = f"""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT *, {TX.quality_score_sql("text")} AS q
          FROM documents WHERE text IS NOT NULL)
    WHERE ((doc_id * 2654435761) % 4294967296) % 100
          < CAST(floor(q * 100) AS BIGINT)
    GROUP BY source ORDER BY source
    """


@register("quality_weighted_sample", _QUALITY_SAMPLE_ORACLE)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted (importance) sampling: each doc is kept with
    probability ≈ its quality score, implemented as the deterministic
    Knuth-hash bucket (the dataset_split idiom) compared against
    ``floor(quality*100)`` — reproducible across engines, runs and task
    retries, unlike ``rand() < q``. This is the standard up/down-weighting
    step for mixing corpus sources at target quality.

    Scale shape: scan-stage filter (hash + quality are projections — no
    pre-shuffle), then one partial-aggregating groupBy on source.
    """
    docs = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    q = TX.quality_score(F.col("text"))
    bucket = _h32(F.col("doc_id")) % 100
    return (
        docs.filter(bucket < F.floor(q * 100))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("source")
    )


@register(
    "dedup_substring",
    r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        FROM documents WHERE text IS NOT NULL
    ), p AS (
        SELECT doc_id, toks,
               UNNEST(generate_series(1, GREATEST(len(toks) - 7, 1), 2)) AS pos
        FROM t
    ), s AS (
        SELECT doc_id, md5(array_to_string(toks[pos:pos+7], ' ')) AS h
        FROM p
    ), d AS (
        SELECT h FROM (SELECT h, doc_id FROM s GROUP BY h, doc_id)
        GROUP BY h HAVING COUNT(*) >= 2
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           COUNT(*) FILTER (WHERE h IN (SELECT h FROM d)) AS n_dup_spans,
           CAST(COUNT(*) FILTER (WHERE h IN (SELECT h FROM d)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS dup_frac
    FROM s GROUP BY doc_id
    """,
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication profile (dedup/substring.py — the
    distributed approximation of Lee et al., arXiv:2107.06499): per doc,
    how many 8-token stride-2 windows are shared verbatim with OTHER
    documents. Catches cross-doc boilerplate that whole-doc dedup keeps
    and per-doc repetition stats (doc_repetition) can't see.

    md5 window fingerprints keep the oracle engine-portable; the
    duplicated-hash set is tiny so AQE broadcasts the mark-back
    semi-join."""
    from ..dedup.substring import substring_dup_stats

    docs = _docs(spark, sf_dir)
    return substring_dup_stats(
        docs, "text", "doc_id", window=8, stride=2, min_docs=2
    ).withColumn("n_dup_spans", F.col("n_dup_spans").cast("long"))


_MIX_BUDGET = 30_000  # tokens; even-numbered sources weighted 9x odd ones


@register(
    "corpus_mixture",
    r"""
    WITH t AS (
        SELECT doc_id, source,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
               CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                    THEN CAST(0.09 AS DOUBLE) ELSE CAST(0.01 AS DOUBLE) END AS w
        FROM documents
    ), s AS (
        SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tokens, MIN(w) AS w
        FROM t GROUP BY source
    ), k AS (
        SELECT t.doc_id, t.source, t.n_tok
        FROM t JOIN s USING (source)
        WHERE CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0
              < LEAST(1.0, (t.w * 30000.0) / CAST(src_tokens AS DOUBLE))
    ), g AS (
        SELECT source, COUNT(*) AS n_docs_kept,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens_kept
        FROM k GROUP BY source
    )
    SELECT s.source,
           CAST(COALESCE(g.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
           CAST(COALESCE(g.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
           LEAST(1.0, (s.w * 30000.0) / CAST(s.src_tokens AS DOUBLE)) AS frac,
           s.w * 30000.0 AS target_tokens,
           GREATEST(0.0, s.w * 30000.0 - CAST(s.src_tokens AS DOUBLE))
               AS shortfall
    FROM s LEFT JOIN g USING (source)
    """,
)
def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling (operators/mixture.py): downsample each source to
    its share of a token budget via the deterministic hash-uniform, report
    kept docs/tokens vs target and the availability shortfall. Weights:
    even-numbered sources 0.09, odd 0.01 (sum 1.0 over the 20 sources) —
    at the testdata's per-source token mass both branches bind: even
    sources hit the frac=1 cap (real shortfall), odd sources subsample."""
    from ..operators.mixture import mixture_report

    docs = _docs(spark, sf_dir)
    w = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(0.09)
    ).otherwise(F.lit(0.01))
    return mixture_report(docs, w, _MIX_BUDGET)


# Leakage-safe split: near-dup clusters co-travel. Splitting by doc hash
# (dataset_split) puts ~19% of any near-dup pair across train/test — the
# exact leakage contamination_check hunts; hashing the CLUSTER label
# instead makes cross-split near-dup leakage structurally impossible.
_LEAKAGE_SPLIT_ORACLE = rf"""
    WITH RECURSIVE pairs AS ({_NGRAM_ORACLE}
    ), edges AS (
        SELECT id1 AS a, id2 AS b FROM pairs
        UNION ALL
        SELECT id2, id1 FROM pairs
    ), reach(node, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
    ), labels AS (
        SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    ), lab AS (
        SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    )
    SELECT doc_id, cluster_id,
           CASE WHEN ((cluster_id * 2654435761) % 4294967296) % 100 < 80
                THEN 'train'
                WHEN ((cluster_id * 2654435761) % 4294967296) % 100 < 90
                THEN 'val' ELSE 'test' END AS split
    FROM lab
"""


@register("leakage_safe_split", _LEAKAGE_SPLIT_ORACLE)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split where near-duplicate CLUSTERS travel together:
    the deterministic split hash is applied to the connected-component
    label (min doc_id of the cluster), not the doc id — so a test doc can
    never have a near-dup in train. Composite of two independently scored
    operators (dedup_clusters closure + dataset_split hash); its own
    oracle runs in pytest (parked outside the 50-slot window like
    dedup_apply)."""
    docs = load_table(spark, sf_dir, "documents")
    # pair graph + closure from the session cache (computed once across
    # all four dedup composites)
    labels = _cached_cc_labels(spark, sf_dir).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    lab = docs.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
    )
    bucket = _h32(F.col("cluster_id")) % 100
    return lab.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


@register("ann_sq8_topk", None)  # int8 rounding ties engine-specific
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) top-k (similarity/quantized.py): int8 codes
    score a 4x-smaller corpus, exact-cosine rescore of the shortlist.
    Returned sims are bit-identical to brute force for shared pairs
    (pinned in pytest with a recall floor)."""
    from ..similarity.quantized import quantized_top_k

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 50)
    return quantized_top_k(emb, probes, k=5).orderBy("probe_id", "rank")


@register("bpe_tokenize", None)  # learned vocab is corpus/engine-specific
def bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real learned-subword tokenization (functions/bpe.py, Sennrich
    arXiv:1508.07909): train 15 merges on a bounded sample (tokenizer
    training is always sample-based in practice — the vocab is
    persisted, not retrained per query), then tokenize the FULL corpus
    with the broadcast ranks (zero-shuffle pandas UDF). Output: per-doc
    BPE token count vs char count (the compression the vocab bought).
    Truth model: tests/test_bpe.py pins the trainer merge-for-merge to
    a pure-Python reference implementation."""
    from ..functions.bpe import apply_bpe, train_bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs.limit(100), "text", 15)
    return (
        apply_bpe(docs, "text", merges)
        .select(
            "doc_id",
            F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .orderBy("doc_id")
    )


@register(
    "heavy_hitter_tokens",
    r"""
    WITH toks AS (
        SELECT unnest(
            regexp_split_to_array(lower(trim(text)), '\s+')
        ) AS token
        FROM documents WHERE text IS NOT NULL
    ), n AS (SELECT COUNT(*) AS total FROM toks)
    SELECT token, COUNT(*) AS cnt
    FROM toks GROUP BY token
    HAVING COUNT(*) * 100 >= (SELECT total FROM n)
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens making up >=1% of the corpus via Misra-Gries partial
    summaries + exact verification (operators/heavy_hitters.py): only
    (#partitions x k) candidates shuffle, never the vocabulary — the
    scalable twin of corpus_vocab's full groupBy, with EXACT counts (so
    the plain GROUP BY ... HAVING SQL is the oracle)."""
    from ..operators.heavy_hitters import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.col("text").isNotNull()).select(
        F.explode(TX.tokens(F.col("text"))).alias("token")
    )
    return heavy_hitters(toks, "token", phi=0.01)


@register(
    "weighted_doc_sample",
    r"""
    WITH t AS (
        SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS w
        FROM documents WHERE n_chars > 0
    ), k AS (
        SELECT source, doc_id,
               ROUND(
                   ln((CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE)
                       + 0.5) / 4294967296.0) / w,
                   12
               ) AS skey
        FROM t
    ), r AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY skey DESC, doc_id
               ) AS rank
        FROM k
    )
    SELECT source, doc_id, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 10
    """,
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted reservoir (A-ES) — 10 docs per source,
    inclusion probability proportional to n_chars (operators/sampling.py).
    The per-(group, physical-partition) pre-top-k means no reducer ever
    sorts a whole source; the oracle is the plain one-window form, equal
    by the containment argument in the module docstring."""
    from ..operators.sampling import weighted_sample_per_group

    docs = _docs(spark, sf_dir).select("source", "doc_id", "n_chars")
    return weighted_sample_per_group(
        docs, 10, F.col("n_chars").cast("double")
    ).select("source", "doc_id", "rank")


@register(
    "source_overlap",
    r"""
    WITH t AS (
        SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM documents WHERE text IS NOT NULL
    ), p AS (
        SELECT source, toks,
               UNNEST(generate_series(1, GREATEST(len(toks) - 2, 1))) AS pos
        FROM t
    ), sh AS (
        SELECT DISTINCT source, array_to_string(toks[pos:pos+2], ' ') AS sh
        FROM p
    ), c AS (
        SELECT source, COUNT(*) AS n FROM sh GROUP BY source
    ), i AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (sh)
        WHERE a.source < b.source
        GROUP BY 1, 2
    )
    SELECT ca.source AS source_a, cb.source AS source_b,
           CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
           CAST(COALESCE(i.n_common, 0) AS BIGINT) AS n_common,
           CAST(COALESCE(i.n_common, 0) AS DOUBLE)
               / CAST(ca.n + cb.n - COALESCE(i.n_common, 0) AS DOUBLE)
               AS jaccard
    FROM c ca JOIN c cb ON ca.source < cb.source
    LEFT JOIN i ON i.source_a = ca.source AND i.source_b = cb.source
    ORDER BY source_a, source_b
    """,
)
def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise set-Jaccard BETWEEN sources over distinct token shingles
    (dedup/source_overlap.py) — corpus-level overlap (mirrored crawls,
    shared boilerplate) that document-level dedup can't see. Pair rows
    are bounded by C(|sources|,2) per shingle, never corpus size; the
    jaccard division is single IEEE-division-exact on integer counts."""
    from ..dedup.source_overlap import source_jaccard_exact

    return source_jaccard_exact(_docs(spark, sf_dir))


@register("term_freq_cms", None)
def term_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch term frequencies for a fixed probe vocabulary
    (functions/sketches.py): one JVM-side sketch aggregate (map-side
    merged, fixed-size state) instead of a vocabulary shuffle. No SQL
    oracle — estimates are hash-family-dependent upper bounds; the
    eps-N error-bound + determinism test is the truth model."""
    from ..functions.sketches import term_frequency_estimates

    probes = ["the", "data", "spark", "row", "query", "nosuchtoken"]
    return term_frequency_estimates(
        _docs(spark, sf_dir), "text", probes, eps=0.0001, confidence=0.99
    )


@register(
    "keyword_search",
    r"""
    WITH t AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        FROM documents WHERE text IS NOT NULL
    ), n AS (
        SELECT COUNT(*) AS nd FROM documents WHERE text IS NOT NULL
    ), p AS (
        SELECT token, doc_id, COUNT(*) AS tf
        FROM t WHERE token IN ('merge', 'scan', 'vector')
        GROUP BY token, doc_id
    ), d AS (
        SELECT token, COUNT(*) AS df FROM p GROUP BY token
    ), s AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
               CAST(SUM(tf * CAST(FLOOR(
                   CAST((SELECT nd FROM n) AS DOUBLE) * 1000000.0
                       / CAST(df AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT)
                   AS micros
        FROM p JOIN d USING (token) GROUP BY doc_id
    )
    SELECT doc_id, n_terms_hit,
           CAST(micros AS DOUBLE) / 1000000.0 AS score,
           CAST(ROW_NUMBER() OVER (ORDER BY micros DESC, doc_id) AS BIGINT)
               AS rank
    FROM s QUALIFY rank <= 10
    """,
)
def keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword search over the documents corpus (operators/text_index.py
    search_corpus — the index-free twin of the persisted inverted-index
    path, same algebra): log-free tf-idf in exact integer micros, top-10
    with doc_id tie-break. The persisted variant (build_text_index +
    search_text_index: token-range-clustered versioned postings,
    manifest-stats file pruning) is verified equal in pytest."""
    from ..operators.text_index import search_corpus

    return search_corpus(
        _docs(spark, sf_dir), ["merge", "scan", "vector"], k=10
    )


@register(
    "ann_filtered_topk",
    f"""
    WITH v0 AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    v AS (SELECT vec_id, label, e, {_NN_SQL} AS nn FROM v0),
    scored AS (
        SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
               {_QCOS_SQL.format(a="p.e", b="c.e", na="p.nn", nb="c.nn")} AS sim
        FROM v p JOIN v c ON c.vec_id <> p.vec_id
        WHERE p.vec_id < 10 AND c.label = p.label
    ), ranked AS (
        SELECT probe_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT probe_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search: each probe's top-5 among candidates whose
    metadata matches (here: same ``label``) — filter-then-search, the
    semantics a RAG corpus needs (post-filtering a plain top-k starves
    results when the predicate is selective). The predicate lands on the
    corpus SCAN (pushed-down per probe-label partition of the broadcast
    join condition), so the scored set shrinks BEFORE any ranking work;
    at scale the same composition applies in front of the IVF/SQ8 paths
    (assign/score only the filtered rows)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    from ..similarity.ann import filtered_top_k

    return filtered_top_k(emb, probes, match_cols=["label"], k=5)


@register("ann_ivfsq8_topk", None)  # centroid+int8 rounding engine-specific
def ann_ivfsq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed IVF × SQ8 persisted index (similarity/index_store.py):
    ONE cell-clustered table gives a probe BOTH file pruning to its
    nprobe cells (manifest stats) and int8 one-matmul scoring with exact
    float rescore — the two accelerations that were previously mutually
    exclusive. Truth model: tests/test_index_store.py pins recall vs
    brute force, all-cells-degenerates-to-SQ8 equivalence, and
    append ≡ rebuild."""
    import os as _os
    import tempfile as _tf

    from ..similarity.index_store import ivfsq8_query, write_ivfsq8_index

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 50)
    t = _os.path.join(_tf.mkdtemp(prefix="wrtd_ivfsq8_"), "idx")
    write_ivfsq8_index(emb, t, n_cells=16, layout_files=8)
    return ivfsq8_query(spark, t, probes, k=5, nprobe=4).orderBy(
        "probe_id", "rank"
    )
