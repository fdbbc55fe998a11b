"""Persisted inverted text index + keyword search.

The reference's Postgres warehouse answers "find the rows mentioning X"
with a B-tree/GIN index (create_tables.sql:71-79 — indexes are its only
retrieval accelerator); a parquet lake has no server-side index, so the
Spark-first equivalent is an inverted index AS A TABLE: one row per
(token, doc_id, tf), range-clustered by token and committed as a
versioned table with per-file token min/max stats — term lookups then
prune to the few files whose token range covers the query terms
(sources/versioned.py skip_filter), the same manifest-stats mechanism
the Z-order work proves for numeric ranges, exercised here on strings.

Scoring is the log-free tf-idf used by doc_tfidf_topk
(plans/pipeline_queries.py): weight = tf · (n_docs / df) — integer
division to double, computed in exact integer micros (see _score), so search results
are bit-comparable cross-engine (a ln() idf or a float sum would
differ in final ulps and break ranking-hash parity).

Scale shape: build is one tokenize+explode scan and one (token, doc)
aggregation; search reads ONLY the pruned postings files for the query
terms — |terms| × (docs-per-term) rows, never the corpus — then a
broadcast-joinable per-term df table and a doc-keyed top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources.versioned import manifest_info, read_snapshot, write_snapshot


def _postings(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = TX.lower_tokens(F.col(text_col))
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def build_text_index(
    df: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_files: int = 8,
    extra: dict | None = None,
) -> int:
    """Tokenize, aggregate (token, doc_id, tf), range-cluster by token
    and commit with token file-stats; n_docs rides the manifest. ONE
    corpus scan: postings are locally checkpointed and n_docs is their
    distinct doc count (every non-null-text doc yields >= 1 token — even
    empty text splits to [""]), so no separate counting pass re-reads
    the corpus. ``extra`` merges caller manifest fields (lineage stamps).
    Returns the committed version."""
    postings = (
        _postings(df, text_col, id_col)
        .repartitionByRange(n_files, "token")
        .localCheckpoint()
    )
    n_docs = postings.select("doc_id").distinct().count()
    return write_snapshot(
        postings,
        table,
        extra={"kind": "text_index", "n_docs": n_docs, **(extra or {})},
        stats_cols=["token"],
    )



def _score(post: DataFrame, df_tbl: DataFrame, n_docs: int) -> DataFrame:
    """Per-doc log-free tf-idf in EXACT integer micros: each term's
    weight is tf * round(n_docs*1e6/df) — one rounded division per term,
    then an integer sum (order-free), then ONE final division for the
    user-facing double. A float sum of per-term weights would depend on
    aggregation order and diverge from any oracle in final ulps."""
    w_micro = F.col("tf") * F.floor(
        F.lit(n_docs * 1_000_000.0) / F.col("df").cast("double") + F.lit(0.5)
    ).cast("long")
    return (
        post.join(F.broadcast(df_tbl), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
            (F.sum(w_micro).cast("double") / F.lit(1_000_000.0)).alias(
                "score"
            ),
        )
    )


def build_text_index_from(
    spark: SparkSession,
    docs_table: str,
    index_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_files: int = 8,
) -> int:
    """Index a VERSIONED corpus table, stamping the source version into
    the index manifest — the hook :func:`refresh_text_index` keys off."""
    from ..sources.versioned import latest_version as _lv

    src_v = _lv(docs_table)
    docs = read_snapshot(spark, docs_table, version=src_v)
    return build_text_index(
        docs,
        index_table,
        text_col,
        id_col,
        n_files,
        extra={"source_table": docs_table, "source_version": src_v},
    )


def refresh_text_index(
    spark: SparkSession,
    docs_table: str,
    index_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_files: int = 8,
    maintain: bool = True,
    maintain_dv_rows: int = 100_000,
    maintain_max_files: int = 256,
    maintain_small_bytes: "int | None" = None,
) -> int | None:
    """Self-maintaining refresh: run the incremental fold (below), then
    — ``maintain=True`` (default) — settle the index table's OWN debt
    via ``maybe_compact``: retraction folds delete postings through
    deletion vectors (r10), so a year of GDPR erasures would otherwise
    leave every search paying an ever-larger position anti-join; past
    ``maintain_dv_rows`` shadowed rows a surgical REORG PURGE rewrites
    only the DV-shadowed files (per-file token ranges — and with them
    the planted pruning bound — survive, since purge never merges
    files), and past ``maintain_max_files`` the small-file tail of
    repeated append-refreshes bin-packs. Both checks are one root
    manifest read when healthy; the maintenance commit carries the
    index's version stamp forward, so fold composition is unaffected.
    Returns the latest committed index version (the maintenance commit
    when it fired, else the fold's).
    """
    v = _refresh_text_index_once(
        spark, docs_table, index_table, text_col, id_col, n_files
    )
    if maintain and v is not None:
        from ..sources.versioned import maybe_compact

        mv = maybe_compact(
            spark,
            index_table,
            max_files=maintain_max_files,
            dv_rows_max=maintain_dv_rows,
            small_bytes=maintain_small_bytes,
        )
        if mv is not None:
            return mv
    return v


def _refresh_text_index_once(
    spark: SparkSession,
    docs_table: str,
    index_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_files: int = 8,
) -> int | None:
    """Fold the corpus's committed changes into the index: fresh → no-op
    (manifest reads only, returns None); insert-only delta of NEW
    doc ids → index just the new documents and append-commit (old
    postings files untouched — per-(token, doc) rows are disjoint
    across docs, so appended postings compose exactly); a compact-only
    range → stamp bump (logical no-op, so later deltas keep composing);
    a range MIXING appends with compaction/purge → the r9 keyed row-id
    diff recovers exactly the appended docs (rewrite churn cancels by
    row id), so routine maintenance no longer forces rebuilds; value
    DELETES and UPDATES in a keyed-coverable range fold as posting
    RETRACTIONS (r10): the touched doc ids merge-delete out of the
    index (per-(token, doc) rows are disjoint across docs, so the
    subtraction is exact and token files stay in place), updates then
    re-append their fresh postings, and ``n_docs`` shrinks by the docs
    that actually left. Only a re-ingested existing doc id on the
    positional append path or a range the keyed proof can't cover
    (overwrite/rollback, pre-tracking segments) still pays the full
    rebuild. Search results after refresh are identical to an index
    built from scratch at the current version.

    The classification is MANIFEST-driven (``delta_files`` +
    ``commit_modes``): no data is read or diffed to decide — the
    previous design probed the logical change feed, whose non-append
    fallback shuffles BOTH corpus snapshots through an exceptAll just
    to learn "a delete happened", which the commit modes already say."""
    import os

    from ..sources.versioned import commit_modes, delta_files
    from ..sources.versioned import latest_version as _lv

    info = manifest_info(index_table)["extra"]
    if info.get("kind") != "text_index":
        raise ValueError(f"{index_table} is not a text index (extra={info})")
    if info.get("source_table") != docs_table:
        raise ValueError(
            f"index was built from {info.get('source_table')!r}, "
            f"not {docs_table!r}"
        )
    src_v = _lv(docs_table)
    prev_v = info["source_version"]
    if src_v == prev_v:
        return None  # fresh: no data touched
    delta = delta_files(docs_table, prev_v, src_v)
    new_docs = None
    if delta is None:
        # a rewrite interrupted the positional append chain. Row
        # tracking (r9) recovers the honest delta anyway: the keyed
        # diff cancels compaction/purge churn by row id, so a range
        # like append→compact→append still folds as ITS APPENDED DOCS
        # instead of forcing a rebuild. Deletes/updates in the diff
        # still rebuild (removing postings rewrites arbitrary token
        # files — the rebuild is the honest cost), as does anything
        # the keyed proof can't cover (overwrite/rollback, untracked
        # segments).
        from ..sources.versioned import (
            _KEYED_CDC_MODES,
            _table_changes_keyed,
        )

        ch = (
            _table_changes_keyed(spark, docs_table, prev_v, src_v)
            if set(commit_modes(docs_table, prev_v, src_v))
            <= _KEYED_CDC_MODES
            else None
        )
        if ch is None:
            return build_text_index_from(
                spark, docs_table, index_table, text_col, id_col, n_files
            )
        ch = ch.localCheckpoint(eager=False)
        new_docs = ch.filter(F.col("_change_type") == "insert").drop(
            "_change_type"
        )
        if not new_docs.take(1):
            new_docs = None  # no inserts in the diff
        if ch.filter(F.col("_change_type") == "delete").take(1):
            # retraction fold (r9 VERDICT ask #4): the keyed diff names
            # the EXACT changed docs, and per-(token, doc) postings are
            # disjoint across docs — so value deletes subtract as a
            # keyed merge-delete of the touched doc ids (postings leave
            # via deletion vectors / CoW on the index table, no token
            # file reshuffle, no corpus re-scan) and updates fold as
            # delete-old + append-new. This replaces the former honest
            # rebuild on any delete (the retract_rollup idiom applied
            # to posting lists). n_docs adjusts by the docs that
            # actually LEFT the index (a deleted null-text doc was
            # never indexed); the arithmetic is idempotent under a
            # crash between the two commits — a re-run's merge-delete
            # matches nothing and subtracts nothing.
            from ..sources.versioned import merge_into

            touched = (
                ch.select(F.col(id_col).alias("doc_id"))
                .distinct()
                .localCheckpoint(eager=False)
            )
            n_gone = (
                read_snapshot(spark, index_table)
                .select("doc_id")
                .join(touched, "doc_id", "semi")
                .distinct()
                .count()
            )
            info = {**info, "n_docs": info["n_docs"] - n_gone}
            merge_into(
                spark,
                index_table,
                touched,
                ["doc_id"],
                when_matched="keep",
                delete_when=F.lit(True),
                insert=False,
                extra=info,
                # merge-on-read: a doc's postings are scattered across
                # every token-range file, so a CoW plan would rewrite
                # the whole index — deletion vectors retract the rows
                # and leave the token files physically in place
                strategy="dv",
            )
            # fall through: new_docs (if any) re-index below — their
            # old postings are gone, so the reingestion guard passes
            # by construction and append-composition stays exact
    if delta is not None and not delta:
        new_docs = None  # empty appends
    if new_docs is None and not delta:
        # compact-only / churn-only range or empty appends: nothing
        # changed logically — bump the stamp so future deltas compose
        return write_snapshot(
            read_snapshot(spark, index_table).limit(0),
            index_table,
            mode="append",
            extra={**info, "source_version": src_v},
            stats_cols=["token"],
        )
    if new_docs is None:
        new_docs = spark.read.parquet(
            *[os.path.join(docs_table, f) for f in delta]
        )
    # a re-ingested doc_id cannot append-compose: its old postings rows
    # would double-count df/tf vs a rebuild — detect and rebuild instead
    indexed_ids = read_snapshot(spark, index_table).select("doc_id").distinct()
    reingested = (
        new_docs.select(F.col(id_col).alias("doc_id"))
        .join(indexed_ids, "doc_id", "semi")
        .take(1)
    )
    if reingested:
        return build_text_index_from(
            spark, docs_table, index_table, text_col, id_col, n_files
        )
    postings = (
        _postings(new_docs, text_col, id_col)
        .repartitionByRange(n_files, "token")
        .localCheckpoint()
    )
    n_new = postings.select("doc_id").distinct().count()
    return write_snapshot(
        postings,
        index_table,
        mode="append",
        extra={**info, "n_docs": info["n_docs"] + n_new, "source_version": src_v},
        stats_cols=["token"],
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Top-k with the (score desc, doc_id) tie rule. The global window
    ranks only MATCHED docs (bounded by the query terms' summed df);
    for huge candidate sets swap in the two-stage top-k of
    operators/sampling.py — k here is user-facing small."""
    win = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
    )


def search_text_index(
    spark: SparkSession,
    table: str,
    terms: list[str],
    k: int = 10,
    version: int | None = None,
) -> DataFrame:
    """(doc_id, n_terms_hit, score, rank): top-k docs for a bag of
    terms. Reads only postings files whose token range covers the query
    terms (manifest-stats pruning); ties break by doc_id."""
    info = manifest_info(table, version)["extra"]
    if info.get("kind") != "text_index":
        raise ValueError(f"{table} is not a text index (extra={info})")
    terms = sorted(set(t.lower() for t in terms))
    # empty/all-whitespace queries: same contract as search_corpus —
    # zero rows, not an IndexError on the skip bounds
    skip = {"token": (terms[0], terms[-1])} if terms else None
    post = read_snapshot(
        spark, table, version=version, skip_filter=skip
    ).filter(F.col("token").isin(terms))
    df_tbl = post.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    return _rank_topk(_score(post, df_tbl, int(info["n_docs"])), k)


def search_corpus(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Index-free twin of :func:`search_text_index` (one corpus scan) —
    the same algebra on the same tokenization, so the persisted path is
    testable against it and the registry query stays hermetic."""
    terms = sorted(set(t.lower() for t in terms))
    n_docs = df.filter(F.col(text_col).isNotNull()).count()
    post = _postings(df, text_col, id_col).filter(F.col("token").isin(terms))
    df_tbl = post.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    return _rank_topk(_score(post, df_tbl, n_docs), k)
