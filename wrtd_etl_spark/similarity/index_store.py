"""Persisted ANN indexes: build once as a versioned table, query many.

Training state (SQ8 per-dimension scales, k-means centroids) is small —
dim floats / K×dim floats — so it rides the versioned table's manifest
``extra`` (sources/versioned.py), while the data-sized artifacts (int8
codes, cell assignments) are the table's rows. Querying never retrains:
the stored codes feed :func:`~wrtd_etl_spark.similarity.quantized.
quantized_top_k` via ``code_col`` (bit-identical to the on-the-fly path —
same code values by construction), and stored centroids feed
:func:`~wrtd_etl_spark.similarity.ivf.ivf_top_k` verbatim.

Versioning gives index lifecycle for free: retrain = new version, readers
pin a manifest (no torn index), rollback restores the previous index,
vacuum reclaims superseded codes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sampling import hash32 as _h32

from ..sources.versioned import manifest_info, read_snapshot, write_snapshot
from .quantized import quantize, quantized_top_k, train_scales


def write_sq8_index(
    corpus: DataFrame,
    table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scales: list[float] | None = None,
    extra: dict | None = None,
) -> int:
    """Train (unless given) + quantize + commit the SQ8 index; returns
    the committed version. Rows: (id, float vector, int8 codes) — the
    float vectors stay INSIDE the index table so the exact-cosine rescore
    reads one table, column-pruned per stage. ``extra`` merges caller
    metadata (the versioned-corpus lineage stamp) into the manifest."""
    if scales is None:
        scales = train_scales(corpus, vec_col)
    coded = quantize(corpus, scales, vec_col=vec_col, out_col="qvec")
    return write_snapshot(
        coded.select(id_col, vec_col, "qvec"),
        table,
        # id stats let keyed maintenance (refresh_ann_index's surgical
        # delete fold) rewrite only the files whose id range can match
        stats_cols=[id_col],
        extra={"kind": "sq8", "scales": scales, "vec_col": vec_col,
               "id_col": id_col, **(extra or {})},
    )


def sq8_append(
    new_vectors: DataFrame,
    table: str,
    extra_update: dict | None = None,
) -> int:
    """Incrementally index NEW vectors with the STORED scales — no
    retrain, no rewrite of existing codes; one append commit. Returns
    the committed version.

    The resulting index is code-identical to rebuilding with the same
    scales over the union (quantize is per-row), so queries see exactly
    what a full rebuild would produce. Scales are training state from
    the ORIGINAL corpus: appending a distribution-shifted delta keeps
    correctness (the exact-cosine rescore reads stored floats) but can
    widen quantization error for the new rows — retrain (a fresh
    ``write_sq8_index`` version) when the delta dominates. Caller owns
    id uniqueness, as with any append-only log."""
    info = manifest_info(table)["extra"]
    if info.get("kind") != "sq8":
        raise ValueError(f"{table} is not an sq8 index (extra={info})")
    vec_col, id_col = info["vec_col"], info["id_col"]
    coded = quantize(new_vectors, info["scales"], vec_col=vec_col, out_col="qvec")
    return write_snapshot(
        coded.select(id_col, vec_col, "qvec"),
        table,
        mode="append",
        stats_cols=[id_col],
        extra={**info, **(extra_update or {})},
    )


def sq8_query(
    spark: SparkSession,
    table: str,
    probes: DataFrame,
    k: int = 5,
    rescore_margin: int = 4,
    version: int | None = None,
) -> DataFrame:
    """Top-k against a persisted SQ8 index — stored codes, stored scales,
    zero training work."""
    info = manifest_info(table, version)["extra"]
    index = read_snapshot(spark, table, version=version)
    return quantized_top_k(
        index,
        probes,
        vec_col=info["vec_col"],
        id_col=info["id_col"],
        k=k,
        scales=info["scales"],
        rescore_margin=rescore_margin,
        code_col="qvec",
    )


def write_ivf_index(
    corpus: DataFrame,
    table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    kmeans_iters: int = 0,
    extra: dict | None = None,
) -> int:
    """Persist IVF training state: centroids in the manifest (K×dim
    floats — the expensive-to-recompute part when k-means-trained) and
    the (id, cell) assignment rows for cell-size audits. Returns the
    committed version."""
    from pyspark.sql import functions as F

    from .ann import _non_null_vectors
    from .ivf import _assign_cells
    from .kmeans import train_centroids_kmeans

    # same NULL-vector contract as ivf_top_k: the hash-ordered sample
    # must never pick a NULL row as a centroid
    corpus = _non_null_vectors(corpus, vec_col)
    if kmeans_iters > 0:
        centroids = train_centroids_kmeans(
            corpus, vec_col, id_col, n_cells, rounds=kmeans_iters
        )
    else:
        centroids = [
            [float(x) for x in r[0]]
            for r in corpus.select(
                vec_col,
                (
                    _h32(F.col(id_col))
                ).alias("__h"),
            )
            .orderBy("__h", id_col)
            .limit(n_cells)
            .collect()
        ]
    assigned = _assign_cells(corpus, vec_col, id_col, centroids, nprobe=1)
    return write_snapshot(
        assigned.select(id_col, "cell"),
        table,
        stats_cols=[id_col],
        extra={"kind": "ivf", "centroids": centroids, "vec_col": vec_col,
               "id_col": id_col,
               "build": {"n_cells": n_cells, "kmeans_iters": kmeans_iters},
               **(extra or {})},
    )


def ivf_append(
    new_vectors: DataFrame,
    table: str,
    extra_update: dict | None = None,
) -> int:
    """Incrementally assign NEW vectors to the STORED centroids and
    append the (id, cell) rows — no retrain; queries against the union
    behave exactly as if the index had been built over it with these
    centroids (assignment is per-row). Like sq8_append, retrain when the
    delta shifts the distribution enough that stored centroids stop
    representing it (cell-size audits over the stored assignments are
    the signal)."""
    from .ann import _non_null_vectors
    from .ivf import _assign_cells

    info = manifest_info(table)["extra"]
    if info.get("kind") != "ivf":
        raise ValueError(f"{table} is not an ivf index (extra={info})")
    vec_col, id_col = info["vec_col"], info["id_col"]
    assigned = _assign_cells(
        _non_null_vectors(new_vectors, vec_col),
        vec_col,
        id_col,
        info["centroids"],
        nprobe=1,
    )
    return write_snapshot(
        assigned.select(id_col, "cell"),
        table,
        mode="append",
        stats_cols=[id_col],
        extra={**info, **(extra_update or {})},
    )


def ivf_query(
    spark: SparkSession,
    table: str,
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    version: int | None = None,
) -> DataFrame:
    """Top-k via the persisted centroids — no retraining; identical to
    calling ivf_top_k with the same centroids by construction."""
    from .ivf import ivf_top_k

    info = manifest_info(table, version)["extra"]
    return ivf_top_k(
        corpus,
        probes,
        vec_col=info["vec_col"],
        id_col=info["id_col"],
        k=k,
        nprobe=nprobe,
        centroids=info["centroids"],
    )


def _probe_cell_sets(
    probes_rows: list, centroids: list[list[float]], nprobe: int
) -> dict[int, set[int]]:
    """Driver-side probe→cells assignment, same math and stable tie-break
    as ivf._make_pandas_assign (dot/|c| ranking)."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    norms = np.sqrt((C * C).sum(axis=1))
    norms[norms == 0] = 1.0
    P = np.stack([np.asarray(r[1], dtype=np.float64) for r in probes_rows])
    sims = (P @ C.T) / norms
    idx = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    return {
        int(r[0]): {int(c) for c in idx[i]}
        for i, r in enumerate(probes_rows)
    }


def write_ivfsq8_index(
    corpus: DataFrame,
    table: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    kmeans_iters: int = 0,
    scales: list[float] | None = None,
    layout_files: int | None = None,
    extra: dict | None = None,
) -> int:
    """Composed IVF × SQ8 index: ONE persisted table whose rows carry
    (id, float vector, int8 codes, coarse cell), committed CLUSTERED BY
    cell (``layout_by``) with per-file cell stats — so a probe both
    PRUNES FILES to its nprobe cells and scores int8 codes in the same
    scan. Previously the two accelerations were mutually exclusive
    (sq8 scanned every row; ivf scored floats).

    Training state (centroids + scales) rides the manifest; returns the
    committed version."""
    from pyspark.sql import functions as F

    from .ann import _non_null_vectors
    from .ivf import _assign_cells
    from .kmeans import train_centroids_kmeans

    corpus = _non_null_vectors(corpus, vec_col)
    if kmeans_iters > 0:
        centroids = train_centroids_kmeans(
            corpus, vec_col, id_col, n_cells, rounds=kmeans_iters
        )
    else:
        centroids = [
            [float(x) for x in r[0]]
            for r in corpus.select(vec_col, _h32(F.col(id_col)).alias("__h"))
            .orderBy("__h", id_col)
            .limit(n_cells)
            .collect()
        ]
    if scales is None:
        scales = train_scales(corpus, vec_col)
    assigned = _assign_cells(corpus, vec_col, id_col, centroids, nprobe=1)
    coded = quantize(
        assigned.withColumnRenamed("v", vec_col), scales,
        vec_col=vec_col, out_col="qvec",
    )
    # three consumers downstream (layout bounds agg, range sampling, the
    # write itself) would each re-run the assignment UDF over the corpus
    # — materialize the coded rows once instead (localCheckpoint, not
    # persist: array columns cache ~7x slower through the columnar
    # encoder than they recompute)
    coded = coded.select(id_col, vec_col, "qvec", "cell").localCheckpoint(
        eager=False
    )
    return write_snapshot(
        coded,
        table,
        layout_by=["cell"],
        layout_files=layout_files,
        # the cell domain is known exactly (assignment clamps to the
        # centroid list) — skip the bounds aggregate over the corpus
        layout_bounds=[(0.0, float(max(n_cells - 1, 1)))],
        stats_cols=[id_col],
        extra={
            "kind": "ivfsq8",
            "layout_files": layout_files,
            "centroids": centroids,
            "scales": scales,
            "vec_col": vec_col,
            "id_col": id_col,
            "build": {"n_cells": n_cells, "kmeans_iters": kmeans_iters},
            **(extra or {}),
        },
    )


def ivfsq8_append(
    new_vectors: DataFrame,
    table: str,
    layout_files: int | None = None,
    extra_update: dict | None = None,
) -> int:
    """Assign NEW vectors to the stored centroids, quantize them with the
    stored scales, append one cell-clustered commit — index rows
    identical to a rebuild with the same training state (both steps are
    per-row)."""
    from .ann import _non_null_vectors
    from .ivf import _assign_cells

    info = manifest_info(table)["extra"]
    if info.get("kind") != "ivfsq8":
        raise ValueError(f"{table} is not an ivfsq8 index (extra={info})")
    vec_col, id_col = info["vec_col"], info["id_col"]
    assigned = _assign_cells(
        _non_null_vectors(new_vectors, vec_col),
        vec_col,
        id_col,
        info["centroids"],
        nprobe=1,
    )
    coded = quantize(
        assigned.withColumnRenamed("v", vec_col),
        info["scales"],
        vec_col=vec_col,
        out_col="qvec",
    )
    return write_snapshot(
        coded.select(id_col, vec_col, "qvec", "cell"),
        table,
        mode="append",
        layout_by=["cell"],
        layout_files=layout_files or info.get("layout_files"),
        # cell domain known from the stored centroid list
        layout_bounds=[(0.0, float(max(len(info["centroids"]) - 1, 1)))],
        stats_cols=[id_col],
        extra={**info, **(extra_update or {})},
    )


def ivfsq8_query(
    spark: SparkSession,
    table: str,
    probes: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    rescore_margin: int = 4,
    version: int | None = None,
) -> DataFrame:
    """Top-k against the composed index: files pruned to the probes'
    cell range (manifest stats), rows masked per probe to its own nprobe
    cells, int8 one-matmul scoring, exact float rescore of the shortlist
    — at equal probe budget the candidate set per probe is exactly plain
    IVF's, scored through SQ8's cheaper arithmetic."""
    from pyspark.sql import functions as F

    from .ann import _non_null_vectors

    info = manifest_info(table, version)["extra"]
    if info.get("kind") != "ivfsq8":
        raise ValueError(f"{table} is not an ivfsq8 index (extra={info})")
    vec_col, id_col = info["vec_col"], info["id_col"]
    p_rows = (
        _non_null_vectors(probes, vec_col)
        .select(id_col, vec_col)
        .collect()
    )
    if not p_rows:
        return spark.createDataFrame(
            [], "probe_id long, neighbor_id long, sim double, rank long"
        )
    cell_sets = _probe_cell_sets(p_rows, info["centroids"], nprobe)
    allowed = sorted(set().union(*cell_sets.values()))
    index = read_snapshot(
        spark,
        table,
        version=version,
        skip_filter={"cell": (allowed[0], allowed[-1])},
    ).filter(F.col("cell").isin(allowed))
    return quantized_top_k(
        index,
        probes,
        vec_col=vec_col,
        id_col=id_col,
        k=k,
        scales=info["scales"],
        rescore_margin=rescore_margin,
        code_col="qvec",
        cell_col="cell",
        probe_cells=cell_sets,
    )


def write_ann_index_from(
    spark: SparkSession,
    corpus_table: str,
    index_table: str,
    kind: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    **build,
) -> int:
    """Build an ANN index (``kind`` ∈ sq8 | ivf | ivfsq8) from a
    VERSIONED corpus table, stamping the corpus version into the index
    manifest — the lineage :func:`refresh_ann_index` keys off, mirroring
    operators/text_index.build_text_index_from. ``build`` kwargs pass
    through to the kind's writer (n_cells, kmeans_iters, layout_files)."""
    from ..sources.versioned import latest_version

    src_v = latest_version(corpus_table)
    if src_v is None:
        raise FileNotFoundError(f"no committed version in {corpus_table}")
    corpus = read_snapshot(spark, corpus_table, version=src_v)
    lineage = {"source_table": corpus_table, "source_version": src_v}
    if kind == "sq8":
        return write_sq8_index(
            corpus, index_table, vec_col, id_col, extra=lineage, **build
        )
    if kind == "ivf":
        return write_ivf_index(
            corpus, index_table, vec_col, id_col, extra=lineage, **build
        )
    if kind == "ivfsq8":
        return write_ivfsq8_index(
            corpus, index_table, vec_col, id_col, extra=lineage, **build
        )
    raise ValueError(f"unknown ANN index kind: {kind!r}")


def refresh_ann_index(
    spark: SparkSession,
    corpus_table: str,
    index_table: str,
    maintain: bool = True,
    maintain_dv_rows: int = 100_000,
    maintain_max_files: int = 256,
    maintain_small_bytes: "int | None" = None,
) -> tuple[int | None, str]:
    """Self-maintaining refresh: run the incremental fold (below), then
    — ``maintain=True`` (default) — settle the index table's own debt
    via ``maybe_compact``: surgical delete/upsert folds accrue rewrite
    churn and (when routed through deletion vectors) DV position sets
    on the index table itself, and nothing used to purge them. Past
    ``maintain_dv_rows`` shadowed rows a REORG PURGE rewrites only the
    shadowed files; past ``maintain_max_files`` the append-refresh tail
    bin-packs (``maintain_small_bytes``). One root-manifest read when
    healthy; the maintenance commit carries the version stamp forward.
    The returned version is the latest committed one (the maintenance
    commit when it fired)."""
    v, action = _refresh_ann_index_once(spark, corpus_table, index_table)
    if maintain and action not in ("fresh",):
        from ..sources.versioned import maybe_compact

        mv = maybe_compact(
            spark,
            index_table,
            max_files=maintain_max_files,
            dv_rows_max=maintain_dv_rows,
            small_bytes=maintain_small_bytes,
        )
        if mv is not None:
            return mv, action
    return v, action


def _refresh_ann_index_once(
    spark: SparkSession, corpus_table: str, index_table: str
) -> tuple[int | None, str]:
    """Fold the corpus's committed changes into a persisted ANN index;
    returns (index version, action ∈ {fresh, append, stamp, rebuild}).

    The delete story the append-only ``*_append`` functions lacked:
    after a ``delete_where``/merge-delete on the corpus, a persisted
    index would silently keep returning erased vectors. Same contract as
    the text index (operators/text_index.refresh_text_index), but the
    classification is MANIFEST-driven — no data is diffed to decide:

    * fresh (stamp == corpus version) → no-op, manifest reads only;
    * all-append range (``delta_files``) → assign/quantize ONLY the new
      vectors with the stored training state and append-commit —
      code-identical to a rebuild with that state, O(delta);
      a RE-INGESTED id cannot append-compose (the index would return it
      twice) → rebuild;
    * compact-only range → logical no-op: bump the stamp with an empty
      append, so later deltas still compose incrementally;
    * delete-only range (delete / delete_dv / compact commits) →
      SURGICAL fold: the erased ids come from the physical change feed
      (deletes minus re-inserted survivors; a deletion-vector commit's
      deletes are the r8 position DELTAS, row-exact, and a purge's
      file-removal deletes exclude already-vectored rows — the
      subtraction stays exact), and a keyed merge-delete
      removes exactly those rows from the index — training state is
      kept (the Faiss ``remove_ids`` semantics), only the index files
      whose id range can match are rewritten, and the result is
      row-identical to rebuilding with the SAME stored training state
      (assignment/quantization are per-row);
    * any other id-preserving rewrite range (update / merge / a mix of
      appends with maintenance compaction) → r9 KEYED UPSERT fold: the
      row-tracking diff yields the exact insert/delete rows, every
      touched id is merge-deleted and the insert rows re-quantize with
      the stored training state — routine compaction no longer forces
      rebuilds (action ``upsert_fold``);
    * anything the keyed proof can't cover (overwrite/rollback,
      pre-tracking segments) → honest rebuild from the current
      snapshot, retraining with the recorded build params — rewritten
      vectors re-index, and results equal a from-scratch build at the
      current version (training is deterministic given the corpus)."""
    from pyspark.sql import functions as F

    from ..sources.versioned import (
        _KEYED_CDC_MODES,
        _table_changes_keyed,
        commit_modes,
        delta_files,
        latest_version,
        merge_into,
        table_changes_physical,
        write_snapshot as _ws,
    )

    info = manifest_info(index_table)["extra"]
    kind = info.get("kind")
    if kind not in ("sq8", "ivf", "ivfsq8"):
        raise ValueError(f"{index_table} is not an ANN index (extra={info})")
    if info.get("source_table") != corpus_table:
        raise ValueError(
            f"index was built from {info.get('source_table')!r}, "
            f"not {corpus_table!r}"
        )
    src_v = latest_version(corpus_table)
    prev_v = info["source_version"]
    if src_v == prev_v:
        return latest_version(index_table), "fresh"

    def rebuild() -> tuple[int, str]:
        build = dict(info.get("build") or {})
        if kind == "ivfsq8":
            build.setdefault("layout_files", info.get("layout_files"))
        return (
            write_ann_index_from(
                spark, corpus_table, index_table, kind,
                info["vec_col"], info["id_col"], **build,
            ),
            "rebuild",
        )

    stamp = {"source_version": src_v}
    delta = delta_files(corpus_table, prev_v, src_v)
    if delta:
        import os

        id_col = info["id_col"]
        new_vecs = spark.read.parquet(
            *[os.path.join(corpus_table, f) for f in delta]
        )
        indexed = read_snapshot(spark, index_table).select(id_col)
        if new_vecs.select(id_col).join(indexed, id_col, "semi").take(1):
            return rebuild()
        append = {
            "sq8": sq8_append, "ivf": ivf_append, "ivfsq8": ivfsq8_append,
        }[kind]
        return append(new_vecs, index_table, extra_update=stamp), "append"
    if delta is None:
        modes = set(commit_modes(corpus_table, prev_v, src_v))
        if modes <= {"delete", "delete_dv", "compact"}:
            # monotone shrinkage: rows only left the corpus. The erased
            # ids are the physical feed's deleted rows minus the CoW
            # survivors it re-inserted (compact noise cancels in the
            # same subtraction) — planned from manifests, zero exchanges
            # on the feed itself.
            id_col = info["id_col"]
            feed = table_changes_physical(
                spark, corpus_table, prev_v, src_v
            )
            erased = (
                feed.filter(F.col("_change_type") == "delete")
                .select(id_col)
                .exceptAll(
                    feed.filter(F.col("_change_type") == "insert")
                    .select(id_col)
                )
                .distinct()
            )
            if erased.take(1):
                return (
                    merge_into(
                        spark,
                        index_table,
                        erased,
                        [id_col],
                        when_matched="keep",
                        delete_when=F.lit(True),
                        insert=False,
                        extra={**info, **stamp},
                    ),
                    "delete_fold",
                )
            # pure compact churn: nothing actually left — stamp below
        elif modes <= _KEYED_CDC_MODES:
            # r9 row tracking: the keyed diff yields EXACT insert/delete
            # rows across any id-preserving rewrite lineage — a range
            # mixing appends with maintenance compaction, a vector
            # UPDATE, a MERGE — so the fold is a keyed upsert: purge
            # every touched id, then quantize/append the insert rows
            # with the stored training state (row-identical to a
            # rebuild with that state). Falls back to rebuild when the
            # proof doesn't hold (pre-tracking segments).
            ch = _table_changes_keyed(spark, corpus_table, prev_v, src_v)
            if ch is None:
                return rebuild()
            ch = ch.localCheckpoint(eager=False)
            id_col = info["id_col"]
            ins = ch.filter(F.col("_change_type") == "insert").drop(
                "_change_type"
            )
            touched = (
                ch.select(F.col(id_col)).distinct().localCheckpoint(
                    eager=False
                )
            )
            if not touched.take(1):
                pass  # pure churn: stamp below
            else:
                v = merge_into(
                    spark,
                    index_table,
                    touched,
                    [id_col],
                    when_matched="keep",
                    delete_when=F.lit(True),
                    insert=False,
                    extra={**info, **stamp},
                )
                if ins.take(1):
                    append = {
                        "sq8": sq8_append,
                        "ivf": ivf_append,
                        "ivfsq8": ivfsq8_append,
                    }[kind]
                    v = append(ins, index_table, extra_update=stamp)
                return v, "upsert_fold"
        else:
            return rebuild()
    # compact-only range or empty appends: nothing changed logically —
    # bump the stamp so future deltas keep composing from here
    empty = read_snapshot(spark, index_table).limit(0)
    return (
        _ws(empty, index_table, mode="append", extra={**info, **stamp}),
        "stamp",
    )
