"""Streaming per-source admission quota — the streaming twin of the
batch ``per_source_cap`` domain balancer.

A continuously ingesting corpus can't cap sources with a window over
history (the history is unbounded); admission control needs exactly one
counter per source that survives micro-batches: keyed state holding the
admitted count, first-come-first-served until the cap binds, O(1) state
per key regardless of stream length. Within a micro-batch, admission
order is ``doc_id`` (sorted per batch) so replays of the same batch
sequence are deterministic; across batches it is arrival order — the
streaming contract (the batch query's hash-order sample is the right
tool when the corpus is at rest).

Two implementations of the same semantics:

* :func:`cap_per_source_stream` — ``applyInPandasWithState`` (GroupState
  holding one count), the primary, tested path;
* :class:`SourceQuotaProcessor` / :func:`cap_per_source_stream_tws` —
  the same operator on Spark 4's newer ``transformWithStateInPandas``
  arbitrary-state API. Its Python worker requires ``google.protobuf``
  at runtime (absent in this container, so the pytest for this variant
  skips itself); the code path is the forward surface for environments
  that have it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupStateTimeout

OUT_SCHEMA = "doc_id long, source string, n_chars long"
_STATE_SCHEMA = "n long"


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet (FileStreamSource wants a
    directory; the glob selects the one table)."""
    from ..session import configure

    configure(spark)
    schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def cap_per_source_stream(docs: DataFrame, cap: int) -> DataFrame:
    """(doc_id, source, n_chars) of admitted documents, ≤ ``cap`` per
    source over the whole stream lifetime (``applyInPandasWithState``)."""

    def fn(key, batches: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in batches:
            if n >= cap:
                break  # quota exhausted: drop the rest
            take = min(cap - n, len(pdf))
            out = pdf.sort_values("doc_id").head(take)
            n += take
            yield out[["doc_id", "source", "n_chars"]]
        state.update((n,))

    return (
        docs.select("doc_id", "source", "n_chars")
        .groupBy("source")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


try:  # newer API: importable wherever pyspark 4 is, runnable with protobuf
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SourceQuotaProcessor(StatefulProcessor):
        """Admit at most ``cap`` documents per source across batches."""

        def __init__(self, cap: int):
            self.cap = cap

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.admitted = handle.getValueState("admitted", _STATE_SCHEMA)

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            n = self.admitted.get()[0] if self.admitted.exists() else 0
            for pdf in rows:
                if n >= self.cap:
                    break
                take = min(self.cap - n, len(pdf))
                out = pdf.sort_values("doc_id").head(take)
                n += take
                yield out[["doc_id", "source", "n_chars"]]
            self.admitted.update((n,))

        def close(self) -> None:
            pass

    def cap_per_source_stream_tws(docs: DataFrame, cap: int) -> DataFrame:
        """Same contract as :func:`cap_per_source_stream` on the
        ``transformWithStateInPandas`` API (requires the RocksDB state
        store provider and a working ``google.protobuf``)."""
        return (
            docs.select("doc_id", "source", "n_chars")
            .groupBy("source")
            .transformWithStateInPandas(
                statefulProcessor=SourceQuotaProcessor(cap),
                outputStructType=OUT_SCHEMA,
                outputMode="append",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover — pyspark without the 4.x API
    SourceQuotaProcessor = None  # type: ignore[assignment]
    cap_per_source_stream_tws = None  # type: ignore[assignment]
