"""Streaming observability: observed metrics + per-batch progress capture.

A 100 TB streaming pipeline is operated from its metrics, not its
output: rows in, rows silently dropped as too-late by the watermark,
and domain counters (nulls, rejects, per-source admission) per
micro-batch. Spark already computes all of this — ``Dataset.observe``
attaches arbitrary aggregate expressions to a plan edge at zero extra
pass (they ride the existing stage as accumulators), and every
micro-batch's ``StreamingQueryProgress`` carries the observed values
plus each stateful operator's ``numRowsDroppedByWatermark``. What the
API lacks is a convenient capture: listeners are fire-and-forget
callbacks. :class:`ProgressCapture` turns them into inspectable data.

Works for batch too: ``observe()`` on a batch frame pairs with
``pyspark.sql.Observation`` (tested), so the same metric expressions
instrument both executions of a pipeline.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming import StreamingQueryListener


def observe(df: DataFrame, name: str, metrics: dict[str, Column]) -> DataFrame:
    """Attach named aggregate metrics at this point of the plan.

    ``metrics`` values must be aggregate expressions over the frame
    (``F.count``, ``F.sum(F.when(...))`` …). The returned frame is
    row-identical; the metrics surface in ``StreamingQueryProgress
    .observedMetrics[name]`` (streaming) or an ``Observation`` object
    (batch — pass ``Observation(name)`` as ``name`` there instead of a
    string; this helper aliases each expression to its dict key either
    way)."""
    exprs = [c.alias(k) for k, c in metrics.items()]
    return df.observe(name, *exprs)


@dataclass
class BatchProgress:
    """One micro-batch's operational record, engine-agnostic values."""

    batch_id: int
    num_input_rows: int
    observed: dict[str, dict]  # observe-name -> {metric -> value}
    dropped_by_watermark: int  # summed over stateful operators
    watermark: str | None
    query_id: str | None = None  # StreamingQuery.id — disambiguates


@dataclass
class ProgressCapture(StreamingQueryListener):
    """A StreamingQueryListener that RECORDS instead of logging.

    Use as a context manager around query execution::

        with ProgressCapture(spark) as cap:
            run_streaming_query(...)
        late = sum(b.dropped_by_watermark for b in cap.batches)

    Listener callbacks arrive on a background thread — ``batches`` is
    lock-guarded and safe to read after the query stops (the context
    exit waits for nothing: Spark delivers progress synchronously with
    batch completion before ``awaitTermination`` returns)."""

    spark: object = None
    batches: list[BatchProgress] = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def __post_init__(self):
        super().__init__()

    def __enter__(self) -> "ProgressCapture":
        self.spark.streams.addListener(self)
        return self

    def __exit__(self, *exc) -> None:
        self.spark.streams.removeListener(self)

    # StreamingQueryListener interface -----------------------------------
    def onQueryStarted(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryProgress(self, event) -> None:
        # parse via the JSON form: stable across pyspark minor versions,
        # and values arrive as plain ints/strings (no Row unwrapping)
        p = json.loads(event.progress.json)
        dropped = sum(
            int(op.get("numRowsDroppedByWatermark", 0))
            for op in p.get("stateOperators", [])
        )
        rec = BatchProgress(
            batch_id=int(p["batchId"]),
            num_input_rows=int(p.get("numInputRows", 0)),
            observed=dict(p.get("observedMetrics", {})),
            dropped_by_watermark=dropped,
            watermark=(p.get("eventTime") or {}).get("watermark"),
            query_id=p.get("id"),
        )
        with self._lock:
            self.batches.append(rec)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - no-op
        pass

    # convenience --------------------------------------------------------
    # The listener is SESSION-GLOBAL: concurrent queries on the same
    # SparkSession all land in ``batches``. Pass ``query_id``
    # (StreamingQuery.id as a string) to scope a readout to one query —
    # without it, totals aggregate every query that progressed during
    # the capture window.
    def _scoped(self, query_id: str | None):
        return [
            b
            for b in self.batches
            if query_id is None or b.query_id == query_id
        ]

    def observed_total(
        self, name: str, metric: str, query_id: str | None = None
    ) -> int:
        """Sum one observed metric across captured batches."""
        with self._lock:
            return sum(
                int(b.observed[name][metric])
                for b in self._scoped(query_id)
                if name in b.observed
            )

    def total_dropped_by_watermark(self, query_id: str | None = None) -> int:
        with self._lock:
            return sum(
                b.dropped_by_watermark for b in self._scoped(query_id)
            )
