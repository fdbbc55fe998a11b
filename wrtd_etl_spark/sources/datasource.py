"""Executor-parallel page source: a Python DataSource (public pyspark≥4
API) for the reference's replay pages — S1/S3 at backfill scale.

``sources/fetch.py`` fetches on the DRIVER: right for the reference's
one-page-at-a-time poll cadence (functions.py:89-121), wrong for a
backfill of 10⁶ historical pages, where the driver becomes a serial
HTTP client in front of 1000 idle executors. This source moves the
fetch into executor tasks: replay numbers are range-partitioned into
batches (one ``InputPartition`` each, so parallelism = number of
batches, independent of file splits), each task fetches its own pages,
and the rows land as the same ``(replay_number, body)`` shape the
driver-side path produces — downstream parsing is the unchanged
``parse_replay_page`` column logic.

Transports:

* ``http`` — ``requests`` GET against the reference's public URL shape
  (fetch.replay_url); needs egress, so tests never use it;
* ``file`` — ``{fixtureDir}/{n}.html`` per page: hermetic tests and the
  offline-mirror workflow (a crawler dump re-ingested at scale).

A missing page yields no row (the 404 analog: the reference skips
missing replays, main.py:34-44) unless ``missing=fail``.

Usage::

    spark.dataSource.register(ReplayPagesDataSource)
    df = (spark.read.format("replay_pages")
          .option("start", "3400").option("end", "3500")
          .option("transport", "file").option("fixtureDir", dump)
          .load())
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class PageRange(InputPartition):
    """One executor task's batch of replay numbers: [start, end)."""

    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class ReplayPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.start = int(options.get("start", "1"))
        self.end = int(options["end"])  # exclusive
        self.batch = int(options.get("batchSize", "64"))
        self.transport = options.get("transport", "http")
        self.fixture_dir = options.get("fixtureDir")
        self.missing = options.get("missing", "skip")
        if self.transport not in ("http", "file"):
            raise ValueError(f"transport must be http|file: {self.transport}")
        if self.transport == "file" and not self.fixture_dir:
            raise ValueError("transport=file requires fixtureDir")

    def partitions(self) -> list[PageRange]:
        return [
            PageRange(s, min(s + self.batch, self.end))
            for s in range(self.start, self.end, self.batch)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        # runs on the EXECUTOR — one sequential fetch loop per batch;
        # total concurrency is the number of partitions
        for n in range(partition.start, partition.end):
            body = self._get(n)
            if body is None:
                if self.missing == "fail":
                    raise FileNotFoundError(f"replay page {n} missing")
                continue
            yield (n, body)

    def _get(self, n: int) -> str | None:
        if self.transport == "file":
            path = os.path.join(self.fixture_dir, f"{n}.html")
            if not os.path.exists(path):
                return None
            with open(path, encoding="utf-8") as f:
                return f.read()
        from .fetch import ERROR_TITLE, replay_url  # lazy: executor import

        import requests  # pragma: no cover — needs egress

        resp = requests.get(replay_url(n), timeout=30)
        resp.raise_for_status()
        return None if ERROR_TITLE in resp.text else resp.text


class ReplayPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "replay_pages"

    def schema(self) -> str:
        return "replay_number long, body string"

    def reader(self, schema) -> ReplayPagesReader:
        return ReplayPagesReader(self.options)
