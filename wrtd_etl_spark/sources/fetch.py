"""Driver-side HTTP fetch → one-row DataFrames (S1/S3/S6 live path).

Spark has no HTTP source, so the fetch step is a driver-side GET whose
body lands in a raw-text column; everything downstream (regex field
extraction, JSON flattening) is the JVM-side column logic in
``sources.html_page`` / ``sources.json_ingest`` and parallelizes over
however many pages are fetched.

Reference URLs and flow:
* replay page      — functions.py:95-99 (``stats.wogames.info/games/{n}/``)
* listing page     — functions.py:13-16
* action-log JSON  — functions.py:136-137 (``/json/replay-data.json?game=n``)
* 404 probe        — main.py:34-44 (error-title check on the replay page)

``http_get`` is injectable so tests run fully network-mocked (this
sandbox has no egress); the default uses ``requests`` when present.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

from .html_page import parse_listing, parse_replay_page

BASE_URL = "https://stats.wogames.info"
ERROR_TITLE = "<title>Ошибка / WOG Stats</title>"

HttpGet = Callable[[str], str]


def _default_http_get(url: str) -> str:  # pragma: no cover - needs network
    import requests

    resp = requests.get(url, timeout=30)
    resp.raise_for_status()
    return resp.text


def replay_url(replay_number: int) -> str:
    """functions.py:95 — the replay page for one mission."""
    return f"{BASE_URL}/games/{replay_number}/"


def listing_url() -> str:
    """functions.py:13 — the all-replays index page."""
    return f"{BASE_URL}/projects/wog-a3/games/"


def json_url(replay_number: int) -> str:
    """functions.py:136 — the action-log JSON document."""
    return f"{BASE_URL}/json/replay-data.json?game={replay_number}"


def _text_df(
    spark: SparkSession, rows: Iterable[tuple[int, str]]
) -> DataFrame:
    return spark.createDataFrame(list(rows), "replay_number long, body string")


def fetch_replay_pages(
    spark: SparkSession,
    replay_numbers: Iterable[int],
    http_get: HttpGet | None = None,
) -> DataFrame:
    """S1 end-to-end: GET each replay page and parse the ten fields
    (functions.py:89-121). One driver-side GET per page; the parse is
    distributed column logic, so a large backlog scales with executors."""
    get = http_get or _default_http_get
    raw = _text_df(spark, ((n, get(replay_url(n))) for n in replay_numbers))
    return parse_replay_page(raw, "body", "replay_number")


def fetch_replay_page(
    spark: SparkSession, replay_number: int, http_get: HttpGet | None = None
) -> DataFrame:
    """Single-replay convenience wrapper (the reference's unit of work)."""
    return fetch_replay_pages(spark, [replay_number], http_get)


def fetch_listing(
    spark: SparkSession, http_get: HttpGet | None = None
) -> DataFrame:
    """S3 end-to-end: GET the listing page → (replay_id, players) rows
    (functions.py:13-17)."""
    get = http_get or _default_http_get
    raw = _text_df(spark, [(0, get(listing_url()))])
    return parse_listing(raw, "body")


def fetch_replay_json_text(
    spark: SparkSession, replay_number: int, http_get: HttpGet | None = None
) -> DataFrame:
    """S2 fetch step: the raw action-log JSON body as a one-row DataFrame
    (functions.py:124-137); flattening lives in ``sources.json_ingest``."""
    get = http_get or _default_http_get
    return _text_df(spark, [(replay_number, get(json_url(replay_number)))])


def is_404(replay_number: int, http_get: HttpGet | None = None) -> bool:
    """main.py:34-44 — the reference's existence probe: the stats site
    serves missing replays as a page titled «Ошибка» (HTTP 200), so the
    check is on the title, not the status code."""
    get = http_get or _default_http_get
    try:
        body = get(replay_url(replay_number))
    except Exception:
        return True
    return ERROR_TITLE in body
