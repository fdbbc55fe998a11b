"""S1/S3 live-path fetch wrappers (network-mocked) and the S4 JDBC
round-trip (embedded Derby — the one JDBC driver the PySpark distribution
ships, so the test is real, not a stub; skips only if the jar is absent).
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources import fetch

_PAGE = (
    "<title>Реплей от 05.10.2024 / WOG Stats</title>"
    '<a href="/missions/42/">Operation Test</a>'
    "<th>Остров</th><td>Altis &amp; Stratis</td>"
    'EAST</span></th><td><div class="position-relative" data-toggle="current">'
    '<a href="/projects/wog-a3/players/7/">CmdrEast</a>'
    '<th>Сторона-победитель</th><td><span style="color: #a00">EAST</span></td>'
    "<th>Количество игроков / слотов</th><td>120 / 150</td>"
    "<th>Дата и время старта миссии</th><td>сб, 19:05:00</td>"
    "<th>Дата и время окончания миссии</th><td>сб, 21:30:00</td>"
    "<th>Длительность миссии</th><td>2:25:00</td>"
)


def test_fetch_replay_page_end_to_end(spark):
    """S1 from GET to parsed row, fully network-mocked (functions.py:89-121:
    fetch + strip + ten regex fields in one flow)."""
    calls = []

    def fake_get(url):
        calls.append(url)
        return "\t" + _PAGE.replace("</td>", "</td>\n")

    row = fetch.fetch_replay_page(spark, 3405, http_get=fake_get).collect()[0]
    assert calls == ["https://stats.wogames.info/games/3405/"]
    assert row.replay_number == 3405
    assert str(row.date) == "2024-10-05"
    assert row.winner == "EAST"
    assert row.commander_east == "CmdrEast" and row.commander_civ == "None"
    assert row.count_players_active == 120


def test_fetch_listing_end_to_end(spark):
    """S3 from GET to (replay_id, players) rows (functions.py:13-17)."""

    def fake_get(url):
        assert url == "https://stats.wogames.info/projects/wog-a3/games/"
        return (
            '<a href="/games/3405/">x</a> 120 / 150'
            '<a href="/games/3406/">y</a> 85 / 150'
        )

    got = {
        (r.replay_id, r.players)
        for r in fetch.fetch_listing(spark, http_get=fake_get).collect()
    }
    assert got == {(3405, 120), (3406, 85)}


def test_fetch_replay_json_text(spark):
    def fake_get(url):
        assert url == "https://stats.wogames.info/json/replay-data.json?game=7"
        return '{"factions": {}}'

    row = fetch.fetch_replay_json_text(spark, 7, http_get=fake_get).collect()[0]
    assert row.replay_number == 7 and row.body == '{"factions": {}}'


def test_is_404_title_check():
    """main.py:34-44: the site serves missing replays as HTTP 200 with an
    error title — the probe checks the title, and a transport error also
    counts as absent."""
    assert fetch.is_404(1, http_get=lambda u: "<title>Ошибка / WOG Stats</title>")
    assert not fetch.is_404(1, http_get=lambda u: _PAGE)

    def boom(url):
        raise OSError("no network")

    assert fetch.is_404(1, http_get=boom)


# --- S4: JDBC round-trip (functions.py:43-76) ------------------------------

_DERBY_AVAILABLE = any(
    j.startswith("derby") for j in os.listdir(
        os.path.join(
            os.path.dirname(__import__("pyspark").__file__), "jars"
        )
    )
)


@pytest.mark.skipif(not _DERBY_AVAILABLE, reason="no JDBC driver jar shipped")
def test_jdbc_round_trip(spark, tmp_path):
    """write_jdbc → read_jdbc against embedded Derby (in-JVM database):
    exercises the real spark.read/write.jdbc path the reference's psycopg2
    calls map to, with no external server."""
    from wrtd_etl_spark.sinks import read_jdbc, write_jdbc

    db_dir = f"/tmp/derby-{uuid.uuid4().hex}"
    url = f"jdbc:derby:{db_dir};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    try:
        write_jdbc(df, url, "t_round_trip", mode="overwrite", properties=props)
        back = read_jdbc(spark, url, "t_round_trip", properties=props)
        got = sorted((int(r[0]), int(r[1])) for r in back.collect())
        assert got == [(i, i * 10) for i in range(5)]

        # partitioned (parallel) read path: range-bounded query per
        # partition, same rows, >1 scan partition
        par = read_jdbc(
            spark, url, "t_round_trip", properties=props,
            partition_column="k", lower_bound=0, upper_bound=5,
            num_partitions=3,
        )
        assert par.rdd.getNumPartitions() == 3
        got_par = sorted((int(r[0]), int(r[1])) for r in par.collect())
        assert got_par == got
    finally:
        shutil.rmtree(db_dir, ignore_errors=True)
