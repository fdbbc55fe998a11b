"""Python DataSource page source: executor-parallel S1/S3 backfill."""

from __future__ import annotations

import pytest

_PAGE = (
    "<title>Реплей от 05.10.2024 / WOG Stats</title>"
    '<a href="/missions/42/">Operation Test {n}</a>'
    "<th>Остров</th><td>Altis</td>"
    "<th>Сторона-победитель</th><td><span>EAST</span></td>"
    "<th>Количество игроков / слотов</th><td>120 / 150</td>"
    "<th>Дата и время старта миссии</th><td>сб, 19:05:00</td>"
    "<th>Дата и время окончания миссии</th><td>сб, 21:30:00</td>"
    "<th>Длительность миссии</th><td>2:25:00</td>"
)


@pytest.fixture
def dump(tmp_path):
    # pages 10..14 exist except 12 (the 404 analog)
    for n in (10, 11, 13, 14):
        (tmp_path / f"{n}.html").write_text(
            _PAGE.replace("{n}", str(n)), encoding="utf-8"
        )
    return str(tmp_path)


def _read(spark, dump, **opts):
    from wrtd_etl_spark.sources.datasource import ReplayPagesDataSource

    spark.dataSource.register(ReplayPagesDataSource)
    r = (
        spark.read.format("replay_pages")
        .option("start", "10")
        .option("end", "15")
        .option("transport", "file")
        .option("fixtureDir", dump)
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_reads_pages_and_skips_missing(spark, dump):
    df = _read(spark, dump)
    rows = {r.replay_number: r.body for r in df.collect()}
    assert set(rows) == {10, 11, 13, 14}  # 12 missing → skipped
    assert "Operation Test 13" in rows[13]


def test_partitioning_is_range_batched(spark, dump):
    df = _read(spark, dump, batchSize=2)
    # ranges [10,12) [12,14) [14,15): parallelism independent of files
    assert df.rdd.getNumPartitions() == 3


def test_missing_fail_mode_raises(spark, dump):
    df = _read(spark, dump, missing="fail")
    with pytest.raises(Exception, match="12"):
        df.collect()


def test_body_feeds_existing_parser(spark, dump):
    """The DataSource output is drop-in input for parse_replay_page —
    the executor-parallel fetch and the driver-side fetch converge on
    the same downstream column logic."""
    from wrtd_etl_spark.sources.html_page import parse_replay_page

    df = _read(spark, dump)
    parsed = parse_replay_page(df, "body", "replay_number")
    row = parsed.filter(parsed.replay_number == 10).collect()[0]
    assert row.name_mission == "Operation Test 10"
    assert row.count_players_active == 120
