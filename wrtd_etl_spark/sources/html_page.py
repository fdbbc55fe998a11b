"""HTML-page field extraction as column expressions (S1/S3, F7-F10).

Reference: functions.py:89-121 regex-extracts ten scalar fields from one
replay page, and functions.py:14-17 scans the listing page for
(replay_id, player_count) pairs. Spark has no HTTP source, so page bodies
arrive as a raw-text column (driver-side fetch or a fixture table) and the
extraction is ``regexp_extract`` / ``regexp_extract_all`` — JVM-side, so a
listing of millions of pages parallelizes for free.

Divergences, documented:
* tab/newline stripping (functions.py:99) is a pre-pass regexp_replace;
* ``html.unescape`` (functions.py:104) has no builtin — the common
  entities are handled with chained replaces (F10); the full entity table
  would be the engine's one genuine Python UDF, deliberately avoided in
  the hot path;
* the per-faction commander loop with an interpolated pattern
  (functions.py:106-107) becomes one ``format_string``-built pattern per
  side key, over the fixed EAST/WEST/GUER/CIV set with 'None' backfill
  (functions.py:110-113).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIDES = ("EAST", "WEST", "GUER", "CIV")

_COMMON_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&nbsp;": " ",
}


def strip_layout(col: Column) -> Column:
    """Remove tabs/newlines before matching (functions.py:99)."""
    return F.regexp_replace(col, r"[\t\n]", "")


def unescape_common(col: Column) -> Column:
    """Chained-replace HTML unescape for the common entities (F10)."""
    out = col
    for ent, ch in _COMMON_ENTITIES.items():
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _commander(html: Column, side: str) -> Column:
    # dynamic pattern interpolating the faction name (functions.py:106-107),
    # 'None' backfill for absent sides (functions.py:110-113)
    pat = (
        side
        + r'</span></th><td><div class="position-relative" data-toggle="current">'
        + r'<a href="/projects/wog-a3/players/\d+/">(.*?)</a>'
    )
    got = F.regexp_extract(html, pat, 1)
    return F.when(got == "", F.lit("None")).otherwise(got)


def parse_replay_page(df: DataFrame, html_col: str, replay_col: str) -> DataFrame:
    """Ten regex fields from a replay page (functions.py:101-119)."""
    h = strip_layout(F.col(html_col))
    return df.select(
        F.col(replay_col).alias("replay_number"),
        F.to_date(
            F.regexp_extract(h, r"от (.*?) / WOG Stats</title>", 1), "dd.MM.yyyy"
        ).alias("date"),
        F.regexp_extract(h, r'href="/missions/\d+/">(.*?)</a>', 1).alias(
            "name_mission"
        ),
        unescape_common(
            F.regexp_extract(h, r"<th>Остров</th><td>(.*?)</td>", 1)
        ).alias("island"),
        *[
            _commander(h, side).alias(f"commander_{side.lower()}")
            for side in SIDES
        ],
        F.regexp_extract(
            h, r'<th>Сторона-победитель</th><td><span style="color: #.*?">(.*?)</span></td>', 1
        ).alias("winner"),
        F.regexp_extract(
            h, r"<th>Количество игроков / слотов</th><td>.*? / (.*?)</td>", 1
        ).cast("long").alias("count_players_slots"),
        F.regexp_extract(
            h, r"<th>Количество игроков / слотов</th><td>(.*?) / .*?</td>", 1
        ).cast("long").alias("count_players_active"),
        F.regexp_extract(
            h, r"<th>Дата и время старта миссии</th><td>.*?, (.*?)</td>", 1
        ).alias("start_time"),
        F.regexp_extract(
            h, r"<th>Дата и время окончания миссии</th><td>.*?, (.*?)</td>", 1
        ).alias("end_time"),
        F.regexp_extract(h, r"<th>Длительность миссии</th><td>(.*?)</td>", 1).alias(
            "duration"
        ),
    )


def parse_listing(df: DataFrame, html_col: str) -> DataFrame:
    """Listing page → (replay_id, players) pairs (S3, functions.py:14-17).

    ``re.findall`` with two groups becomes regexp_extract_all per group
    over the stripped page, zipped positionally."""
    h = strip_layout(F.col(html_col))
    ids = F.regexp_extract_all(h, F.lit(r"/games/(\d+)/.*?(\d+) / \d+"), 1)
    players = F.regexp_extract_all(h, F.lit(r"/games/(\d+)/.*?(\d+) / \d+"), 2)
    zipped = F.zip_with(
        ids, players, lambda i, p: F.struct(i.alias("id"), p.alias("players"))
    )
    return df.select(F.explode(zipped).alias("z")).select(
        F.col("z.id").cast("long").alias("replay_id"),
        F.col("z.players").cast("long").alias("players"),
    )


def admitted_replays(listing: DataFrame, min_players: int = 99) -> DataFrame:
    """Admission filter ``players > 99`` (P5, functions.py:28)."""
    return listing.filter(F.col("players") > min_players)
