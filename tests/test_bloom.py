"""Per-file bloom sketches (sources/bloom.py) + point_filter pruning:
membership lookups on columns a table is NOT clustered by — the prune
min/max stats cannot make, and the one that turns a CDC merge into a
few-file rewrite instead of a table rewrite."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.bloom import build, contains_any, token
from wrtd_etl_spark.sources.versioned import (
    files_for_read,
    history,
    manifest_info,
    merge_into,
    read_snapshot,
    write_snapshot,
)


def _scattered(spark, t, n=1000, files=8, bloom=True):
    """n keys hash-scattered over `files` files: every file's [min,max]
    spans ~the full key range, so range pruning keeps everything and
    only membership pruning can bite."""
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("v"),
        )
        .repartition(files, "k")
    )
    write_snapshot(
        df,
        t,
        stats_cols=["k"],
        bloom_cols=["k"] if bloom else None,
    )
    return df


def test_bloom_unit_membership_and_fpr():
    vals = list(range(0, 5000, 5))
    bl = build(vals)
    assert all(contains_any(bl, [v]) for v in vals)
    # absent keys: a 10-bits/key sketch should reject almost all
    misses = sum(contains_any(bl, [v]) for v in range(1, 5000, 5))
    assert misses < 50  # ~1% FPR at capacity, generous bound
    # cross-type consistency: 42 stored as float matches int lookup
    blf = build([float(v) for v in vals])
    assert contains_any(blf, [40]) and not contains_any(blf, [41])
    # strings and dates hash stably; dates == midnight timestamps
    assert token(datetime.date(2020, 1, 2)) == token(
        datetime.datetime(2020, 1, 2)
    )
    # unhashable lookup values can never prune
    assert contains_any(bl, [object()])
    # all-NULL / empty input records no bloom at all
    assert build([None, None]) is None and build([]) is None


def test_point_filter_prunes_scattered_keys(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _scattered(spark, t)
    want = [3, 411, 777]
    kept, total = files_for_read(t, point_filter={"k": want})
    assert total == 8
    # 3 keys live in ≤3 files; false positives may keep a couple more
    assert len(kept) <= 5, f"bloom pruning kept {len(kept)}/{total}"
    # range stats alone cannot prune this layout
    kept_range, _ = files_for_read(t, skip_filter={"k": (3, 777)})
    assert len(kept_range) == total
    got = read_snapshot(spark, t, point_filter={"k": want}).filter(
        F.col("k").isin(want)
    )
    assert sorted(r.k for r in got.collect()) == want


def test_point_filter_never_drops_present_keys(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _scattered(spark, t)
    for k in range(0, 1000, 37):
        got = read_snapshot(spark, t, point_filter={"k": [k]}).filter(
            F.col("k") == k
        )
        assert [r.k for r in got.collect()] == [k], f"lost key {k}"


def test_merge_point_prune_rewrites_few_files(spark, tmp_path):
    """The CDC shape: a 3-key update batch against an 8-file table whose
    key ranges all overlap. Range pruning rewrites everything; bloom
    membership pruning carries the untouched files forward by
    reference."""
    t = str(tmp_path / "tbl")
    _scattered(spark, t)
    before = set(files_for_read(t)[0])
    src = spark.createDataFrame(
        [(3, 100), (411, 100), (777, 100)], "k long, v long"
    )
    merge_into(spark, t, src, ["k"])
    after = set(files_for_read(t)[0])
    carried = before & after
    assert len(carried) >= 3, (
        f"merge rewrote {8 - len(carried)}/8 files for a 3-key batch"
    )
    got = {
        (r.k, r.v)
        for r in read_snapshot(spark, t)
        .filter(F.col("k").isin([3, 411, 777, 4]))
        .collect()
    }
    assert got == {(3, 100), (411, 100), (777, 100), (4, 4)}

    # control: without blooms the same merge rewrites every file
    t2 = str(tmp_path / "tbl2")
    _scattered(spark, t2, bloom=False)
    before2 = set(files_for_read(t2)[0])
    merge_into(spark, t2, src, ["k"])
    assert not (before2 & set(files_for_read(t2)[0]))


def test_append_and_rewrite_inherit_bloom_surface(spark, tmp_path):
    """Bloomed columns are a table property: a plain append re-blooms
    its new files, and a merge's replacement segment re-blooms too —
    point pruning keeps working across the whole lifecycle."""
    t = str(tmp_path / "tbl")
    _scattered(spark, t)
    write_snapshot(
        spark.createDataFrame([(5000, 1)], "k long, v long"),
        t,
        mode="append",
    )
    from wrtd_etl_spark.sources.versioned import (
        _read_manifest,
        _read_pointer,
        _segments,
    )

    segs = _segments(_read_manifest(t, _read_pointer(t)))
    assert all(
        "k" in fb for seg in segs for fb in seg.get("blooms", {}).values()
    )
    appended = segs[-1].get("blooms", {})
    assert appended, "append did not re-bloom its files"
    # the appended key is findable through the sketch
    kept, total = files_for_read(t, point_filter={"k": [5000]})
    assert len(kept) < total
    got = read_snapshot(spark, t, point_filter={"k": [5000]}).filter(
        F.col("k") == 5000
    )
    assert [r.v for r in got.collect()] == [1]

    merge_into(
        spark,
        t,
        spark.createDataFrame([(3, 9)], "k long, v long"),
        ["k"],
    )
    rewritten = _segments(_read_manifest(t, _read_pointer(t)))[-1]
    assert rewritten.get("blooms"), "rewrite dropped the bloom surface"
    assert history(t)[0]["mode"] == "merge"


def test_compact_preserves_blooms(spark, tmp_path):
    from wrtd_etl_spark.sources.versioned import compact

    t = str(tmp_path / "tbl")
    _scattered(spark, t)
    compact(spark, t, target_files=4)
    from wrtd_etl_spark.sources.versioned import (
        _read_manifest,
        _read_pointer,
        _segments,
    )

    m = _read_manifest(t, _read_pointer(t))
    assert m["mode"] == "compact"
    assert all(
        "k" in fb
        for seg in _segments(m)
        for fb in seg.get("blooms", {}).values()
    ), "compaction dropped the bloom surface"
    got = read_snapshot(spark, t, point_filter={"k": [411]}).filter(
        F.col("k") == 411
    )
    assert [r.k for r in got.collect()] == [411]


def test_datasource_point_filter_and_in_pushdown(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo, In

    from wrtd_etl_spark.sources.versioned_table import (
        VersionedTablePushdownReader,
        VersionedTableReader,
        read_versioned,
    )

    t = str(tmp_path / "tbl")
    _scattered(spark, t)

    full = VersionedTableReader({"path": t})
    pruned = VersionedTableReader(
        {"path": t, "point_filter": '{"k": [3, 411]}'}
    )
    assert len(pruned.partitions()) < len(full.partitions())

    # Catalyst `k IN (...)` / `k = ?` reach the blooms through pushFilters
    r = VersionedTablePushdownReader({"path": t})
    r.pushFilters([In(("k",), (3, 411))])
    assert sorted(r.point_filter["k"]) == [3, 411]
    assert len(r.partitions()) < 8
    r2 = VersionedTablePushdownReader({"path": t})
    r2.pushFilters([EqualTo(("k",), 3), In(("k",), (3, 411))])
    assert r2.point_filter["k"] == [3]  # ANDed conjuncts intersect

    got = read_versioned(spark, t, point_filter={"k": [3, 411]}).filter(
        F.col("k").isin([3, 411])
    )
    assert sorted(row.k for row in got.collect()) == [3, 411]


def test_point_filter_with_unstatted_column_keeps_all(spark, tmp_path):
    """A point filter on a column with neither stats nor blooms must
    never prune (semantic safety)."""
    t = str(tmp_path / "tbl")
    _scattered(spark, t)
    kept, total = files_for_read(t, point_filter={"v": [2]})
    assert len(kept) == total


def test_bloom_decimal_exact_int_tokens():
    """Integral decimals hash as EXACT ints (no float64 fold): a
    decimal(18,0) snowflake ID >= 2**53 must match its int lookup
    (regression: the float fold collapsed 2**53+1 -> 2**53, a bloom
    false NEGATIVE breaking the 'pruning is never semantic' contract).
    The double-image token keeps double-cast lookups matching too."""
    import decimal

    D = decimal.Decimal
    bl = build([D(2**53 + 1), D(5), D("12345678901234567890")])
    assert contains_any(bl, [2**53 + 1])  # exact int lookup
    assert contains_any(bl, [D(2**53 + 1)])  # exact decimal lookup
    assert contains_any(bl, [12345678901234567890])
    assert not contains_any(bl, [2**53 + 2])  # neighbours still prune
    # Spark `dec_col = <double literal>` casts the DECIMAL to double —
    # the double-image token must keep the file
    assert contains_any(bl, [float(2**53 + 1)])
    # a double column storing an ambiguous integral float vs an int
    # lookup sharing its double image (bigint = double-cast semantics)
    blf = build([float(2**53)])
    assert contains_any(blf, [2**53]) and contains_any(blf, [2**53 + 1])
    # non-integral decimal whose double image is integral (rounds to
    # 2**52): integer-typed lookups of that double still find the file
    bl5 = build([D("4503599627370496.5")])
    assert contains_any(bl5, [4503599627370496])
    # scale-invariance across decimal(p,s) widening is preserved
    assert contains_any(build([D("0.10")]), [D("0.1")])
    assert not contains_any(build([D("0.10")]), [D("0.2")])
