"""SQL DML/DDL front-end (sources/versioned_sql.py, VERDICT r10 ask #1):
MERGE / UPDATE / DELETE / ALTER strings route to the existing Python
implementations — parity with the Python API on every path, including
refusals. The reference's own upsert surface is SQL DML
(reference functions.py:178-183)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wrtd_etl_spark.sources.versioned import (
    latest_version,
    merge_into,
    read_snapshot,
    write_snapshot,
)
from wrtd_etl_spark.sources.versioned_sql import (
    register_table,
    versioned_sql,
)


def _seed(spark, t):
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}", float(i)) for i in range(10)],
            "k long, v string, x double",
        ),
        t,
        stats_cols=["k"],
    )


def _state(spark, t):
    return {
        (r.k, r.v, r.x) for r in read_snapshot(spark, t).collect()
    }


def test_sql_merge_parity_with_python_api(spark, tmp_path):
    """UPDATE SET + INSERT * MERGE through SQL ≡ merge_into on a twin."""
    t_sql = str(tmp_path / "t_sql")
    t_py = str(tmp_path / "t_py")
    _seed(spark, t_sql)
    _seed(spark, t_py)
    src = spark.createDataFrame(
        [(5, "UPD", 5.5), (100, "NEW", 1.0)], "k long, v string, x double"
    )
    src.createOrReplaceTempView("merge_src")
    v = versioned_sql(
        spark,
        """MERGE INTO t AS t USING merge_src AS s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v, x = s.x
           WHEN NOT MATCHED THEN INSERT *""",
        tables={"t": t_sql},
    )
    merge_into(spark, t_py, src, ["k"], when_matched={"v": "v", "x": "x"})
    assert v == latest_version(t_sql)
    assert _state(spark, t_sql) == _state(spark, t_py)
    assert (5, "UPD", 5.5) in _state(spark, t_sql)
    assert (100, "NEW", 1.0) in _state(spark, t_sql)


def test_sql_merge_set_star_delete_and_subquery_source(spark, tmp_path):
    """SET * (replace), WHEN MATCHED AND op='D' THEN DELETE, and a
    parenthesized USING subquery — the CDC-apply statement shape."""
    t = str(tmp_path / "tbl")
    _seed(spark, t)
    spark.createDataFrame(
        [(1, "one", 1.5, "U"), (2, None, None, "D"), (200, "two", 2.0, "U")],
        "k long, v string, x double, op string",
    ).createOrReplaceTempView("cdc_src")
    versioned_sql(
        spark,
        """MERGE INTO tbl USING (
             SELECT k, v, x, op FROM cdc_src
           ) s ON tbl.k = s.k
           WHEN MATCHED AND s.op = 'D' THEN DELETE
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT (k, v, x, op) VALUES (k, v, x, op)""",
        tables={"tbl": t},
    )
    got = _state(spark, t)
    assert (1, "one", 1.5) in got
    assert not any(r[0] == 2 for r in got)  # deleted
    assert (200, "two", 2.0) in got


def test_sql_merge_not_matched_by_source(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t)
    spark.createDataFrame(
        [(3, "keep3", 3.0)], "k long, v string, x double"
    ).createOrReplaceTempView("dim_snap")
    versioned_sql(
        spark,
        """MERGE INTO tbl t USING dim_snap s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *
           WHEN NOT MATCHED BY SOURCE THEN DELETE""",
        tables={"tbl": t},
    )
    assert _state(spark, t) == {(3, "keep3", 3.0)}


def test_sql_update_delete_where(spark, tmp_path):
    """UPDATE with full-expression SET + WHERE; DELETE FROM; alias
    stripping; registered-name resolution."""
    t = str(tmp_path / "tbl")
    _seed(spark, t)
    register_table("sql_dml_t", t)
    versioned_sql(spark, "UPDATE sql_dml_t SET x = x * 2 WHERE k < 3")
    got = {r.k: r.x for r in read_snapshot(spark, t).collect()}
    assert got[1] == 2.0 and got[2] == 4.0 and got[5] == 5.0
    versioned_sql(
        spark, "DELETE FROM sql_dml_t AS u WHERE u.k >= 8 OR u.v = 'v0'"
    )
    assert {r.k for r in read_snapshot(spark, t).collect()} == set(range(1, 8))


def test_sql_alter_lifecycle(spark, tmp_path):
    """ADD COLUMN w/ DEFAULT, type widening, CLUSTER BY, constraints,
    DROP COLUMN — each a metadata commit through the SQL surface."""
    from wrtd_etl_spark.sources.versioned import _read_manifest_root

    t = str(tmp_path / "tbl")
    _seed(spark, t)
    versioned_sql(
        spark,
        "ALTER TABLE tbl ADD COLUMN score double DEFAULT 5",
        tables={"tbl": t},
    )
    assert read_snapshot(spark, t).filter(F.col("score") == 5.0).count() == 10
    versioned_sql(
        spark,
        "ALTER TABLE tbl ADD COLUMNS (amt decimal(10,2), tag string)",
        tables={"tbl": t},
    )
    versioned_sql(
        spark,
        "ALTER TABLE tbl ALTER COLUMN amt TYPE decimal(14,2)",
        tables={"tbl": t},
    )
    assert dict(read_snapshot(spark, t).dtypes)["amt"] == "decimal(14,2)"
    versioned_sql(spark, "ALTER TABLE tbl CLUSTER BY (k)", tables={"tbl": t})
    m = _read_manifest_root(t, latest_version(t))
    assert m["layout"]["by"] == ["k"]
    versioned_sql(
        spark,
        "ALTER TABLE tbl ADD CONSTRAINT pos_x CHECK (x >= 0)",
        tables={"tbl": t},
    )
    with pytest.raises(Exception, match="pos_x|CHECK|quarantine|violat"):
        versioned_sql(
            spark, "UPDATE tbl SET x = -1 WHERE k = 5", tables={"tbl": t}
        )
    versioned_sql(
        spark, "ALTER TABLE tbl DROP CONSTRAINT pos_x", tables={"tbl": t}
    )
    versioned_sql(
        spark, "ALTER TABLE tbl DROP COLUMN tag", tables={"tbl": t}
    )
    assert "tag" not in read_snapshot(spark, t).columns
    versioned_sql(
        spark, "ALTER TABLE tbl RENAME COLUMN amt TO amount",
        tables={"tbl": t},
    )
    assert "amount" in read_snapshot(spark, t).columns
    assert "amt" not in read_snapshot(spark, t).columns


def test_sql_unique_constraint_and_path_target(spark, tmp_path):
    """ADD CONSTRAINT UNIQUE routes; backtick-quoted PATH targets work
    without any registration."""
    t = str(tmp_path / "tbl")
    _seed(spark, t)
    versioned_sql(
        spark, f"ALTER TABLE `{t}` ADD CONSTRAINT uk UNIQUE (k)"
    )
    with pytest.raises(Exception, match="uk|unique|UNIQUE|duplicate"):
        write_snapshot(
            spark.createDataFrame([(5, "dup", 0.0)], "k long, v string, x double"),
            t,
            mode="append",
        )
    versioned_sql(spark, f"ALTER TABLE `{t}` DROP CONSTRAINT uk")


def test_sql_dv_strategy_passthrough(spark, tmp_path):
    """strategy='dv' routes to the merge-on-read plan: the DELETE
    commits a deletion vector, no data rewrite."""
    from wrtd_etl_spark.sources.versioned import _read_manifest_root

    t = str(tmp_path / "tbl")
    _seed(spark, t)
    versioned_sql(
        spark, "DELETE FROM tbl WHERE k = 4", tables={"tbl": t},
        strategy="dv",
    )
    m = _read_manifest_root(t, latest_version(t))
    assert m["mode"] in ("delete_dv", "dv", "delete")  # dv-flavored commit
    assert not any(r.k == 4 for r in read_snapshot(spark, t).collect())


def test_sql_refusals(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _seed(spark, t)
    spark.createDataFrame(
        [(1, "a", 0.0)], "k long, v string, x double"
    ).createOrReplaceTempView("r_src")
    with pytest.raises(ValueError, match="unknown versioned table"):
        versioned_sql(spark, "DELETE FROM nowhere WHERE k = 1")
    with pytest.raises(ValueError, match="unsupported statement"):
        versioned_sql(
            spark, "GRANT SELECT ON tbl TO alice", tables={"tbl": t}
        )
    with pytest.raises(ValueError, match="equi-join"):
        versioned_sql(
            spark,
            """MERGE INTO tbl t USING r_src s ON t.k > s.k
               WHEN MATCHED THEN UPDATE SET *""",
            tables={"tbl": t},
        )
    with pytest.raises(ValueError, match="SOURCE COLUMNS only"):
        versioned_sql(
            spark,
            """MERGE INTO tbl t USING r_src s ON t.k = s.k
               WHEN MATCHED THEN UPDATE SET v = upper(s.v)""",
            tables={"tbl": t},
        )
    with pytest.raises(ValueError, match="conditional WHEN NOT MATCHED"):
        versioned_sql(
            spark,
            """MERGE INTO tbl t USING r_src s ON t.k = s.k
               WHEN NOT MATCHED AND s.x > 0 THEN INSERT *""",
            tables={"tbl": t},
        )
    with pytest.raises(ValueError, match="not a lossless widening"):
        versioned_sql(
            spark,
            "ALTER TABLE tbl ALTER COLUMN k TYPE int",
            tables={"tbl": t},
        )
    # quoted string containing keywords must not confuse the clause
    # splitter
    versioned_sql(
        spark,
        "UPDATE tbl SET v = 'WHEN MATCHED THEN , WHERE' WHERE k = 1",
        tables={"tbl": t},
    )
    assert (
        read_snapshot(spark, t).filter(F.col("k") == 1).head().v
        == "WHEN MATCHED THEN , WHERE"
    )


def test_sql_insert_create_optimize_vacuum_history(spark, tmp_path):
    """r11 batch 2: the rest of the Delta-user surface — CTAS, INSERT
    INTO/OVERWRITE (SELECT and VALUES forms), OPTIMIZE, VACUUM,
    DESCRIBE HISTORY — each routed to the audited implementation."""
    import os

    t = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, f"s{i}") for i in range(20)], "k long, s string"
    ).createOrReplaceTempView("ctas_src")
    v = versioned_sql(
        spark,
        "CREATE TABLE t AS SELECT k, s FROM ctas_src WHERE k < 10",
        tables={"t": t},
    )
    assert v == 0 and read_snapshot(spark, t).count() == 10
    with pytest.raises(ValueError, match="already exists"):
        versioned_sql(
            spark, "CREATE TABLE t AS SELECT * FROM ctas_src",
            tables={"t": t},
        )
    versioned_sql(
        spark,
        "INSERT INTO t SELECT k, s FROM ctas_src WHERE k >= 10",
        tables={"t": t},
    )
    assert read_snapshot(spark, t).count() == 20
    versioned_sql(
        spark,
        "INSERT INTO t (k, s) VALUES (100, 'x'), (101, CAST(NULL AS STRING))",
        tables={"t": t},
    )
    got = {r.k: r.s for r in read_snapshot(spark, t).collect()}
    assert got[100] == "x" and got[101] is None and len(got) == 22
    # bare VALUES takes the table's column order
    versioned_sql(
        spark, "INSERT INTO t VALUES (200, 'y')", tables={"t": t}
    )
    assert read_snapshot(spark, t).count() == 23
    # OPTIMIZE bin-packs the 4-commit small-file tail into fewer files
    from wrtd_etl_spark.sources.versioned import files_for_read

    n_before = len(files_for_read(t)[0])
    versioned_sql(spark, "OPTIMIZE t", tables={"t": t})
    assert len(files_for_read(t)[0]) < n_before
    assert read_snapshot(spark, t).count() == 23
    # VACUUM reclaims the pre-compaction files
    # the default age floor protects in-flight writers: fresh files stay
    assert versioned_sql(spark, "VACUUM t RETAIN 1 VERSIONS", tables={"t": t}) == 0
    reclaimed = versioned_sql(
        spark, "VACUUM t RETAIN 1 VERSIONS RETAIN 0 HOURS", tables={"t": t}
    )
    assert isinstance(reclaimed, int) and reclaimed > 0
    assert read_snapshot(spark, t).count() == 23
    # DESCRIBE HISTORY returns the commit log as a DataFrame
    hist = versioned_sql(spark, "DESCRIBE HISTORY t", tables={"t": t})
    modes = [r.mode for r in hist.orderBy("version").collect()]
    assert modes[0] == "overwrite" and "compact" in modes
    assert hist.columns == [
        "version", "mode", "parent", "n_files", "committed_at", "metrics",
    ]
    # INSERT OVERWRITE replaces the table contents atomically
    versioned_sql(
        spark,
        "INSERT OVERWRITE t SELECT k, s FROM ctas_src WHERE k < 3",
        tables={"t": t},
    )
    assert read_snapshot(spark, t).count() == 3
    assert os.path.isdir(t)


def test_sql_replace_where_restore_truncate(spark, tmp_path):
    """r11 batch 3: INSERT ... REPLACE WHERE (atomic slice backfill),
    RESTORE TABLE (version + timestamp forms), TRUNCATE TABLE."""
    t = str(tmp_path / "tbl")
    _seed(spark, t)  # v0: k in 0..9
    spark.createDataFrame(
        [(k, f"bf{k}", 0.5) for k in range(3, 6)],
        "k long, v string, x double",
    ).createOrReplaceTempView("backfill_src")
    versioned_sql(
        spark,
        "INSERT INTO tbl REPLACE WHERE k >= 3 AND k <= 5 "
        "SELECT * FROM backfill_src",
        tables={"tbl": t},
    )
    got = {r.k: r.v for r in read_snapshot(spark, t).collect()}
    assert got[3] == "bf3" and got[4] == "bf4" and got[0] == "v0"
    assert len(got) == 10
    # nonconforming replacement rows refuse (Delta's replaceWhere check)
    with pytest.raises(Exception, match="match|satisf|conform"):
        versioned_sql(
            spark,
            "INSERT INTO tbl REPLACE WHERE k = 3 SELECT * FROM backfill_src",
            tables={"tbl": t},
        )
    v_after_backfill = latest_version(t)
    versioned_sql(spark, "TRUNCATE TABLE tbl", tables={"tbl": t})
    assert read_snapshot(spark, t).count() == 0
    assert read_snapshot(spark, t).columns == ["k", "v", "x"]
    versioned_sql(
        spark,
        f"RESTORE TABLE tbl TO VERSION AS OF {v_after_backfill}",
        tables={"tbl": t},
    )
    assert read_snapshot(spark, t).count() == 10
    # timestamp restore: anything >= now resolves to the latest commit
    import datetime

    ts = datetime.datetime.now(datetime.timezone.utc) + datetime.timedelta(
        minutes=5
    )
    versioned_sql(
        spark,
        f"RESTORE TABLE tbl TO TIMESTAMP AS OF '{ts.isoformat()}'",
        tables={"tbl": t},
    )
    assert read_snapshot(spark, t).count() == 10


def test_sql_where_bounds_prune_files(spark, tmp_path):
    """r11: SQL UPDATE/DELETE derive prune/point bounds from WHERE
    conjuncts (the data skipping Delta applies automatically), so the
    SQL surface inherits the Python API's file pruning — proven by
    inode stability of the untouched clustered files. OR predicates
    and type-unsound literals drop the bounds (correctness first)."""
    import os

    from wrtd_etl_spark.sources.versioned import files_for_read

    t = str(tmp_path / "tbl")
    write_snapshot(
        spark.createDataFrame(
            [(i, float(i)) for i in range(1000)], "k long, x double"
        ),
        t,
        layout_by=["k"],
        layout_files=4,
        stats_cols=["k"],
    )
    files0 = {
        f: os.path.getmtime(os.path.join(t, f)) for f in files_for_read(t)[0]
    }
    assert len(files0) >= 4
    versioned_sql(
        spark, "UPDATE tbl SET x = -1 WHERE k >= 10 AND k <= 20",
        tables={"tbl": t},
    )
    files1 = {
        f: os.path.getmtime(os.path.join(t, f)) for f in files_for_read(t)[0]
    }
    untouched = set(files0) & set(files1)
    # the three files whose k-range can't intersect [10, 20] carried
    assert len(untouched) >= 3
    assert all(files1[f] == files0[f] for f in untouched)
    got = {r.k: r.x for r in read_snapshot(spark, t).collect()}
    assert got[15] == -1.0 and got[500] == 500.0
    # BETWEEN + equality forms prune too
    versioned_sql(
        spark, "DELETE FROM tbl WHERE k BETWEEN 990 AND 999",
        tables={"tbl": t},
    )
    assert read_snapshot(spark, t).count() == 990
    files2 = {
        f: os.path.getmtime(os.path.join(t, f)) for f in files_for_read(t)[0]
    }
    assert len(set(files1) & set(files2)) >= 3
    # top-level OR: no pruning derived, results still exact
    versioned_sql(
        spark, "DELETE FROM tbl WHERE k = 0 OR k = 989", tables={"tbl": t}
    )
    assert read_snapshot(spark, t).count() == 988
    # non-ISO string literal on a date column: bound DROPPED (not
    # mis-applied) — every matching row still updates
    t2 = str(tmp_path / "tbl2")
    write_snapshot(
        spark.createDataFrame(
            [(i, f"2021-0{1 + i % 9}-15") for i in range(9)],
            "k long, ds string",
        ).selectExpr("k", "CAST(ds AS DATE) AS d"),
        t2,
        stats_cols=["d"],
    )
    versioned_sql(
        spark,
        "DELETE FROM t2 WHERE d >= '2021-5-1'",  # non-normalized literal
        tables={"t2": t2},
    )
    assert read_snapshot(spark, t2).count() == 4  # months 1-4 remain


def test_sql_describe_detail_and_script(spark, tmp_path):
    """DESCRIBE DETAIL returns the table summary as one DataFrame row;
    versioned_sql_script runs ;-separated statements in order (';'
    inside string literals never splits)."""
    from wrtd_etl_spark.sources.versioned_sql import versioned_sql_script

    t = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(i, f"s{i}") for i in range(8)], "k long, s string"
    ).createOrReplaceTempView("script_src")
    results = versioned_sql_script(
        spark,
        """
        CREATE TABLE t AS SELECT k, s FROM script_src;
        ALTER TABLE t ADD COLUMN note string DEFAULT 'a;b';
        UPDATE t SET s = 'x;y' WHERE k = 1;
        DELETE FROM t WHERE k >= 6;
        """,
        tables={"t": t},
    )
    assert results == [0, 1, 2, 3]  # four commits, in order
    got = {r.k: (r.s, r.note) for r in read_snapshot(spark, t).collect()}
    assert got[1] == ("x;y", "a;b") and len(got) == 6
    detail = versioned_sql(spark, "DESCRIBE DETAIL t", tables={"t": t})
    row = detail.head()
    assert row.version == 3 and row.num_files >= 1
    assert "note" in row.defaults and row.dv_rows == 0


def test_sql_advice_r11_fixes(spark, tmp_path):
    """ADVICE r11: leading-whitespace UPDATE parses; alias stripping
    skips string literals; MERGE DELETE conditions reject unqualified
    non-source references instead of silently binding to the source."""
    t = str(tmp_path / "t")
    _seed(spark, t)

    # (1) triple-quoted statement shape: leading newline before UPDATE
    versioned_sql(
        spark,
        """
        UPDATE t AS d SET v = 'up' WHERE d.k = 3
        """,
        tables={"t": t},
    )
    assert (3, "up", 3.0) in _state(spark, t)

    # (2) the alias prefix inside a string literal is DATA: with alias
    # d, 'd. foo' must not become 'foo' (which would match row 7)
    versioned_sql(
        spark,
        "UPDATE t AS d SET v = 'd. foo' WHERE d.k = 7",
        tables={"t": t},
    )
    versioned_sql(
        spark,
        "UPDATE t AS d SET v = 'hit' WHERE d.v = 'd. foo'",
        tables={"t": t},
    )
    st = _state(spark, t)
    assert (7, "hit", 7.0) in st  # literal compared verbatim

    # (3) MERGE DELETE condition: x exists on BOTH sides — ambiguous
    # unqualified reference must fail loudly (SQL MERGE would bind the
    # target; merge_into's delete_when sees the source)
    src = spark.createDataFrame([(3, "z", 0.5)], "k long, v string, x double")
    src.createOrReplaceTempView("adv_src")
    with pytest.raises(ValueError, match="not SOURCE columns"):
        versioned_sql(
            spark,
            """MERGE INTO t AS t USING adv_src AS s ON t.k = s.k
               WHEN MATCHED AND nosuchcol < 100 THEN DELETE""",
            tables={"t": t},
        )
    # source-alias-qualified and genuine source columns still work
    versioned_sql(
        spark,
        """MERGE INTO t AS t USING adv_src AS s ON t.k = s.k
           WHEN MATCHED AND s.x < 1.0 AND cast(x as int) = 0 THEN DELETE""",
        tables={"t": t},
    )
    assert 3 not in {k for (k, _, _) in _state(spark, t)}


def test_sql_create_schema_only(spark, tmp_path):
    """Schema-only CREATE TABLE (VERDICT r11 missing #2): empty v0
    carrying schema + CLUSTER BY + constraints + defaults + generated
    in ONE statement, typed-empty on every read surface, first append
    conforming."""
    from wrtd_etl_spark.sources.versioned import describe_table
    from wrtd_etl_spark.sources.versioned_table import (
        VersionedTableDataSource,
        register_versioned_view,
    )

    spark.dataSource.register(VersionedTableDataSource)

    t = str(tmp_path / "c")
    versioned_sql(
        spark,
        """CREATE TABLE c (
             k bigint NOT NULL,
             v string,
             price decimal(12,2),
             total double GENERATED ALWAYS AS (price * 2),
             flag boolean DEFAULT false,
             CONSTRAINT pos CHECK (k >= 0),
             CONSTRAINT uk UNIQUE (k)
           ) CLUSTER BY (k)""",
        tables={"c": t},
    )
    # typed-empty on the Python API, the DataSource, and a SQL view
    api = read_snapshot(spark, t)
    assert api.count() == 0
    assert [f.name for f in api.schema.fields] == [
        "k", "v", "price", "total", "flag",
    ]
    ds = spark.read.format("versioned_table").load(t)
    assert ds.schema == api.schema and ds.count() == 0
    register_versioned_view(spark, "c_view", t)
    assert spark.sql("SELECT * FROM c_view").count() == 0
    d = describe_table(t)
    assert d["layout"] == {"by": ["k"]}
    assert d["defaults"] == {"flag": False}
    assert d["generated"] == {"total": "price * 2"}
    assert set(d["constraints"]) == {"k_not_null", "pos"}
    assert d["unique"] == {"uk": ["k"]}

    # first append: generated computed, default filled, gates enforced
    versioned_sql(
        spark,
        "INSERT INTO c (k, v, price) VALUES (1, 'a', 10.00)",
        tables={"c": t},
    )
    row = read_snapshot(spark, t).head()
    assert (row.k, row.total, row.flag) == (1, 20.0, False)
    from wrtd_etl_spark.sources.versioned import QualityGateViolation

    with pytest.raises(QualityGateViolation):
        versioned_sql(
            spark,
            "INSERT INTO c (k, v, price) VALUES (-1, 'bad', 1.0)",
            tables={"c": t},
        )


def test_sql_create_schema_refusals(spark, tmp_path):
    t = str(tmp_path / "r")
    versioned_sql(spark, "CREATE TABLE r (k long)", tables={"r": t})
    with pytest.raises(ValueError, match="already exists"):
        versioned_sql(spark, "CREATE TABLE r (k long)", tables={"r": t})
    # OR REPLACE starts over with the new schema
    versioned_sql(
        spark,
        "CREATE OR REPLACE TABLE r (a int, b string)",
        tables={"r": t},
    )
    assert read_snapshot(spark, t).columns == ["a", "b"]
    with pytest.raises(ValueError, match="first declared column"):
        versioned_sql(
            spark,
            "CREATE TABLE r2 (a int DEFAULT 1, b int)",
            tables={"r2": str(tmp_path / "r2")},
        )
    with pytest.raises(ValueError, match="no columns"):
        versioned_sql(
            spark, "CREATE TABLE r3 ()", tables={"r3": str(tmp_path / "r3")}
        )
    with pytest.raises(
        ValueError, match="missing a type|cannot parse CREATE TABLE item"
    ):
        versioned_sql(
            spark, "CREATE TABLE r4 (k)", tables={"r4": str(tmp_path / "r4")}
        )


def test_sql_create_migration_script_e2e(spark, tmp_path):
    """IaC migration file: schema-only CREATE at the top, DML in the
    middle, SELECT check at the bottom — runs top-to-bottom."""
    from wrtd_etl_spark.sources.versioned_sql import versioned_sql_script

    t = str(tmp_path / "m")
    res = versioned_sql_script(
        spark,
        """CREATE TABLE m (k long, v string, score double DEFAULT 0.0);
           INSERT INTO m (k, v) VALUES (1, 'a'), (2, 'b');
           UPDATE m SET score = 9.5 WHERE k = 2;
           SELECT k, v, score FROM m;""",
        tables={"m": t},
    )
    assert {tuple(r) for r in res[-1].collect()} == {
        (1, "a", 0.0),
        (2, "b", 9.5),
    }


def test_sql_optimize_where_scopes_victims(spark, tmp_path):
    """OPTIMIZE ... WHERE (r12): only small files whose stats admit the
    predicate rewrite; the out-of-scope small-file tail keeps its
    inodes, and row content is maintenance-invisible."""
    import os

    from wrtd_etl_spark.sources.versioned import files_for_read

    t = str(tmp_path / "t")
    # 4 files, k-clustered: [0..249][250..499][500..749][750..999]
    write_snapshot(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(1000)], "k long, v string"
        ),
        t,
        layout_by=["k"],
        layout_files=4,
    )
    before = {
        f: os.stat(os.path.join(t, f)).st_ino for f in files_for_read(t)[0]
    }
    rows_before = {
        (r.k, r.v) for r in read_snapshot(spark, t).collect()
    }
    v = versioned_sql(
        spark, "OPTIMIZE t WHERE k BETWEEN 0 AND 499", tables={"t": t}
    )
    assert v is not None
    after = {
        f: os.stat(os.path.join(t, f)).st_ino for f in files_for_read(t)[0]
    }
    carried = {f for f in after if f in before and after[f] == before[f]}
    assert len(carried) == 2  # the two out-of-scope files, untouched
    assert {
        (r.k, r.v) for r in read_snapshot(spark, t).collect()
    } == rows_before
    # an underivable predicate refuses with guidance, rewrites nothing
    with pytest.raises(ValueError, match="no usable file bounds"):
        versioned_sql(
            spark, "OPTIMIZE t WHERE k < 10 OR v = 'x'", tables={"t": t}
        )
    with pytest.raises(ValueError, match="contradicts"):
        versioned_sql(spark, "OPTIMIZE t FULL WHERE k < 10", tables={"t": t})


def test_sql_vacuum_dry_run_and_shallow_clone(spark, tmp_path):
    """VACUUM ... DRY RUN returns the reclaim list without deleting;
    CREATE TABLE ... SHALLOW CLONE pins a version zero-copy and the
    clone evolves independently; DEEP CLONE refuses with the reason."""
    import os

    t = str(tmp_path / "t")
    c = str(tmp_path / "c")
    _seed(spark, t)  # v0: k 0..9
    versioned_sql(spark, "UPDATE t SET v = 'u' WHERE k < 3", tables={"t": t})

    # clone the PRE-update version; verify content + independence
    versioned_sql(
        spark,
        "CREATE TABLE c SHALLOW CLONE t VERSION AS OF 0",
        tables={"t": t, "c": c},
    )
    assert _state(spark, c) == {
        (i, f"v{i}", float(i)) for i in range(10)
    }
    versioned_sql(spark, "DELETE FROM c WHERE k >= 5", tables={"c": c})
    assert len(_state(spark, c)) == 5 and len(_state(spark, t)) == 10
    with pytest.raises(ValueError, match="already exists"):
        versioned_sql(
            spark,
            "CREATE TABLE c SHALLOW CLONE t",
            tables={"t": t, "c": c},
        )
    with pytest.raises(ValueError, match="SHALLOW CLONE is supported"):
        versioned_sql(
            spark,
            "CREATE TABLE c2 SHALLOW CLONE t",  # placeholder, replaced below
            tables={"t": t, "c2": str(tmp_path / "never")},
        ) if False else versioned_sql(
            spark,
            "CREATE TABLE c2 DEEP CLONE t",
            tables={"t": t, "c2": str(tmp_path / "never")},
        )

    # dry run on the source: the CoW update orphaned v0's rewritten
    # file below RETAIN 1 VERSIONS + 0 HOURS — report it, delete nothing
    dry = versioned_sql(
        spark,
        "VACUUM t RETAIN 1 VERSIONS RETAIN 0 HOURS DRY RUN",
        tables={"t": t},
    )
    paths = [r.path for r in dry.collect()]
    assert paths and all(os.path.exists(os.path.join(t, p)) for p in paths)
    # the real run reclaims exactly the reported set
    n = versioned_sql(
        spark,
        "VACUUM t RETAIN 1 VERSIONS RETAIN 0 HOURS",
        tables={"t": t},
    )
    assert n == len(paths)
    assert not any(os.path.exists(os.path.join(t, p)) for p in paths)
    # the clone's hardlinked bytes survived the source vacuum
    assert len(_state(spark, c)) == 5


def test_sql_tblproperties_policy(spark, tmp_path):
    """TBLPROPERTIES (r12): SET/UNSET via SQL, carried by every commit
    shape (append, overwrite, compact, clone; RESTORE keeps the CURRENT
    policy — config is not data), and `maintain.*` keys become
    maybe_compact's defaults so the table carries ONE maintenance
    policy for every maintainer."""
    from wrtd_etl_spark.sources.versioned import (
        clone_table,
        compact,
        latest_version,
        maybe_compact,
        rollback,
        table_properties,
    )

    t = str(tmp_path / "t")
    _seed(spark, t)
    versioned_sql(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES ("
        "'maintain.max_files' = '4', 'owner' = 'data-eng')",
        tables={"t": t},
    )
    assert table_properties(t) == {
        "maintain.max_files": "4",
        "owner": "data-eng",
    }
    # carried across append / overwrite / compact / clone
    write_snapshot(
        spark.createDataFrame([(100, "x", 0.0)], "k long, v string, x double"),
        t,
        mode="append",
    )
    compact(spark, t)
    write_snapshot(
        spark.createDataFrame([(0, "o", 0.0)], "k long, v string, x double"),
        t,
        mode="overwrite",
    )
    assert table_properties(t)["owner"] == "data-eng"
    c = str(tmp_path / "c")
    clone_table(t, c)
    assert table_properties(c)["owner"] == "data-eng"
    # RESTORE rewinds rows, not configuration: policy set AFTER the
    # target version survives the rollback
    versioned_sql(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES ('tier' = 'gold')",
        tables={"t": t},
    )
    rollback(t, 0)
    assert table_properties(t)["tier"] == "gold"
    assert len(_state(spark, t)) == 10  # rows rewound to v0

    # the policy drives maybe_compact with NO thresholds passed:
    # 6 single-row appends exceed maintain.max_files=4
    p = str(tmp_path / "p")
    _seed(spark, p)
    versioned_sql(
        spark,
        "ALTER TABLE p SET TBLPROPERTIES ('maintain.max_files' = '4')",
        tables={"p": p},
    )
    for i in range(6):
        write_snapshot(
            spark.createDataFrame(
                [(1000 + i, "a", 0.0)], "k long, v string, x double"
            ),
            p,
            mode="append",
        )
    before = latest_version(p)
    assert maybe_compact(spark, p) is not None  # fired off the property
    # an explicit argument still wins over the property
    assert maybe_compact(spark, p, max_files=10_000) is None
    assert latest_version(p) == before + 1

    # UNSET drops keys (missing keys ignored); bad policy values refuse
    versioned_sql(
        spark,
        "ALTER TABLE t UNSET TBLPROPERTIES ('owner', 'nope')",
        tables={"t": t},
    )
    assert "owner" not in table_properties(t)
    with pytest.raises(ValueError, match="positive integer"):
        versioned_sql(
            spark,
            "ALTER TABLE t SET TBLPROPERTIES ('maintain.max_files' = 'lots')",
            tables={"t": t},
        )
    # DESCRIBE DETAIL surfaces the map
    det = versioned_sql(spark, "DESCRIBE DETAIL t", tables={"t": t}).head()
    assert "tier" in det.props


def test_analyze_backfills_stats_and_blooms(spark, tmp_path):
    """collect_statistics / ANALYZE TABLE (r12): a table written with
    NO stats/blooms gains both metadata-only — files keep their inodes,
    pruning starts working, re-runs are no-ops, a renamed column
    backfills its old physical label, and the change feed sees an
    empty advance (no row changed)."""
    import os

    from wrtd_etl_spark.sources.versioned import (
        alter_rename_column,
        collect_statistics,
        files_for_read,
        latest_version,
        table_changes,
    )

    t = str(tmp_path / "t")
    # two stat-less single-file segments with disjoint k ranges
    for lo in (0, 1000):
        write_snapshot(
            spark.createDataFrame(
                [(lo + i, f"v{i}", float(i)) for i in range(100)],
                "k long, v string, x double",
            ).coalesce(1),
            t,
            mode="append" if lo else "overwrite",
        )
    # no stats: nothing prunes
    kept, total = files_for_read(t, skip_filter={"k": (0, 10)})
    assert total == 2 and len(kept) == 2
    inodes = {
        f: os.stat(os.path.join(t, f)).st_ino for f in files_for_read(t)[0]
    }
    v = versioned_sql(
        spark, "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS k, x",
        tables={"t": t},
    )
    assert v == latest_version(t)
    # pruning works now; data untouched
    kept, _ = files_for_read(t, skip_filter={"k": (0, 10)})
    assert len(kept) == 1
    assert {
        f: os.stat(os.path.join(t, f)).st_ino for f in files_for_read(t)[0]
    } == inodes
    # idempotent re-run: no commit
    assert collect_statistics(spark, t, stats_cols=["k", "x"]) is None
    # bloom backfill enables point pruning on the unclustered v column
    versioned_sql(
        spark, "ANALYZE TABLE t COMPUTE BLOOM FOR COLUMNS v",
        tables={"t": t},
    )
    kept, _ = files_for_read(t, point_filter={"v": ["nope"]})
    assert len(kept) == 0
    # the analyze commits are row-invisible to the change feed
    assert table_changes(spark, t, 1, latest_version(t)).count() == 0
    # a renamed column backfills the OLD segments' physical label
    alter_rename_column(t, "x", "score")
    write_snapshot(
        spark.createDataFrame(
            [(5000, "w", 9.0)], "k long, v string, score double"
        ),
        t,
        mode="append",
    )
    assert collect_statistics(spark, t, stats_cols=["score"]) is not None
    kept, total = files_for_read(t, skip_filter={"score": (500.0, None)})
    assert total == 3 and len(kept) == 0  # all files' score/x < 500
    # unknown columns contribute nothing (and alone, back off to no-op)
    assert collect_statistics(spark, t, stats_cols=["ghost"]) is None


def test_sql_show_tblproperties_and_tables(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t)
    versioned_sql(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES ('owner' = 'me', 'tier' = 'b')",
        tables={"t": t},
    )
    rows = versioned_sql(
        spark, "SHOW TBLPROPERTIES t", tables={"t": t}
    ).collect()
    assert [(r.key, r.value) for r in rows] == [
        ("owner", "me"),
        ("tier", "b"),
    ]
    names = versioned_sql(
        spark, "SHOW TABLES", tables={"t": t}
    ).collect()
    assert ("t", t) in {(r.name, r.path) for r in names}
    with pytest.raises(ValueError, match="SHOW TBLPROPERTIES"):
        versioned_sql(spark, "SHOW COLUMNS IN t", tables={"t": t})


def test_sql_merge_with_schema_evolution_and_zorder(spark, tmp_path):
    """r12: MERGE WITH SCHEMA EVOLUTION widens the table with
    source-only columns (plain MERGE still refuses them); OPTIMIZE
    ZORDER BY records the layout and re-clusters so range pruning
    works."""
    from wrtd_etl_spark.sources.versioned import (
        describe_table,
        files_for_read,
    )

    t = str(tmp_path / "t")
    _seed(spark, t)
    spark.createDataFrame(
        [(1, "one", 1.0, "extra")], "k long, v string, x double, note string"
    ).createOrReplaceTempView("ev_src")
    # plain MERGE projects to the target schema: no widening
    versioned_sql(
        spark,
        """MERGE INTO t USING ev_src s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        tables={"t": t},
    )
    assert "note" not in read_snapshot(spark, t).columns
    versioned_sql(
        spark,
        """MERGE WITH SCHEMA EVOLUTION INTO t USING ev_src s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        tables={"t": t},
    )
    df = read_snapshot(spark, t)
    assert "note" in df.columns
    got = {r.k: r.note for r in df.collect()}
    assert got[1] == "extra" and got[2] is None

    # ZORDER BY: layout recorded + one clustered rewrite -> pruning
    z = str(tmp_path / "z")
    write_snapshot(
        spark.createDataFrame(
            [((i * 37) % 1000, f"v{i}") for i in range(1000)],
            "k long, v string",
        ).repartition(4),  # scattered: no per-file k locality
        z,
        stats_cols=["k"],
    )
    kept0, total0 = files_for_read(z, skip_filter={"k": (0, 99)})
    assert total0 == 4 and len(kept0) == 4  # scattered: nothing prunes
    versioned_sql(spark, "OPTIMIZE z ZORDER BY (k)", tables={"z": z})
    assert describe_table(z)["layout"] == {"by": ["k"]}
    kept1, total1 = files_for_read(z, skip_filter={"k": (0, 99)})
    assert len(kept1) < total1  # clustered: the range prunes files
    assert read_snapshot(spark, z).count() == 1000
    with pytest.raises(ValueError, match="contradicts"):
        versioned_sql(
            spark, "OPTIMIZE z WHERE k < 10 ZORDER BY (k)", tables={"z": z}
        )


def test_sql_date_bound_hits_file_whose_min_equals_bound(spark, tmp_path):
    """ADVICE r12 (high): a DATE-typed prune bound from a SQL string
    literal must compare in the midnight-extended stat space that
    _stat_ext uses for date-typed segment stats — an unextended
    'YYYY-MM-DD' sorts BELOW the extended 'YYYY-MM-DDT00:00:00' min and
    falsely pruned the file whose min equals the bound, silently
    skipping rows the DML should modify."""
    t = str(tmp_path / "tbl")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k long, ds string, x double"
    ).selectExpr("k", "CAST(ds AS DATE) AS d", "x")
    # file 1: min d == the DML bound exactly
    write_snapshot(
        mk([(1, "2024-01-02", 1.0), (2, "2024-01-05", 2.0)]).coalesce(1),
        t,
        stats_cols=["d"],
    )
    # file 2: strictly later dates (prunable for real)
    write_snapshot(
        mk([(3, "2024-02-01", 3.0)]).coalesce(1), t, mode="append"
    )
    versioned_sql(
        spark, "UPDATE t SET x = -1 WHERE d = '2024-01-02'", tables={"t": t}
    )
    got = {r.k: r.x for r in read_snapshot(spark, t).collect()}
    assert got == {1: -1.0, 2: 2.0, 3: 3.0}
    versioned_sql(
        spark, "DELETE FROM t WHERE d <= '2024-01-05'", tables={"t": t}
    )
    assert {r.k for r in read_snapshot(spark, t).collect()} == {3}
