"""Property-based tests (hypothesis) for the core operator algebra.

Each property drives a small number of randomized examples (Spark jobs
are ~1 s each, so max_examples stays low) against an independent
in-Python reference implementation — the failure class these catch is
exactly the round-2 ADVICE bug (distributed_cumsum silently wrong for
negative values because the only test used positive ones).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # CI determinism: same examples every run
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # bucket
            st.integers(-1000, 1000),  # value: signs MUST mix
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_distributed_cumsum_matches_naive_any_sign(spark, rows):
    from wrtd_etl_spark.operators.prefix_sum import distributed_cumsum

    df = spark.createDataFrame(
        [(i, b, v) for i, (b, v) in enumerate(rows)], "id long, b int, v long"
    )
    got = {
        r.id: r.cum
        for r in distributed_cumsum(
            df, "v", order_cols=["b", "id"], bucket_col="b", out_col="cum"
        ).collect()
    }
    # reference: plain running sum in (b, id) order
    acc, want = 0, {}
    for i, (b, v) in sorted(enumerate(rows), key=lambda t: (t[1][0], t[0])):
        acc += v
        want[i] = acc
    assert got == want


@given(
    arr=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=2), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_sorted_runs_equals_counter(spark, arr):
    from wrtd_etl_spark.functions.text import sorted_runs

    df = spark.createDataFrame([(arr,)], "a array<string>")
    out = (
        df.select(F.array_sort("a").alias("s"))
        .select(sorted_runs(F.col("s")).alias("r"))
        .collect()[0]["r"]
    )
    got = {t["term"]: t["cnt"] for t in out}
    assert got == dict(Counter(arr))


@given(
    vals=st.lists(
        st.integers(-50, 50), min_size=1, max_size=80
    ),
    p=st.sampled_from([0.0, 0.1, 0.5, 0.9, 0.99, 1.0]),
)
@settings(**_SETTINGS)
def test_exact_percentile_matches_builtin(spark, vals, p):
    from wrtd_etl_spark.operators.percentile import exact_percentile_disc

    df = spark.createDataFrame([(1, v) for v in vals], "g int, x int")
    got = exact_percentile_disc(df, "x", p, ["g"], bracket_limit=8).collect()
    want = df.groupBy("g").agg(
        F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY x)").alias("t")
    ).collect()
    assert got[0]["x"] == want[0]["t"]


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_connected_components_equals_union_find(spark, edges):
    from wrtd_etl_spark.dedup.clusters import connected_components

    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {
        r.node: r.cluster_id
        for r in connected_components(df, "id1", "id2", escalate_after=2).collect()
    }

    # reference: union-find with min-id labels
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@given(
    current=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), max_size=20),
    updates=st.lists(
        st.tuples(st.integers(0, 9), st.integers(100, 199)),
        max_size=10,
        unique_by=lambda t: t[0],
    ),
)
@settings(**_SETTINGS)
def test_upsert_by_key_updates_win(spark, current, updates):
    from wrtd_etl_spark.operators.upsert import upsert_by_key

    # keyed table: keep one row per key in current (last write wins there)
    cur = {k: v for k, v in current}
    cur_df = spark.createDataFrame(
        [(k, v) for k, v in cur.items()], "k int, v int"
    )
    upd_df = spark.createDataFrame(list(updates) or [], "k int, v int")
    got = {r.k: r.v for r in upsert_by_key(cur_df, upd_df, "k").collect()}
    want = dict(cur)
    want.update(dict(updates))
    assert got == want
