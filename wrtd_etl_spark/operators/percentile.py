"""Scale-safe EXACT percentile: distributed selection by iterative
bracket narrowing.

``percentile_disc`` is exact but its aggregate buffer holds every value
of the group (the shuffle audit showed ~5 MB of buffer for 600 k rows —
at 100 TB that buffer is the dataset and the executor OOMs). The usual
fix, approx_percentile, gives up exactness. This operator keeps
exactness with bounded memory at any scale — the classic distributed
selection recipe (sketch bracket + exact rank counts):

1. Per group, ``k = max(1, ceil(p*n))`` — percentile_disc(p) is the
   k-th smallest value (smallest v with cume_dist(v) >= p; the two are
   equivalent because #{x <= v} >= p*n ⇔ #{x <= v} >= ceil(p*n)).
2. Maintain a closed bracket [lo, hi] guaranteed to contain the k-th
   value (initially unbounded) plus ``k_rem``, its rank WITHIN the
   bracket. Each round runs two bracket-filtered scans:
   - pass A: one ``percentile_approx`` at a FIXED quantile grid (the
     percentage argument must be foldable, so per-group quantiles are
     impossible — the grid sidesteps that); the driver picks the two
     grid values whose quantiles straddle ``k_rem/n_bracket`` with a
     margin covering the sketch's rank-error guarantee;
   - pass B: EXACT ``count(x < lo')`` / ``count(x <= hi')`` /
     ``count(lo' <= x <= hi')`` against those candidates. The bracket
     only tightens when the exact counts prove ``lt < k_rem <= le`` —
     correctness never depends on the sketch.
   A group whose candidate bracket collapses to a single value is done:
   the k_rem-th of identical values IS that value (this is what makes
   duplicate-heavy groups converge).
3. Each verified round shrinks the bracket to ~(2/grid + sketch error)
   of its size: 6e11 rows → ~6e9 → ~6e7 → ~6e5 → limit within four
   rounds — O(log n) scans total.
4. When every bracket fits ``bracket_limit``, a window row_number
   partitioned by group over ONLY the bracket rows picks the k_rem-th —
   a bounded exchange, never the full column. The default limit (1M
   rows/group) is what a sort-based window handles with spill headroom;
   groups already under it skip narrowing entirely, so the common case
   costs one column-pruned count scan + the bounded window.

Driver state is one row per group per round (bounds + ranks) — the same
bounded-driver-roundtrip contract as kmeans' K×dim centroids. Group
cardinality must be driver-bounded, the standard regime for percentile
thresholds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_GRID = 200  # quantile grid resolution (shrink ≈ 2/_GRID per round)
_ACCURACY = 10_000  # percentile_approx rank error ≤ n/accuracy


def exact_percentile_disc(
    df: DataFrame,
    value_col: str,
    p: float,
    group_cols: list[str],
    bracket_limit: int = 1_000_000,
    max_iter: int = 8,
) -> DataFrame:
    """(group_cols..., <value_col>): exact percentile_disc(p) per group,
    computed with bounded memory (see module doc)."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0,1], got {p}")
    v = F.col(value_col)
    vtype = dict(df.dtypes)[value_col]
    work = df.select(*group_cols, value_col).filter(v.isNotNull())

    # one state row per group: bracket bounds, rank within bracket, size.
    # Plain count first (column-pruned, far cheaper than a sketch): in
    # the common case every group fits bracket_limit and the sketch
    # machinery never runs at all.
    state = {
        tuple(r[c] for c in group_cols): {
            "lo": None,  # None = unbounded side
            "hi": None,
            "k_rem": max(1, r["__k"]),
            "n_br": r["__n"],
            "done": False,
        }
        for r in work.groupBy(*group_cols)
        .agg(
            F.count(value_col).alias("__n"),
            F.ceil(F.lit(p) * F.count(value_col)).cast("long").alias("__k"),
        )
        .collect()
    }
    if not state:
        # empty input: empty result with the right schema
        return work.groupBy(*group_cols).agg(F.max(v).alias(value_col))

    group_schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.select(*group_cols).dtypes]
        + [f"__lo {vtype}", f"__hi {vtype}", "__krem long"]
    )

    def bounds_df(groups):
        rows = [(*g, state[g]["lo"], state[g]["hi"], state[g]["k_rem"]) for g in groups]
        return df.sparkSession.createDataFrame(rows, group_schema)

    in_bracket = (F.col("__lo").isNull() | (v >= F.col("__lo"))) & (
        F.col("__hi").isNull() | (v <= F.col("__hi"))
    )
    grid = [i / _GRID for i in range(_GRID + 1)]
    grid_sql = "array(" + ", ".join(repr(q) for q in grid) + ")"

    for _ in range(max_iter):
        open_groups = [
            g for g, s in state.items() if not s["done"] and s["n_br"] > bracket_limit
        ]
        if not open_groups:
            break
        br = work.join(F.broadcast(bounds_df(open_groups)), group_cols).filter(
            in_bracket
        )
        # pass A: fixed-grid sketch of the bracket values
        sketched = (
            br.groupBy(*group_cols)
            .agg(
                F.count(value_col).alias("__n2"),
                F.expr(
                    f"percentile_approx({value_col}, {grid_sql}, {_ACCURACY})"
                ).alias("__cand"),
            )
            .collect()
        )
        # driver: straddle k_rem/n2 with margin = sketch rank error + one
        # grid cell on each side
        cands = {}
        for r in sketched:
            g = tuple(r[c] for c in group_cols)
            q = state[g]["k_rem"] / r["__n2"]
            margin = 1.0 / _ACCURACY
            lo_i = max(0, math.floor((q - margin) * _GRID) - 1)
            hi_i = min(_GRID, math.ceil((q + margin) * _GRID) + 1)
            cands[g] = (r["__cand"][lo_i], r["__cand"][hi_i])
        cand_rows = [(*g, c[0], c[1], state[g]["k_rem"]) for g, c in cands.items()]
        cand_df = df.sparkSession.createDataFrame(cand_rows, group_schema)
        # pass B: exact rank counts against the candidate bounds
        checked = (
            br.drop("__lo", "__hi", "__krem")
            .join(
                F.broadcast(
                    cand_df.withColumnRenamed("__lo", "__lo2").withColumnRenamed(
                        "__hi", "__hi2"
                    )
                ),
                group_cols,
            )
            .groupBy(*group_cols)
            .agg(
                F.sum((v < F.col("__lo2")).cast("long")).alias("__lt"),
                F.sum((v <= F.col("__hi2")).cast("long")).alias("__le"),
                F.sum(
                    ((v >= F.col("__lo2")) & (v <= F.col("__hi2"))).cast("long")
                ).alias("__nb"),
            )
            .collect()
        )
        progressed = False
        for r in checked:
            g = tuple(r[c] for c in group_cols)
            s = state[g]
            lo2, hi2 = cands[g]
            if not (r["__lt"] < s["k_rem"] <= r["__le"]):
                continue  # sketch missed its guarantee: keep old bracket
            if lo2 == hi2:
                # single-value bracket: the k_rem-th of identical values
                # is that value — exact answer, group done
                s["lo"] = s["hi"] = lo2
                s["k_rem"], s["n_br"], s["done"] = 1, 1, True
                progressed = True
            elif r["__nb"] < s["n_br"]:
                s["lo"], s["hi"] = lo2, hi2
                s["k_rem"] -= r["__lt"]
                s["n_br"] = r["__nb"]
                progressed = True
        if not progressed:
            break  # can't narrow further; final window handles the rest

    # final: k_rem-th smallest inside each (now small) bracket — a
    # bounded per-group window over bracket rows, NOT the full column
    w = Window.partitionBy(*group_cols).orderBy(v)
    return (
        work.join(F.broadcast(bounds_df(list(state))), group_cols)
        .filter(in_bracket)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == F.col("__krem"))
        .select(*group_cols, value_col)
    )
