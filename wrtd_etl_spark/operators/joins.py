"""Join operators (SURVEY.md §2.4, J1-J6).

The reference's joins are all equi-joins against one small dimension
(`d_players`), including a role-playing double left join (killer + victim,
reference: docker/airflow/dags/tasks/queries.py:31-32) and an anti-join via
an uncorrelated ``NOT IN`` subquery (queries.py:59,72).

Scale notes: dimension sides are broadcast explicitly so fact-table joins
never shuffle the big side; the anti-join keeps NOT-EXISTS semantics via
``left_anti`` after documenting the NULL caveat (SQL NOT IN is null-aware —
callers that need literal NOT IN semantics must null-filter the key column
first, which :func:`null_safe_anti_join` does).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
) -> DataFrame:
    """Fact⋈dim equi-join with an explicit broadcast of the dimension (J1/J2).

    Reference: queries.py:13 (frags⋈d_players on killer),
    queries.py:57-58 (players⋈d_players).
    """
    return fact.join(F.broadcast(dim), fact[fact_key] == dim[dim_key], how)


def double_role_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    roles: Sequence[tuple[str, str, Sequence[tuple[str, str]]]],
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Join the same dimension under several roles (J3, role-playing dim).

    Reference: queries.py:31-32 — ``LEFT JOIN d_players dp ON f.killer = …
    LEFT JOIN d_players dp2 ON f.victim = …``. ``roles`` is a list of
    ``(alias, fact_key, [(dim_col, out_col), ...])``.

    Each role broadcasts the dimension, so N roles are N broadcast hash
    joins on the unshuffled fact — no sort-merge, no fact shuffle.
    """
    out = fact
    for alias, fact_key, picks in roles:
        d = dim.alias(alias)
        out = out.join(
            F.broadcast(d), out[fact_key] == F.col(f"{alias}.{dim_key}"), how
        )
        for dim_col, out_col in picks:
            out = out.withColumn(out_col, F.col(f"{alias}.{dim_col}"))
        # drop every dimension column of this role so the next role (same
        # dim, different alias) introduces no ambiguous names
        for c in dim.columns:
            out = out.drop(F.col(f"{alias}.{c}"))
    return out


def null_safe_anti_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Anti-join matching SQL ``NOT IN (subquery)`` semantics (J4).

    Reference: queries.py:59,72 — ``p.id_from_json NOT IN (SELECT victim
    FROM frags)``. SQL NOT IN is null-aware: one NULL in the subquery makes
    the result empty, and NULL left keys never qualify. We reproduce that
    explicitly so the DataFrame plan matches any SQL oracle:

    * if the right side can contain NULL keys, the caller's result must be
      empty — emulated by keeping left_anti but short-circuiting via an
      always-false condition joined against the null marker;
    * NULL left keys are dropped (NULL NOT IN (...) is never TRUE).

    Implemented without collect(): a 1-row aggregate of the right side's
    null count is cross-joined (broadcast, 1 row) as a guard column.
    """
    right_keys = right.select(F.col(right_key).alias("__k"))
    has_null = right_keys.agg(
        F.max(F.col("__k").isNull()).alias("__right_has_null")
    )
    guarded = left.filter(F.col(left_key).isNotNull()).crossJoin(
        F.broadcast(has_null)
    )
    anti = guarded.join(
        right_keys.filter(F.col("__k").isNotNull()),
        guarded[left_key] == F.col("__k"),
        "left_anti",
    )
    return anti.filter(~F.coalesce(F.col("__right_has_null"), F.lit(False))).drop(
        "__right_has_null"
    )


def lookup_map_join(
    df: DataFrame,
    key_col: str,
    mapping: dict[str, str],
    out_col: str,
) -> DataFrame:
    """Small-map lookup preserving unmatched keys (J6).

    Reference: functions.py:208-231 — vehicle ``type`` → display name via a
    Python dict, unmapped types pass through. A literal ``create_map`` keeps
    the lookup inside whole-stage codegen (no join, no shuffle, no UDF).
    """
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    m = F.create_map(*pairs)
    return df.withColumn(out_col, F.coalesce(m[F.col(key_col)], F.col(key_col)))
