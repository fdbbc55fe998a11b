"""Weighted reservoir sampling per group — deterministic A-ES.

Efraimidis–Spirakis (A-ES, Inf. Proc. Letters 97(5), 2006): assign each
row the key ``u^(1/w)`` (``u`` uniform in (0,1), ``w`` its weight) and
keep the k largest keys per group — an exact weighted sample WITHOUT
replacement, computable with one pass and a top-k. We rank by the
monotone-equivalent ``ln(u)/w`` (descending) to stay in well-conditioned
double range.

Determinism + oracle parity: ``u`` is the same Knuth multiplicative-hash
uniform the mixture sampler uses (``(id*2654435761) mod 2^32``, +0.5 so
``ln`` never sees 0) — an integer recurrence DuckDB reproduces exactly —
and the key is rounded to 12 decimals before ranking so a last-ulp
``ln``/division difference between engines can never flip an ordering.
Ties (impossible after rounding except for equal hashes) break by id.

Scale shape (the reference-free part the built-ins don't give us): a
single window over a handful of huge groups would sort ~N/|groups| rows
per reducer. Instead stage 1 takes each PHYSICAL partition's local
top-k per group (window keyed by (group, spark_partition_id()) — the
exchange is hash(group, pid), so no reducer ever holds a whole group),
and stage 2 ranks the surviving ≤ #partitions×k rows per group. The
two-stage result equals the one-window result exactly: a group's global
top-k is contained in the union of its per-partition top-ks.

Capability parity: the reference's ORDER BY random() LIMIT n eval-set
draws (queries.py replay sampling); weighting is the training-mixture
generalization (quality-weighted corpus sampling, SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_MOD = 2**32
_HASH_MUL = 2654435761  # Knuth multiplicative hash


def hash32(id_col: Column) -> Column:
    """``(id * 2654435761) mod 2^32`` WITHOUT the 64-bit overflow the
    naive product hits: a full-range long id times the ~2^31.3 Knuth
    constant exceeds 2^63 and Spark 4's ANSI mode raises. Reduce the id
    mod 2^32 first (congruent result), then split it into 16-bit halves
    so every intermediate stays ≤ ~2^49:
    ``(hi·M mod 2^32)·2^16 + lo·M, all mod 2^32``."""
    h = F.pmod(id_col, F.lit(_HASH_MOD))
    hi, lo = h / F.lit(65536), F.pmod(h, F.lit(65536))
    hi = F.floor(hi).cast("long")
    return F.pmod(
        F.pmod(hi * F.lit(_HASH_MUL), F.lit(_HASH_MOD)) * F.lit(65536)
        + lo * F.lit(_HASH_MUL),
        F.lit(_HASH_MOD),
    )


def sample_key(id_col: Column, weight_col: Column) -> Column:
    """The A-ES ranking key ``round(ln(u)/w, 12)`` (higher = kept)."""
    u = (hash32(id_col).cast("double") + F.lit(0.5)) / F.lit(float(_HASH_MOD))
    return F.round(F.log(u) / weight_col, 12)


def weighted_sample_per_group(
    df: DataFrame,
    k: int,
    weight_col: Column,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``k`` rows per group (fewer if the group is smaller),
    drawn without replacement with probability proportional to
    ``weight_col``; adds ``rank`` (1..k, the A-ES order). Rows with
    NULL or non-positive weight are excluded (they have probability 0
    under A-ES; admitting them would make ``ln(u)/w`` undefined)."""
    keyed = df.filter(weight_col.isNotNull() & (weight_col > 0)).withColumn(
        "__skey", sample_key(F.col(id_col), weight_col)
    )
    order = [F.desc("__skey"), F.asc(id_col)]
    local = Window.partitionBy(group_col, "__pid").orderBy(*order)
    survivors = (
        keyed.withColumn("__pid", F.spark_partition_id())
        .withColumn("__rn", F.row_number().over(local))
        .filter(F.col("__rn") <= k)
        .drop("__pid", "__rn")
    )
    final = Window.partitionBy(group_col).orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(final).cast("long"))
        .filter(F.col("rank") <= k)
        .drop("__skey")
    )
