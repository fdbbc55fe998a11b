"""Distributed byte-pair-encoding: train merges on Spark, tokenize with them.

The corpus-hygiene layer counts tokens with regex heuristics
(functions/text.py L10); a training pipeline eventually needs the real
thing — a learned subword vocabulary. Classic BPE (Sennrich et al. 2016,
arXiv:1508.07909) is inherently iterative, which is exactly where a
naive Spark port dies: N merge rounds × full-corpus scans.

The scale design keys on the standard trainer trick: BPE statistics are
a function of the WORD-FREQUENCY table, not the corpus. So:

1. ONE corpus-sized aggregation builds ``(word, count)`` — map-side
   combined, the only pass whose cost scales with the 100 TB input.
2. Every merge round then runs on the word table (vocab-sized, millions
   of rows at web scale — thousands here): explode adjacent symbol
   pairs weighted by count, aggregate, take the argmax to the driver
   (ONE (pair, count) row crosses per round), and rewrite the symbol
   arrays with an Arrow-batched pandas UDF. ``localCheckpoint`` per
   round truncates the iterative lineage (same pattern as
   dedup/clusters.py label propagation).
3. ``apply_bpe`` tokenizes any corpus with the trained ranks: merges
   broadcast once, greedy lowest-rank-first merging per word inside a
   pandas UDF — embarrassingly parallel, no shuffle at all.

Greedy application follows the reference BPE semantics: repeatedly merge
the pair with the LOWEST rank until no learned pair remains; ties in
training-time pair counts break lexicographically so training is
deterministic across partitionings (the count aggregation is integer,
hence order-independent). Truth-model pytest: the Spark trainer must
reproduce a pure-Python reference implementation merge-for-merge.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

WORD_PATTERN = r"[A-Za-z]+"
END = "</w>"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) — the one corpus-scaled pass. Lowercased a-z words
    (the Sennrich setup); everything downstream is vocab-sized."""
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0)
        ).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("count"))


def _initial_symbols(words: DataFrame) -> DataFrame:
    sym = F.concat(
        F.split(F.col("word"), "(?!$)"),  # chars
        F.array(F.lit(END)),
    )
    return words.select(sym.alias("syms"), "count")


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    driver_vocab_limit: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learned merge list (rank = position).

    Hybrid execution, cut over on VOCAB size (the only dimension that
    matters after the one corpus-scaled aggregation): up to
    ``driver_vocab_limit`` distinct words the frequency table is
    collected and the merge loop runs in-driver — a 1M-word vocab is
    ~50 MB and each round is a linear pass, versus ~0.6 s/round of
    fixed job+UDF overhead for a distributed micro-round (measured; 15
    rounds = 10 s on a 31-word toy vocab). Past the limit (web-scale
    corpora before normalization) the rounds run distributed: pair
    explode + integer agg, ONE (pair, count) argmax row to the driver
    per round. Both paths share the merge rule and tie-break, and are
    pinned equal in tests."""
    wf = word_frequencies(df, text_col).localCheckpoint(eager=False)
    n_words = wf.count()
    if n_words <= driver_vocab_limit:
        rows = wf.collect()
        return _train_local(
            {r["word"]: r["count"] for r in rows}, num_merges
        )
    parts = max(1, -(-n_words // 500_000))
    table = (
        _initial_symbols(wf).repartition(parts).localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = table.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            F.col("count"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("count").alias("n"))
            .orderBy(F.desc("n"), F.asc("p.l"), F.asc("p.r"))
            .first()
        )
        if best is None or best["n"] < 2:
            break  # nothing left worth merging
        left, right = best["p"]["l"], best["p"]["r"]
        merges.append((left, right))
        table = table.select(
            _merge_udf(left, right)(F.col("syms")).alias("syms"), "count"
        ).localCheckpoint(eager=False)
    return merges


def _merge_syms(syms: list[str], left: str, right: str) -> list[str]:
    merged, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            merged.append(left + right)
            i += 2
        else:
            merged.append(syms[i])
            i += 1
    return merged


def _train_local(
    word_counts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Driver-side merge loop — identical rule and tie-break (max count,
    then lexicographic pair) as the distributed rounds."""
    table = [(list(w) + [END], c) for w, c in word_counts.items()]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in table:
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        (left, right), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((left, right))
        table = [(_merge_syms(syms, left, right), c) for syms, c in table]
    return merges


def _merge_udf(left: str, right: str):
    """Factory so each round's UDF binds ITS pair (closure late-binding
    over the loop variable would corrupt recomputed partitions)."""

    @F.pandas_udf(ArrayType(StringType()))
    def merge_round(s: pd.Series) -> pd.Series:
        return pd.Series([_merge_syms(list(syms), left, right) for syms in s])

    return merge_round


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """``out_col: array<string>`` — greedy lowest-rank-first merging per
    word; merges broadcast via closure capture, zero shuffles."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [END]
        while len(syms) > 1:
            pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
            ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
            if not ranked:
                break
            _, at = min(ranked)
            syms[at : at + 2] = [syms[at] + syms[at + 1]]
        return syms

    import re

    word_re = re.compile(WORD_PATTERN)

    @F.pandas_udf(ArrayType(StringType()))
    def encode(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for text in s:
            toks: list[str] = []
            if text:
                for w in word_re.findall(text.lower()):
                    if w not in cache:
                        cache[w] = encode_word(w)
                    toks.extend(cache[w])
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))
