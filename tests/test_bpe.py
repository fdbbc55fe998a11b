"""Distributed BPE (functions/bpe.py) vs a pure-Python reference
implementation: the Spark trainer must reproduce it merge-for-merge, and
greedy application must reconstruct each word exactly."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wrtd_etl_spark.catalog import load_table
from wrtd_etl_spark.functions.bpe import END, apply_bpe, train_bpe


def _py_train(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    wf = Counter(
        w for t in texts if t for w in re.findall(r"[A-Za-z]+", t.lower())
    )
    table = {w: (list(w) + [END], c) for w, c in wf.items()}
    merges = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for syms, c in table.values():
            for p in zip(syms, syms[1:]):
                pc[p] += c
        if not pc:
            break
        (left, right), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((left, right))
        for w, (syms, c) in table.items():
            merged, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            table[w] = (merged, c)
    return merges


def test_train_bpe_matches_python_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    texts = [r.text for r in docs.select("text").collect()]
    expected = _py_train(texts, 25)
    got = train_bpe(docs, "text", 25)
    assert got == expected
    assert len(got) == 25  # corpus is rich enough that training didn't stall


def test_train_bpe_distributed_path_equals_driver_path(spark):
    """driver_vocab_limit=0 forces the distributed merge rounds; they
    must produce the same merges as the in-driver loop (same rule, same
    tie-break) on the same corpus."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    local = train_bpe(docs, "text", 12)
    dist = train_bpe(docs, "text", 12, driver_vocab_limit=0)
    assert dist == local and len(local) == 12


def test_apply_bpe_reconstructs_words_and_uses_merges(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    merges = train_bpe(docs, "text", 25)
    toked = apply_bpe(docs, "text", merges).select("text", "bpe_tokens")
    rows = toked.collect()
    merged_symbols = {l + r for l, r in merges}
    saw_multichar = False
    for r in rows:
        words = re.findall(r"[A-Za-z]+", (r.text or "").lower())
        # token stream reconstructs the word stream exactly
        joined = "".join(t for t in r.bpe_tokens).replace(END, "|")
        assert joined == "|".join(words) + ("|" if words else "")
        for t in r.bpe_tokens:
            base = t.removesuffix(END)
            if len(base) > 1:
                saw_multichar = True
                # every multi-char token is built from learned merges
                assert t in merged_symbols or any(
                    t.startswith(m) or t.endswith(m) for m in merged_symbols
                )
    assert saw_multichar, "no merge was ever applied — vacuous tokenization"
