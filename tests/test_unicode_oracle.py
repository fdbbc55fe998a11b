"""Cross-engine text semantics on adversarial unicode.

The text operators promise oracle parity, and their regexes run on two
different engines (Java regex in Spark, RE2 in DuckDB). This fixture
feeds the worst inputs — emoji, CJK, RTL, combining marks, exotic
whitespace, zero-width characters, empty strings — through the full
oracle comparison, so any divergence in \\s/\\b/case-folding semantics
between engines fails loudly instead of surfacing at 100 TB.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wrtd_etl_spark.plans import REGISTRY
from wrtd_etl_spark.plans import pipeline_queries  # noqa: F401 (registers)

from .conftest import SF_SMOKE, TABLE_NAMES, compare_to_oracle

_TEXTS = [
    "plain ascii words here",
    "emoji 😀😀 and 🎉 party",
    "tabs\tand\nnewlines\r\nmixed",
    "  leading and trailing  ",
    "",
    "MiXeD CaSe WoRdS",
    "accents éàü öñ çß",
    "cyrillic привет мир",
    "cjk 你好世界 漢字",
    "rtl العربية עברית",
    "nbsp space en space ideographic　space",
    "zero​width joined",
    "combining é acute",
    "math 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 chars",
    "single",
    "a",
    "!!! ??? ... ;;; :::",
    "quotes 'single' \"double\" `back`",
    "repeat repeat repeat repeat repeat",
    "the of and in to is a the of and",
]

_TEXT_QUERIES = [
    "doc_token_stats",
    "doc_lang_id",
    "doc_quality",
    "doc_fingerprint",
    "dedup_exact_groups",
    "corpus_vocab",
    "pii_redaction",
    "doc_chunks",
    "per_source_cap",
    "dataset_split",
    "stratified_sample",
]


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_unicode")
    for t in TABLE_NAMES:
        if t != "documents":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", str(d / f"{t}.parquet"))
    n = len(_TEXTS)
    tb = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(_TEXTS),
            "lang": pa.array(["en"] * n),
            "source": pa.array([f"src{i % 3}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in _TEXTS], type=pa.int64()),
        }
    )
    pq.write_table(tb, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _TEXT_QUERIES)
def test_text_query_oracle_parity_on_adversarial_unicode(
    spark, unicode_sf_dir, name
):
    compare_to_oracle(spark, REGISTRY[name], unicode_sf_dir)
