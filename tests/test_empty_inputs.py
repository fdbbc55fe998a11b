"""Every registry query must survive EMPTY input tables.

At 100 TB, empty partitions, empty days, and empty filter results are
routine — an operator that crashes on zero rows (driver-side collect of
nothing, np.stack of an empty batch, argmax over an empty centroid set)
takes the whole job down. Zero rows out is fine; an exception is a bug.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from .conftest import SF_SMOKE, TABLE_NAMES


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLE_NAMES:
        tb = pq.read_table(f"{SF_SMOKE}/{t}.parquet").slice(0, 0)
        pq.write_table(tb, str(d / f"{t}.parquet"))
    return str(d)


def _all_specs():
    import __spark_entry__ as e

    return list(e.queries().items())


@pytest.mark.parametrize("name_fn", _all_specs(), ids=lambda nf: nf[0])
def test_query_survives_empty_tables(spark, empty_sf_dir, name_fn):
    """The contract under test is crash-freedom: zero-row input must
    produce a well-formed result, not an exception. Row COUNT is
    deliberately unconstrained — global aggregates legitimately emit one
    row on empty input (COUNT(*) = 0), grouped ones emit none."""
    name, fn = name_fn
    rows = fn(spark, empty_sf_dir).collect()
    assert isinstance(rows, list)
    # every output row must carry the full declared schema (no partial
    # rows out of empty-input edge paths)
    for r in rows:
        assert len(r) == len(fn(spark, empty_sf_dir).columns)


@pytest.fixture(scope="module")
def nulled_sf_dir(tmp_path_factory):
    """20 rows per table with every non-key column NULL."""
    import pyarrow as pa

    keys = {
        "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey",
        "s_suppkey", "p_partkey", "o_orderkey", "o_custkey", "l_orderkey",
        "l_linenumber", "event_id", "user_id", "doc_id", "vec_id",
    }
    d = tmp_path_factory.mktemp("sf_nulls")
    for t in TABLE_NAMES:
        tb = pq.read_table(f"{SF_SMOKE}/{t}.parquet").slice(0, 20)
        cols = {
            f.name: tb.column(f.name)
            if f.name in keys
            else pa.nulls(len(tb), type=f.type)
            for f in tb.schema
        }
        pq.write_table(pa.table(cols), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name_fn", _all_specs(), ids=lambda nf: nf[0])
def test_query_survives_all_null_columns(spark, nulled_sf_dir, name_fn):
    """NULL text/embeddings/timestamps are routine in crawl data — every
    operator must treat them as 'cannot match / cannot score', never crash
    (NULL-vector rows are filtered at the scan; NULL group keys follow SQL
    grouping semantics)."""
    name, fn = name_fn
    fn(spark, nulled_sf_dir).collect()
