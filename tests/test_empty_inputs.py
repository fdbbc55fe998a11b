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
    name, fn = name_fn
    rows = fn(spark, empty_sf_dir).collect()
    assert rows == [] or len(rows) >= 0
