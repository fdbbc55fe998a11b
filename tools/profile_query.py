"""cProfile one registry query (warm): where does driver-side wall go?

Usage: python tools/profile_query.py <query> [sortkey] [nrows]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wrtd_etl_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sort = sys.argv[2] if len(sys.argv) > 2 else "cumulative"
    nrows = int(sys.argv[3]) if len(sys.argv) > 3 else 45
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("wrtd-prof")

    from wrtd_etl_spark.plans import REGISTRY
    from wrtd_etl_spark.plans import testdata_queries  # noqa: F401

    try:
        from wrtd_etl_spark.plans import pipeline_queries  # noqa: F401
        from wrtd_etl_spark.plans import replay_queries  # noqa: F401
        from wrtd_etl_spark.plans import streaming_queries  # noqa: F401
    except ImportError:
        pass

    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    spec = REGISTRY[name]
    spec.fn(spark, sf_dir).collect()  # warm

    pr = cProfile.Profile()
    pr.enable()
    spec.fn(spark, sf_dir).collect()
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats(sort).print_stats(nrows)
    spark.stop()


if __name__ == "__main__":
    main()
