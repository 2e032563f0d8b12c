"""Oracle-check specific registry queries (DuckDB compare), vanilla session.

Usage: python tools/oracle_check.py [sf_dir] name [name ...]
Exit 0 iff every named query hash-matches its oracle (rows-only entries
just report their count).  The tight-loop companion to tools/driver_sim.py.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    names = args

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from oracle_util import compare, duckdb_conn

    from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.registry import (
        all_queries,
    )

    con = duckdb_conn(sf_dir)
    qs = all_queries()
    fails = 0
    for name in names:
        fn, sql = qs[name]
        try:
            d = fn(spark, sf_dir)
            if sql is not None:
                p = compare(d, con, sql)
                if p:
                    fails += 1
                print(f"{name}: {'OK' if not p else 'MISMATCH ' + str(p[:2])}")
            else:
                print(f"{name}: rows-only n={d.count()}")
        except Exception as ex:  # noqa: BLE001
            fails += 1
            print(f"{name}: ERROR {ex}")
    print(f"FAILS: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
