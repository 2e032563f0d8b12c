"""Drive the repo's real surface exactly as the round driver does:
a VANILLA SparkSession (none of our session.py configs), import
``__spark_entry__``, run ``entry()`` plus every ``queries()`` entry at the
given SF, and compare each against its ``oracle_sql()`` via DuckDB.

Usage: python tools/driver_sim.py [sf_dir] [--all]
(default /root/testdata/sf0.01; --all additionally runs the registry
entries excluded from the curated 50-entry driver surface)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    run_all = "--all" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_util import compare, duckdb_conn

    rows = e.entry(spark).collect()
    print(f"entry rows: {len(rows)}")

    con = duckdb_conn(sf_dir)
    qs, osql = e.queries(), e.oracle_sql()
    if run_all:
        from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.registry import (
            all_queries,
        )

        for name, (fn, sql) in all_queries().items():
            if name not in qs:
                qs[name] = fn
                if sql is not None:
                    osql[name] = sql
    fails = 0
    for name, fn in sorted(qs.items()):
        try:
            d = fn(spark, sf_dir)
            if name in osql:
                p = compare(d, con, osql[name])
                if p:
                    fails += 1
                print(f"{name}: {'OK' if not p else 'MISMATCH ' + str(p[:2])}")
            else:
                print(f"{name}: rows-only n={d.count()}")
        except Exception as ex:  # noqa: BLE001
            fails += 1
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:160]}")
    print(f"FAILS: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
