"""Drive the repo's real surface exactly as the round driver does:
a VANILLA SparkSession (none of our session.py configs), import
``__spark_entry__``, run ``entry()`` plus every ``queries()`` entry at the
given SF, and compare each against its ``oracle_sql()`` via DuckDB.

Usage: python tools/driver_sim.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_util import compare, duckdb_conn

    rows = e.entry(spark).collect()
    print(f"entry rows: {len(rows)}")

    con = duckdb_conn(sf_dir)
    qs, osql = e.queries(), e.oracle_sql()
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
